package graft.queries

import graft.QueryDef

/** Scale-extension operators (dedup / similarity search / text analysis /
  * multimodal) over `documents` and `embeddings` — filled in build step 8
  * (SURVEY.md §7.2). */
object DataxQueries {
  val defs: Seq[QueryDef] = Seq()
}
