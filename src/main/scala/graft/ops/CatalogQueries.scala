package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The catalog read path (SURVEY.md §2.2, §2.3, §2.7): conjunctive filters
  * -> single-key sort -> skip/limit -> keep-set projection, exactly the
  * shape of the reference's `/movies/search` (reference:
  * app/endpoints/movies.py:21-67) and `/catalog/search` (reference:
  * app/endpoints/catalog.py:31-76).
  *
  * Everything is declarative `Column` predicates, so Catalyst pushes the
  * filters and the projection into the parquet scan and plans the
  * sort+limit as TakeOrderedAndProject — no full sort at 100 TB.
  */
object CatalogQueries {

  /** Search parameters mirroring the reference's query params. */
  final case class SearchParams(
      genre: Option[Int] = None,           // P2
      country: Option[String] = None,      // P3
      isAnimated: Option[Boolean] = None,  // P4
      contentType: Option[String] = None,  // P4
      // P5: INDEPENDENT open-ended string-date bounds — the reference
      // accepts year_from and/or year_to (app/endpoints/movies.py:23-24,
      // 47-52); limit/sort-key validation (le=200, key whitelist) is the
      // HTTP layer's 422, not query semantics
      yearFrom: Option[Int] = None,
      yearTo: Option[Int] = None,
      requireFrames: Boolean = true,       // P1
      sortBy: String = "popularity",       // R1
      descending: Boolean = true,
      skip: Int = 0,                       // R2
      limit: Int = 50)

  /** J1 — the reference's keep-set projection
    * (reference: app/endpoints/movies.py:9-17). */
  val movieProjection: Seq[String] = Seq(
    "id", "title", "title_ru", "name", "_type", "genre_ids", "release_date",
    "popularity", "vote_average", "country_codes", "is_animated", "frames")

  /** P1 — non-empty `frames` array exists
    * (reference: app/endpoints/movies.py:37). */
  def hasFrames(frames: Column): Column =
    frames.isNotNull && size(frames) > 0

  /** The full search pipeline over a movies-shaped DataFrame.
    *
    * P5: release_date is a STRING; the reference range-filters it
    * lexicographically with `"{year}-01-01"`.. bounds, which on ISO
    * dates is identical to date comparison (reference:
    * app/endpoints/movies.py:46-51). We keep StringType + string
    * bounds. */
  def search(movies: DataFrame, p: SearchParams): DataFrame = {
    var pred: Column = lit(true)
    if (p.requireFrames) pred = pred && hasFrames(col("frames"))
    p.genre.foreach(g => pred = pred && array_contains(col("genre_ids"), g))
    p.country.foreach(c => pred = pred && array_contains(col("country_codes"), c))
    p.isAnimated.foreach(a => pred = pred && col("is_animated") === a)
    p.contentType.foreach(t => pred = pred && col("_type") === t)
    // Python truthiness fidelity: `if year_from:` (movies.py:47-52)
    // ignores 0, so year 0 must NOT apply a bound (negative years would —
    // they're truthy — hence != 0, not > 0)
    p.yearFrom.filter(_ != 0).foreach(y => pred = pred && col("release_date") >= s"$y-01-01")
    p.yearTo.filter(_ != 0).foreach(y => pred = pred && col("release_date") <= s"$y-12-31")
    val sort = if (p.descending) col(p.sortBy).desc else col(p.sortBy).asc
    movies.filter(pred)
      // id tiebreak for a deterministic page (Mongo's order is unspecified
      // on ties; determinism is required by the oracle harness)
      .orderBy(sort, col("id").asc)
      .offset(p.skip).limit(p.limit)
      .select(movieProjection.map(col): _*)
  }

  /** P6 — by-ids IN-list lookup (reference: app/endpoints/movies.py:74). */
  def byIds(movies: DataFrame, ids: Seq[Long]): DataFrame =
    movies.filter(col("id").isin(ids: _*))

  /** P7 — point lookup on the compound key
    * (reference: app/endpoints/movies.py:84-87). */
  def byId(movies: DataFrame, id: Long, contentType: String): DataFrame =
    movies.filter(col("id") === id && col("_type") === contentType).limit(1)

  /** P8 — Mongo `$regex ... $options i` is an UNANCHORED, case-insensitive
    * match across title/title_ru, and the user string IS a regex pattern
    * (reference: app/endpoints/catalog.py:49-53 passes it through raw).
    * `rlike` has the same unanchored semantics; `(?i)` carries the
    * option. `literal=true` opts into substring-escaping for callers
    * that don't want pattern metacharacters interpreted (PCRE-vs-Java
    * regex differences are out of the reference's observable surface for
    * the common cases). */
  def titleRegexSearch(movies: DataFrame, q: String,
                       literal: Boolean = false): DataFrame = {
    val pattern = if (literal) java.util.regex.Pattern.quote(q) else q
    movies.filter(
      col("title").rlike(s"(?i)$pattern") || col("title_ru").rlike(s"(?i)$pattern"))
  }
}
