package graft.datax

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * `Column` expressions (codegen'd, no UDFs) so they run scan-side at
  * 100 TB — no shuffle, no driver involvement.
  */
object TextStats {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), " ")

  /** [[tokens]], with NULL text yielding a one-element `[null]` array —
    * the null-carrier idiom behind the every-doc-has-a-row contract of
    * the per-doc aggregate operators (repetition, qualityFilter,
    * unigramLm, importanceWeights): the carrier row keeps a NULL-text
    * doc flowing through the existing id-keyed explode/window/groupBy
    * shuffle, so no `docs ⋈ agg` join-back restore is needed (that join
    * is same-cardinality on both sides — a REAL extra shuffle at corpus
    * scale — and measured +21%/+47% on d32/d34 even locally). NOT
    * explode_outer, which drops the generate out of whole-stage codegen
    * (~20% on d32). Downstream counts skip the null token for free. */
  def tokensOrNullRow(text: Column): Column =
    coalesce(tokens(text), array(lit(null).cast("string")))

  // stopword markers per language (tiny, deliberately: this is the n-gram
  // heuristic family of language ID, not a model)
  val EnMarkers = Array("the", "a", "of", "and", "to", "in", "is", "it")
  val DeMarkers = Array("der", "die", "das", "und", "ist", "nicht", "ein")
  val FrMarkers = Array("le", "la", "les", "et", "est", "une", "dans")
  val EsMarkers = Array("el", "los", "las", "y", "es", "una", "en")

  private def markerHits(toks: Column, markers: Array[String]): Column =
    size(filter(toks, t => array_contains(lit(markers), t)))

  /** Language-ID heuristic: CJK codepoints -> zh; otherwise the language
    * with the most stopword-marker occurrences (priority en,de,fr,es on
    * ties); 'und' (undetermined) when nothing scores. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = markerHits(toks, EnMarkers)
    val de = markerHits(toks, DeMarkers)
    val fr = markerHits(toks, FrMarkers)
    val es = markerHits(toks, EsMarkers)
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Quality score in [0,1]: blend of alpha ratio, stopword ratio, and a
    * word-length band — the length/punct/stopword family of heuristic
    * quality filters. Single fixed expression tree (deterministic across
    * engines). */
  def qualityScore(text: Column): Column = {
    val lower_ = lower(text)
    val nChars = length(text).cast("double")
    val alphaRatio = length(regexp_replace(lower_, "[^a-z]", "")).cast("double") / nChars
    val toks = tokens(text)
    val nToks = size(toks).cast("double")
    val stopRatio = markerHits(toks, EnMarkers).cast("double") / nToks
    val avgWordLen = (nChars - (nToks - lit(1.0))) / nToks
    val wordLenBand = when(avgWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    when(nChars === 0, 0.0).otherwise(
      alphaRatio * 0.5 + least(stopRatio * lit(5.0), lit(1.0)) * 0.2 + wordLenBand * 0.3)
  }

  /** Whitespace token count; NULL for NULL text (size() alone would
    * return the non-ANSI -1 sentinel, which silently DECREMENTS any
    * downstream sum — null-augmented oracle replay finding). */
  def tokenCountWs(text: Column): Column =
    when(text.isNotNull, size(regexp_extract_all(text, lit("\\S+"), lit(0))))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumerics each count as one token; NULL for NULL text
    * (same -1-sentinel guard as [[tokenCountWs]]). */
  def tokenCountBpe(text: Column): Column =
    when(text.isNotNull,
      size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the canonical exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** The text-side entry contract (round 15) — the exact twin of
    * [[Similarity.validEmbeddings]], so both modalities dead-letter
    * alike (the reference's ST3 posture, `app/tmdb_client.py:76-85`):
    * a NULL or whitespace-only document is a DATA error the dedup
    * family otherwise handles SILENTLY (null-safe fingerprints group
    * them, sub-k docs are invisible to MinHash — nothing ever reports
    * them; [[Dedup.dedupIncrement]]'s scaladoc points here). Policies:
    *
    *  - `"fail"` (default): first malformed row raises at execution
    *    time, grafted as a FILTER condition so ColumnPruning cannot
    *    delete it (the validEmbeddings prune-path lesson). Zero extra
    *    jobs.
    *  - `"drop"`: silent filter — only for callers whose downstream
    *    contract applies the identical filter.
    *  - `"dropWarn"`: filter + one column-pruned count, dropped total
    *    to stderr when nonzero.
    *  - `"quarantine"`: malformed rows append to `quarantineDir` as
    *    parquet with a `malformed_reason` column (`null_text` /
    *    `empty_text`), then the clean rows flow on. EAGER, like the
    *    vector twin: the dead-letter write runs AT CALL TIME with
    *    mode("append") — calling twice appends twice, and the input
    *    is read once for the write and once for the main path (make
    *    the source deterministic, or dedup the quarantine output by
    *    id downstream — or use [[validDocumentsSplit]], the lazy
    *    face that leaves the write to the caller's sink).
    */
  def validDocuments(docs: org.apache.spark.sql.DataFrame, textCol: String,
                     onMalformed: String = "fail",
                     quarantineDir: Option[String] = None): org.apache.spark.sql.DataFrame = {
    // the malformedness RULE lives once, in the split face — the eager
    // modes are sinks over it (the validEmbeddings structure)
    val (clean, quarantine) = validDocumentsSplit(docs, textCol)
    onMalformed match {
      case "fail" =>
        val bad = badDocument(textCol)
        docs.filter(
          when(bad, raise_error(concat(
            lit(s"[graft-textstats] malformed document in `$textCol`: got "),
            when(col(textCol).isNull, lit("NULL text"))
              .otherwise(lit("whitespace-only text")),
            lit(". Clean the corpus, or pass onMalformed=\"drop\" / " +
              "\"dropWarn\" / \"quarantine\" to filter such rows.")))
            .cast("boolean"))
            .otherwise(lit(true)))
      case "drop" => clean
      case "dropWarn" =>
        val dropped = quarantine.count()
        if (dropped > 0) System.err.println(
          s"[graft-textstats] validDocuments($textCol): dropped $dropped " +
            "malformed row(s) (null or whitespace-only).")
        clean
      case "quarantine" =>
        val dir = quarantineDir.getOrElse(throw new IllegalArgumentException(
          """onMalformed="quarantine" requires quarantineDir=Some(path)"""))
        quarantine.write.mode("append").parquet(dir)
        clean
      case other => throw new IllegalArgumentException(
        s"""onMalformed="$other": expected "fail", "drop", "dropWarn", or "quarantine"""")
    }
  }

  /** The shared malformed-document predicate — ONE definition for the
    * split and eager faces. `\s+`-based, not trim(): Spark's trim
    * strips only ASCII spaces, so a tab-only document would silently
    * pass a trim-based emptiness test. */
  private def badDocument(textCol: String): org.apache.spark.sql.Column =
    col(textCol).isNull || regexp_replace(col(textCol), "\\s+", "") === ""

  /** The LAZY dead-letter face of [[validDocuments]] — the text twin of
    * [[Similarity.validEmbeddingsSplit]]: (clean, quarantine) as two
    * pure frames (quarantine carries `malformed_reason`), no side
    * effect at call time; the caller owns the dead-letter write and its
    * idempotence. Both frames share the input scan — persist upstream
    * if the source is non-deterministic. */
  def validDocumentsSplit(docs: org.apache.spark.sql.DataFrame,
                          textCol: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val bad = badDocument(textCol)
    (docs.filter(!bad),
      docs.filter(bad).withColumn("malformed_reason",
        when(col(textCol).isNull, lit("null_text"))
          .otherwise(lit("empty_text"))))
  }

  // ------------------------------------------------------------------
  // Document-level quality filters (the Gopher/MassiveText family):
  // these two are DataFrame ops — repetition needs a per-doc aggregate.
  // ------------------------------------------------------------------

  /** Per-document duplicate n-gram fraction — the classic intra-doc
    * repetition signal (boilerplate, keyword stuffing, template spam):
    * 1 - distinct/total over the doc's token n-grams; 0 for docs shorter
    * than n tokens. Built as posexplode + window lead + one groupBy
    * (codegen throughout, one shuffle on id; HOF lambdas would
    * interpret the per-gram work). Sub-n-token and NULL-text docs reach
    * the aggregate as null-gram carrier rows (the d45 rule) — every
    * input doc gets a row with NO docs ⋈ agg join-back shuffle. */
  def repetition(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
      posexplode(tokensOrNullRow(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy("id").orderBy("pos")
    val leads = (1 until n).map(j => lead(col("t"), j).over(w))
    // a doc's trailing n-1 token rows have no full gram (lead = null)
    // and ride as null-gram carriers the counts skip
    val grams = toks.select(col("id"),
      when((if (n > 1) leads.last else col("t")).isNotNull,
        concat_ws(" ", col("t") +: leads: _*)).as("g"))
    val agg = grams.groupBy("id").agg(
      count(col("g")).as("n_ngrams"), countDistinct(col("g")).as("n_distinct"))
    agg.select(col("id").as(idCol), col("n_ngrams"), col("n_distinct"),
      when(col("n_ngrams") === 0, 0.0)
        .otherwise((col("n_ngrams") - col("n_distinct")) / col("n_ngrams"))
        .as("dup_fraction"))
  }

  /** Composed keep/drop document filter with REASONS — the auditable
    * form every production corpus filter needs (a bare boolean can't
    * answer "why did we lose 4% of the crawl"). Rules, in fixed order:
    * too_short / too_long (whitespace tokens), low_alpha (alpha ratio),
    * high_repetition (duplicate n-gram fraction), pii_heavy
    * (emails+phones).  `keep` = no rule fired.
    *
    * ONE text scan: the scalar metrics are computed alongside the
    * token posexplode and carried through the gram aggregate (three
    * numbers per token row — far cheaper than the second full text
    * scan a `docs ⋈ repetition(docs)` join would pay; Spark does not
    * dedupe repeated scans of a subtree). Every NON-NULL-text doc has
    * at least one token row (`split` never yields an empty array), and
    * a NULL-text doc keeps ONE (token = null) row via posexplode_OUTER,
    * so the groupBy covers every input doc — such a doc fails with
    * `keep=false, reasons='null_text'` (a carried is-null flag; the
    * outer explode costs nothing over a join-back restore, which
    * measured +21% on d32) and never passes vacuously. */
  def qualityFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    minTokens: Int = 5, maxTokens: Int = 5000,
                    minAlpha: Double = 0.5, maxDupFraction: Double = 0.3,
                    maxPii: Int = 5, n: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    val alpha = when(length(t) === 0, 0.0)
      .otherwise(length(regexp_replace(lower(t), "[^a-z]", "")).cast("double")
        / length(t).cast("double"))
    val pii = piiCounts(t)
    // TWO selects, deliberately: scalars in their own projection BELOW
    // the generator. A single select with posexplode plans the scalar
    // Project ABOVE the Generate — every regex then runs per TOKEN row
    // instead of per doc (measured 12x on d32).
    val scalars = docs.select(col(idCol).as("id"), t.as("_text"),
      t.isNull.as("_isnull"),
      tokenCountWs(t).as("_ws"), alpha.as("_alpha"),
      (pii.getField("n_emails") + pii.getField("n_phones")).as("_pii"))
    val base = scalars.select(col("id"), col("_isnull"),
      col("_ws"), col("_alpha"), col("_pii"),
      posexplode(tokensOrNullRow(col("_text"))).as(Seq("pos", "tk")))
    val w = Window.partitionBy("id").orderBy("pos")
    val leads = (1 until n).map(j => lead(col("tk"), j).over(w))
    val gram = when((if (n > 1) leads.last else col("tk")).isNotNull,
      concat_ws(" ", col("tk") +: leads: _*))
    val agg = base.select(col("id"), col("_isnull"),
        col("_ws"), col("_alpha"), col("_pii"), gram.as("_g"))
      .groupBy("id")
      .agg(first(col("_isnull")).as("_isnull"),
        first(col("_ws")).as("_ws"), first(col("_alpha")).as("_alpha"),
        first(col("_pii")).as("_pii"),
        count(col("_g")).as("_n"), countDistinct(col("_g")).as("_d"))
    val dup = when(col("_n") === 0, 0.0)
      .otherwise((col("_n") - col("_d")) / col("_n"))
    // a null-text doc FAILS explicitly (its scalar metrics are all
    // null, so the rule whens would otherwise fire nothing and the doc
    // would pass vacuously clean)
    val reasons = when(col("_isnull"), "null_text").otherwise(concat_ws(",",
      when(col("_ws") < minTokens, "too_short"),
      when(col("_ws") > maxTokens, "too_long"),
      when(col("_alpha") < minAlpha, "low_alpha"),
      when(dup > maxDupFraction, "high_repetition"),
      when(col("_pii") > maxPii, "pii_heavy")))
    agg.select(col("id").as(idCol), (reasons === "").as("keep"),
      reasons.as("reasons"))
  }

  // ------------------------------------------------------------------
  // Deterministic corpus splitting
  // ------------------------------------------------------------------

  /** Hash split bucket in [0, 100): integer value of the first FOUR md5
    * hex chars of the key (16 bits), mod 100. HASH-based, never `rand()`
    * — the assignment must be stable across runs, executors, and cluster
    * sizes, or every re-run reshuffles train/test and leaks. 16 bits,
    * not 8: 256 mod 100 would make buckets 0-55 1.5x as likely (an
    * ~84/8/8 split masquerading as 80/10/10); 65536 mod 100 skews by
    * <0.2%. */
  def splitBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % 100

  /** Named train/valid/test assignment from [[splitBucket]]. */
  def splitName(key: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    val b = splitBucket(key)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  // ------------------------------------------------------------------
  // PII scanning / redaction (regexes deliberately simple and portable:
  // Java regex on the Spark side, RE2 in the DuckDB oracle — no
  // backreferences, no lookaround)
  // ------------------------------------------------------------------

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** Per-document PII pattern counts. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_emails"),
    regexp_count(text, lit(UrlRe)).as("n_urls"),
    regexp_count(text, lit(PhoneRe)).as("n_phones"))

  /** Redacted text: emails, then URLs, then phone-like runs replaced by
    * typed placeholders (fixed order — redaction must be deterministic). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        UrlRe, "[URL]"),
      PhoneRe, "[PHONE]")
}
