package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column semantics of the reference's enrichment steps
  * (SURVEY.md §2.9): pure `Column => Column` combinators, so they compose
  * into any plan and stay inside whole-stage codegen (no UDFs).
  *
  * Sessions run with `spark.sql.ansi.enabled=false` so invalid casts yield
  * NULL — matching the reference's None-on-malformed behavior
  * (reference: app/catalog/upsert.py:37-43).
  */
object Enrich {

  /** F1 — year from a "YYYY-MM-DD" *string*; NULL on short/invalid input.
    * The length guard matters: the reference returns None for inputs
    * shorter than 4 chars, while a bare substring+cast would happily
    * parse "19" as 19 (reference: app/catalog/upsert.py:37-43). */
  def extractYear(releaseDate: Column): Column =
    when(length(releaseDate) >= 4, substring(releaseDate, 1, 4).cast("int"))

  /** F5 — `is_animated = 16 in genre_ids` (reference: app/sync.py:104). */
  def isAnimated(genreIds: Column): Column =
    coalesce(array_contains(genreIds, 16), lit(false))

  /** F6 — iso codes from `production_countries`, dropping nulls
    * (reference: app/catalog/upsert.py:65-66). */
  def countryCodes(productionCountries: Column): Column =
    filter(
      transform(coalesce(productionCountries, array().cast("array<struct<iso_3166_1:string,name:string>>")),
        c => c.getField("iso_3166_1")),
      x => x.isNotNull)

  /** F7 — `title or name`: Python `or` is TRUTHINESS, so the empty
    * string falls through to name just like None does
    * (reference: app/sync.py:36). */
  def displayTitle(title: Column, name: Column): Column =
    coalesce(when(length(title) > 0, title), name)

  /** F2 — cursor key building `f"years:{type}:{year}"`
    * (reference: app/sync_years.py:18-20). */
  def buildYearKey(contentType: Column, year: Column): Column =
    concat_ws(":", lit("years"), contentType, year)

  /** F3 — `key.split(":", 2)` -> (content_type, year); NULL-safe on
    * malformed keys (reference: app/main.py:100-105). */
  def parseKeyContentType(key: Column): Column = {
    val parts = split(key, ":", 3)
    when(size(parts) === 3, element_at(parts, 2))
  }

  /** F3/F4 — year parsed from the key tail `key.rsplit(":",1)[-1]`
    * (reference: app/main.py:196,205). NULL when non-numeric. */
  def parseKeyYear(key: Column): Column =
    element_at(split(key, ":"), -1).cast("int")
}
