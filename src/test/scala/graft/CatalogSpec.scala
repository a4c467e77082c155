package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CatalogQueries, Enrich}
import graft.ops.CatalogQueries.SearchParams

/** Catalog read-path semantics on domain fixtures (SURVEY.md §3.1):
  * P1-P8 predicates, J1 projection, R1/R2 ordering+pagination, and the
  * Enrich derivations. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def movies = Fixtures.movies(spark)

  test("search: P1 frames-exist filter drops empty/null frames") {
    val ids = CatalogQueries.search(movies, SearchParams(limit = 100))
      .select("id", "_type").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ids == Set((1L, "movie"), (2L, "movie"), (4L, "movie")),
      "tv id=1 (empty frames) and id=3 (null frames) filtered out")
  }

  test("search: genre/animated/type/year filters conjunct") {
    val got = CatalogQueries.search(movies,
      SearchParams(genre = Some(16), isAnimated = Some(true),
        contentType = Some("movie"), yearFrom = Some(2001), yearTo = Some(2001), limit = 10))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("search: string-date year range is lexicographic (P5)") {
    val got = CatalogQueries.search(movies, SearchParams(yearFrom = Some(1999), yearTo = Some(1999), limit = 10))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("search: year 0 is falsy (`if year_from:` truthiness) — no bound applied") {
    val all = CatalogQueries.search(movies, SearchParams(limit = 100))
      .select("id").collect().map(_.getLong(0)).toSeq
    val zero = CatalogQueries.search(movies,
        SearchParams(yearFrom = Some(0), yearTo = Some(0), limit = 100))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(zero == all, "year 0 must behave exactly like no year filter")
  }

  test("search: J1 projection is the reference keep-set") {
    val cols = CatalogQueries.search(movies, SearchParams()).columns.toSeq
    assert(cols == CatalogQueries.movieProjection)
  }

  test("search: sort desc + skip/limit pagination (R1/R2)") {
    val page = CatalogQueries.search(movies,
      SearchParams(sortBy = "popularity", descending = true, skip = 1, limit = 1))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(page == Seq(2L), "popularity order 85,60,40 -> skip 1 -> 60 (id 2)")
  }

  test("byIds / byId point lookups (P6/P7)") {
    assert(CatalogQueries.byIds(movies, Seq(1L, 3L)).count() == 3,
      "IN-list matches both _types of id 1")
    val one = CatalogQueries.byId(movies, 1L, "tv").collect()
    assert(one.length == 1 && one.head.getAs[String]("name") == "Some Show")
  }

  test("titleRegexSearch: case-insensitive substring across title/title_ru (P8)") {
    val hit = CatalogQueries.titleRegexSearch(movies, "green")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(4L))
    val ru = CatalogQueries.titleRegexSearch(movies, "миля")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ru == Seq(4L), "title_ru matched when title doesn't")
    // the user string IS a pattern (reference passes it to $regex raw)
    val wild = CatalogQueries.titleRegexSearch(movies, "gre.n m")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(wild == Seq(4L), "metacharacters interpreted as regex")
    // invalid pattern -> error (Mongo errors on invalid $regex too)
    intercept[Exception] {
      CatalogQueries.titleRegexSearch(movies, "gre(en").count()
    }
    // literal mode quotes metacharacters for substring search
    assert(CatalogQueries.titleRegexSearch(movies, "gre(en", literal = true)
      .count() == 0)
  }

  test("Enrich: extractYear null on malformed; isAnimated; displayTitle coalesce") {
    val got = movies.select(col("id"), col("_type"),
        Enrich.extractYear(col("release_date")).as("y"),
        Enrich.isAnimated(col("genre_ids")).as("anim"),
        Enrich.displayTitle(col("title"), col("name")).as("t"))
      .filter(col("id") === 3 || (col("id") === 1 && col("_type") === "tv"))
      .orderBy("id", "_type").collect()
    val tv = got(0); val broken = got(1)
    assert(tv.getInt(2) == 2011 && tv.getString(4) == "Some Show")
    assert(broken.isNullAt(2), "extractYear('19xx') -> null")
    assert(!broken.getBoolean(3))
    // the reference returns None for len < 4 — "19" must NOT parse as 19
    import spark.implicits._
    val shorts = Seq("19", "", null, "1999", "1999-03-31").toDF("rd")
      .select(Enrich.extractYear(col("rd")).as("y")).collect()
    assert(shorts(0).isNullAt(0) && shorts(1).isNullAt(0) && shorts(2).isNullAt(0))
    assert(shorts(3).getInt(0) == 1999 && shorts(4).getInt(0) == 1999)
    // Python `or` truthiness: empty-string title falls through to name
    val titles = Seq(("", "Fallback"), (null, "AlsoFallback"), ("Real", "Unused"))
      .toDF("t", "n")
      .select(Enrich.displayTitle(col("t"), col("n"))).as[String].collect().toSeq
    assert(titles == Seq("Fallback", "AlsoFallback", "Real"))
  }

  test("Enrich: key build/parse round-trip incl. malformed keys (F2-F4)") {
    import spark.implicits._
    val keys = Seq("years:movie:1999", "years:tv:2011", "top_vote_count_movie", "years:movie:abc")
      .toDF("key")
    val parsed = keys.select(col("key"),
        Enrich.parseKeyContentType(col("key")).as("ct"),
        Enrich.parseKeyYear(col("key")).as("y")).collect()
    assert(parsed(0).getString(1) == "movie" && parsed(0).getInt(2) == 1999)
    assert(parsed(1).getString(1) == "tv" && parsed(1).getInt(2) == 2011)
    assert(parsed(2).isNullAt(1), "non-years key -> null content type")
    assert(parsed(3).isNullAt(2), "non-numeric year -> null")
  }
}
