package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the perf properties PLANS.md documents,
  * asserted so a refactor can't silently lose them while staying
  * value-correct. Non-adaptive explain is inspected (AQE refines but
  * does not add scans/filters). */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  /** Assert each filter reached the scan OF THE NAMED TABLE, without
    * pinning the full bracketed PushedFilters list: extra beneficial
    * pushdown (e.g. a loader null-guard adding IsNotNull) must never
    * fail a plan test. (r12 lesson: the d08 assert pinned the exact
    * list and went red on a strictly-better plan. r13 ADVICE: an
    * unscoped match passes when the filter lands on the WRONG table's
    * scan, and bare substring matching lets `LessThan(x,16)` match
    * `LessThan(x,160)` — so the match is scoped to scan lines whose
    * parquet location names `table`, and each filter must be followed
    * by a list delimiter.) */
  private def assertPushed(p: String, table: String, filters: String*): Unit = {
    val scanLines = p.linesIterator
      .filter(l => l.contains("PushedFilters:") && l.contains(s"/$table.parquet"))
      .mkString("\n")
    assert(scanLines.nonEmpty,
      s"no `$table` scan with PushedFilters in plan:\n$p")
    filters.foreach { f =>
      val anchored = (java.util.regex.Pattern.quote(f) + "[,\\]]").r
      assert(anchored.findFirstIn(scanLines).isDefined,
        s"filter `$f` must reach the `$table` scan; its pushed lines were:\n$scanLines\nfull plan:\n$p")
    }
  }

  test("c01: filters pushed to the scan, sort+limit fused") {
    val p = plan("c01_catalog_search")
    assertPushed(p, "orders", "IsNotNull(o_orderstatus)")
    assert(p.contains("TakeOrderedAndProject"), "page must not global-sort")
  }

  test("h02: dims broadcast, partial/final aggregation, top-k fused") {
    val p = plan("h02_top_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer and orders sides must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "no shuffle join expected at this shape")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("j01: column pruning reaches the orders scan") {
    val p = plan("j01_enrich_join")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"orders scan must read 2 columns only:\n$p")
  }

  test("h01: aggregation is a partial/final pair (map-side combine)") {
    val p = plan("h01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected 2 HashAggregates:\n$p")
    assertPushed(p, "lineitem", "IsNotNull(l_shipdate)")
  }

  test("w01: max_by partial-aggregates before the exchange") {
    val p = plan("w01_argmax_backdrop")
    // SortAggregate (struct buffer) is expected — but it MUST appear
    // twice: partial before the shuffle, final after
    assert("SortAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("h05: Expand runs AFTER the base aggregate, not on raw fact rows") {
    val df = SparkEntry.queries("h05_rollup_summary")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the rollup's Expand must consume the (flag,status) pre-aggregate:
    // in the plan tree that means an Expand with an aggregate BELOW it
    val lines = p.linesIterator.toSeq
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, s"rollup plan lost its Expand:\n$p")
    assert(lines.drop(expandIdx + 1).exists(_.contains("HashAggregate")),
      s"Expand must sit above the pre-aggregate, not above the scan:\n$p")
  }

  test("d17: props parsed once via from_json, not per-path get_json_object") {
    val p = SparkEntry.queries("d17_json_props")(spark, dir)
      .queryExecution.analyzed.toString
    assert(p.contains("from_json"), s"expected from_json in the plan:\n$p")
    assert(!p.contains("get_json_object"), s"per-path parse crept back:\n$p")
  }

  test("d16: sessionize has exactly one data shuffle (window partitioning reused)") {
    val p = plan("d16_sessionize")
    // exchanges: one hashpartitioning(user_id) for the window; the final
    // orderBy adds a rangepartitioning — but NO second hash exchange
    // between window and groupBy (clustering satisfied by subset rule)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("d08: query side broadcasts with its filter pushed") {
    val p = plan("d08_cosine_topk")
    assert(p.contains("BroadcastExchange"))
    assertPushed(p, "embeddings", "IsNotNull(vec_id)", "LessThan(vec_id,16)")
  }

  test("h10: decorrelated to aggregates — no lineitem self-join, top-k fused") {
    val p = plan("h10_sole_return_supplier")
    // the EXISTS/NOT-EXISTS pair must NOT plan as lineitem x lineitem:
    // exactly one lineitem scan feeds one per-order aggregation pass
    assert("Scan parquet [^\n]*lineitem".r.findAllIn(p).size == 1,
      s"lineitem must be scanned exactly once:\n$p")
    assertPushed(p, "orders", "IsNotNull(o_orderstatus)", "EqualTo(o_orderstatus,F)")
    assert(p.contains("TakeOrderedAndProject"), "limit must not global-sort")
  }

  test("d48: one gram build feeds both consumers (exchange reused, no cartesian)") {
    val df = SparkEntry.queries("d48_dup_spans")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian in span removal:\n$p")
    // the window-lead gram pipeline is cached: the duplicate-gram count
    // and the cover join must read the SAME InMemoryRelation, so at most
    // one id-partitioned window Exchange exists pre-cache
    assert(p.contains("InMemoryTableScan"),
      s"gram relation must be cache-shared, not recomputed:\n$p")
    graft.datax.Dedup.releaseShingleCaches()
  }

  test("d50: digests computed scan-side — text never rides the diff join") {
    val df = SparkEntry.queries("d50_snapshot_diff")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val joinIdx = p.linesIterator.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, "full-outer diff joins by shuffle (cannot broadcast)")
    // the join keys/payload are (id, md5 digest): no `text` attribute
    // may appear in the join operator's own line
    val joinLine = p.linesIterator.toSeq(joinIdx)
    assert(!joinLine.contains("text"), s"text must not ride the join:\n$joinLine")
  }
}
