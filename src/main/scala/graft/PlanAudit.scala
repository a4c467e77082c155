package graft

/** Dev tool: dumps the physical-plan evidence (pushdown, pruning, join
  * strategy, aggregation mode, codegen) for representative queries —
  * the ".explain and iterate" audit trail (see PLANS.md). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq(
      "c01_catalog_search", "h01_pricing_summary", "h02_top_revenue",
      "j01_enrich_join", "w01_argmax_backdrop", "d02_exact_dedup",
      "d05_minhash_neardups", "d08_cosine_topk", "k01_salted_agg",
      "a01_reports_stats", "d23_contamination", "d24_pii_scan",
      "h05_rollup_summary", "d17_json_props", "d16_sessionize",
      "d30_dedup_corpus", "d10a_embedding_neardups_banded",
      "d10b_embedding_neardups_banded_auto",
      "d33_boilerplate", "d39_semantic_dedup", "d40_asof_join",
      "d41_domain_cap", "d42_corpus_shuffle", "d43_chunk_sequences",
      "h07_small_qty_revenue", "h08_large_orders",
      "d23a_contamination_bloom", "d45_importance_weights",
      "d46_token_budget", "h09_custdist", "d47_source_overlap",
      "d48_dup_spans", "d49_incremental_dedup",
      "d10c_embedding_neardups_incremental",
      "d10d_embedding_neardups_incremental_auto",
      // d09e is lineage-cut (localCheckpoint over a scratch index), so
      // its plan properties are spec-pinned instead (DataxSpec
      // PartitionFilters test); d09d shows the ADC scoring shape
      "d09d_pq_topk",
      "h10_sole_return_supplier", "d50_snapshot_diff", "d51_data_card")
    for (name <- interesting) {
      println(s"\n##### $name")
      val df = SparkEntry.queries(name)(spark, dir)
      // formatted explain of the non-adaptive plan shows the static
      // strategy; AQE refines at runtime
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val keep = plan.linesIterator.filter { l =>
        val t = l.trim
        t.startsWith("PushedFilters") || t.startsWith("ReadSchema") ||
        t.contains("BroadcastHashJoin") || t.contains("SortMergeJoin") ||
        t.contains("HashAggregate") || t.contains("SortAggregate") ||
        t.contains("TakeOrderedAndProject") || t.contains("WholeStageCodegen") ||
        t.contains("Exchange") || t.contains("BatchScan")
      }
      keep.take(24).foreach(l => println(l.replaceAll("#\\d+L?", "")))
    }
    spark.stop()
  }
}
