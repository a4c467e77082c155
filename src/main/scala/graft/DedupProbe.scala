package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage timings for the MinHash pipeline at a given SF. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    graft.datax.Dedup.minhashNearDups(docs, "doc_id", "text", 4, 16, 8, 0.3).count()
    spark.sqlContext.clearCache()
    // stage A: shingle rows only
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id").as("id"),
      posexplode(graft.datax.TextStats.tokens(col("text"))).as(Seq("pos", "t")))
    val w = Window.partitionBy("id").orderBy("pos")
    val leads = (1 to 3).map(j => lead(col("t"), j).over(w))
    val sh = toks.select(col("id"), concat_ws(" ", col("t") +: leads: _*).as("s"),
        leads.last.as("_l"))
      .filter(col("_l").isNotNull && col("s") =!= "").select("id", "s").distinct()
    time("A shingle rows")(sh.count())
    // A2: HOF over materialized token arrays (no window sort)
    val tokCol = docs.select(col("doc_id").as("id"),
      graft.datax.TextStats.tokens(col("text")).as("toks"))
    val sh2 = tokCol.select(col("id"),
        explode(graft.datax.Dedup.shinglesFromTokens(col("toks"), 4)).as("s"))
      .distinct()
    time("A2 HOF shingle rows")(sh2.count())
    val cached = sh.cache(); cached.count()
    // stage B: signatures from cached rows
    val hashAggs = (0 until 16).map(i =>
      min(substring(md5(concat(lit(s"${i / 4}:"), col("s"))), (i % 4) * 8 + 1, 8)).as(s"_h$i"))
    val sigs = cached.groupBy("id").agg(hashAggs.head, hashAggs.tail: _*)
    time("B signatures")(sigs.count())
    // stage C: bands + candidates
    val bandSigCols = (0 until 8).map { b =>
      md5(concat_ws(",", (0 until 2).map(r => col(s"_h${b * 2 + r}")): _*)) }
    val banded = sigs.select(col("id"), posexplode(array(bandSigCols: _*)).as(Seq("band", "bsig")))
    val buckets = banded.groupBy("band", "bsig")
      .agg(sort_array(collect_list(col("id"))).as("ids")).filter(size(col("ids")) > 1)
    val pairCombos = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), y => struct(x.as("id_a"), y.as("id_b")))))
    val cand = buckets.select(explode(pairCombos).as("p")).select(col("p.id_a"), col("p.id_b")).distinct()
    time("C bands+cands")(cand.count())
    // full pipeline (fresh, uncached)
    spark.sqlContext.clearCache()
    time("FULL minhashNearDups")(
      graft.datax.Dedup.minhashNearDups(docs, "doc_id", "text", 4, 16, 8, 0.3).count())
    // clustering stage on top of the (recomputed) pair list
    spark.sqlContext.clearCache()
    val pairs = graft.datax.Dedup.minhashNearDups(docs, "doc_id", "text", 4, 16, 8, 0.3)
    time("FULL dupClusters")(graft.datax.Dedup.dupClusters(pairs).count())
    spark.stop()
  }
}
