package graft

import org.apache.spark.sql.functions._

/** Scale probe for the incremental embedding dedup (round 14): times
  * [[graft.datax.Dedup.embeddingNearDupsIncrementalAuto]] — (L, r)
  * DERIVED FROM THE INDEX SIZE via bandsFor, now an API (round 15)
  * instead of caller discipline — on a ScaleData corpus split batch
  * (vec_id % 10 = 0) vs index (rest). The contrast to the registry's
  * fixed-(3,4) d10c entry at the same scales is the measured argument
  * that parameter derivation, not the batch x index shape itself, is
  * what holds the join linear (SCALE.md round 14).
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_THRESHOLD (default 0.9 — the
  * near-dup design point; ScaleData plants partners at ~0.96 so the
  * output is non-trivial), SPARK_GRAFT_CPUS. SPARK_GRAFT_FIXED="L,r"
  * switches to the EXPLICIT form at those fixed parameters with the
  * DEFAULT maxBucketLoad tripwire — on a corpus the parameters weren't
  * sized for, the measurement is time-to-raise: what the round-15
  * guard converts the 61x quadratic blowup into. */
object IncLoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_THRESHOLD", "0.9").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .select("vec_id", "embedding")
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val index = emb.filter(col("vec_id") % 10 =!= 0)
    val (nBatch, nIndex) = (batch.count(), index.count())
    // parse ONCE, loudly: a malformed SPARK_GRAFT_FIXED (wrong arity,
    // non-numeric) must fail here, not silently fall through to the
    // auto form while the JSON still reports "mode":"fixed" (review
    // finding, round 15) — the artifact would mislabel which form was
    // measured. The mode string below derives from THIS validated value.
    val fixed: Option[(Int, Int)] = sys.env.get("SPARK_GRAFT_FIXED").map { s =>
      s.split(",").map(_.trim) match {
        case Array(l, rr) if l.forall(_.isDigit) && rr.forall(_.isDigit)
            && l.nonEmpty && rr.nonEmpty =>
          (l.toInt, rr.toInt)
        case _ => throw new IllegalArgumentException(
          s"""SPARK_GRAFT_FIXED="$s": expected exactly two ints "L,r"""")
      }
    }
    // reported for the JSON line; the auto form re-derives them inside
    val (tables, r) = fixed.getOrElse(
      graft.datax.Dedup.bandsFor(nIndex, threshold))
    val t0 = System.nanoTime()
    val outcome =
      try {
        val pairs = (fixed match {
          case Some((l, rr)) => graft.datax.Dedup
            .embeddingNearDupsIncremental(batch, index, "vec_id",
              "embedding", l, rr, threshold) // default tripwire ON
          case None => graft.datax.Dedup.embeddingNearDupsIncrementalAuto(
            batch, index, "vec_id", "embedding", threshold)
        }).count()
        s""""pairs":$pairs"""
      } catch {
        case e: Throwable =>
          val tripped = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .exists(t => Option(t.getMessage).exists(_.contains("hot LSH bucket")))
          s""""tripped":$tripped"""
      }
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"inc_load","sfDir":"$sfDir","threshold":$threshold,""" +
      s""""mode":"${if (fixed.isDefined) "fixed" else "auto"}",""" +
      s""""nBatch":$nBatch,"nIndex":$nIndex,"tables":$tables,"r":$r,""" +
      f"""$outcome,"tSec":$wall%.2f}""")
    spark.stop()
  }
}
