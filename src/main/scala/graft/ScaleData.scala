package graft

import org.apache.spark.sql.functions._

/** BENCH-ONLY synthetic scale-up of the `documents` table: writes an
  * N-times-larger copy so the heavy dedup family can be timed at a data
  * size where execution dominates compile/dispatch (SCALE.md notes the
  * sf0.1 MinHash timings measure codegen as much as data; the driver
  * testdata tops out at sf0.1 in this sandbox).
  *
  * Construction preserves the BASE corpus's duplicate structure instead
  * of distorting it: copy `c` remaps ids to id*N+c and suffixes every
  * whitespace token with `_c<c>`. Token spaces of different copies are
  * therefore DISJOINT (no cross-copy shingle or fingerprint collisions,
  * which plain duplication would create — every doc would gain N-1
  * exact twins and the pair count would explode quadratically), while
  * within one copy the token renaming is a bijection, so each copy's
  * shingle-set relations — and hence its dup pairs — are exactly the
  * base's. Result: N x rows, N x duplicate pairs, N x candidate load —
  * a clean linear scale-up for ratio measurements, NOT a correctness
  * fixture (oracle queries never run against it).
  *
  * Env: SPARK_GRAFT_SF_DIR (base, default sf0.1), SPARK_GRAFT_SCALE
  * (default 10), SPARK_GRAFT_SCALE_OUT (default /tmp/graft_scale_<N>x).
  * Usage: build once, then point the canary-gated Bench at it:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_10x \
  *   SPARK_GRAFT_ONLY=d05_...,d07_... sbt "runMain graft.Bench"
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", s"/tmp/graft_scale_${n}x")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val copies = (0 until n).map { c =>
      docs
        .withColumn("doc_id", col("doc_id") * n + c)
        // suffix every token: bijective within a copy, disjoint across
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_c$c"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"""{"scaled":"$out","factor":$n,"rows":${spark.read.parquet(s"$out/documents.parquet").count()}}""")
    spark.stop()
  }
}
