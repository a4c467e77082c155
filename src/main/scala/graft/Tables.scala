package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-provided testdata tables (TESTDATA.md): one parquet
  * file per table under /root/testdata/sf{0.001,0.01,0.1}.
  *
  * At 100 TB these would be partitioned parquet/iceberg directories; the
  * single-file layout here is only the test harness. Everything downstream
  * treats each table as an arbitrary-partitioned DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    // nanos-epoch long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    // every session here). The data is micro-aligned, so converting to a
    // regular TimestampType is lossless. `div` = integer division (a
    // double roundtrip would lose precision above 2^53 nanos).
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case (d, _) => d
    }
  }
}
