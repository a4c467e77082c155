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
    // events.ts has shipped in several physical encodings across testdata
    // generations; normalize every one of them to a plain TimestampType so
    // downstream operators see ONE type:
    //  - TIMESTAMP(NANOS): Spark only reads it as a nanos-epoch long
    //    (spark.sql.legacy.parquet.nanosAsLong=true, set in every session
    //    here). Micro-aligned data, so the conversion is lossless. `div` =
    //    integer division (a double roundtrip loses precision > 2^53 ns).
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
    //    TIMESTAMP_NTZ, which rejects cast-to-numeric and unix_micros.
    //    Session TZ is pinned UTC everywhere here, so casting to
    //    TimestampType keeps the same instant — and the DuckDB oracle,
    //    which reads the same file as naive timestamps, still agrees.
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        d.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case (d, _) => d
    }
  }
}
