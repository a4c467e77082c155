package graft

import org.apache.spark.sql.functions._

import graft.functions.StructCodec

/** Dev probe (SCALE.md payload-codec study): isolates the as-of payload
  * pack+unpack round-trip cost — `to_json`/`from_json` vs
  * [[graft.functions.StructCodec]] — from the streaming machinery,
  * whose per-batch noise on this box swamps the codec delta in the
  * end-to-end AsofScaleProbe runs. Builds N wide synthetic rows
  * (string + double + micros timestamp + array<string>), then times
  * pack -> unpack -> field-sum per codec, medians over reps. Env:
  * SPARK_GRAFT_ROWS (default 3e6), SPARK_GRAFT_REPS (default 5),
  * SPARK_GRAFT_CPUS. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "3000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val payload = struct(
      concat(lit("user-tag-"), col("id") % 1000).as("tag"),
      (col("id") % 997 * 1.5).as("score"),
      timestamp_micros(col("id") * 1000001L).as("seen"),
      array(concat(lit("a"), col("id") % 7), concat(lit("b"), col("id") % 13),
        lit("cxxxxxxxxxxxx")).as("attrs"))
    val schema = spark.range(1).select(payload.as("p"))
      .schema.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    // consume every unpacked field so neither codec's work is pruned
    def consume(p: org.apache.spark.sql.Column) =
      sum(length(p.getField("tag")) + p.getField("score")
        + unix_micros(p.getField("seen")) + size(p.getField("attrs")))
    val jsonOpts = Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
      "ignoreNullFields" -> "false")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val base = spark.range(n).toDF()

    val tJson = (0 until reps).map(_ => time {
      base.select(to_json(payload, jsonOpts).as("b"))
        .select(consume(from_json(col("b"), schema, jsonOpts))).collect()
    })
    val tBin = (0 until reps).map(_ => time {
      base.select(StructCodec.pack(payload).as("b"))
        .select(consume(StructCodec.unpack(col("b"), schema))).collect()
    })
    // byte sizes of one packed payload per codec (row id=12345)
    val one = spark.range(12345, 12346).toDF()
    val jsonBytes = one.select(length(to_json(payload, jsonOpts))).head().getInt(0)
    val binBytes = one.select(length(StructCodec.pack(payload))).head().getInt(0)
    println(f"""{"probe":"codec_roundtrip","rows":$n,"reps":$reps,"json_med_sec":${median(tJson)}%.2f,"binary_med_sec":${median(tBin)}%.2f,"json_all":[${tJson.map(t => f"$t%.2f").mkString(",")}],"binary_all":[${tBin.map(t => f"$t%.2f").mkString(",")}],"json_payload_bytes":$jsonBytes,"binary_payload_bytes":$binBytes}""")
    spark.stop()
  }
}
