package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.Multimodal

/** Multimodal plumbing specs: binary payload round-trip, deterministic
  * stub decode, batch-size independence of the mapPartitions path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "first document text", "en", "srcA", 19L),
    (1L, "second one", "en", "srcA", 10L),
    (2L, "third, a video asset", "en", "srcB", 20L),
    (3L, "vierte", "de", "srcB", 6L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("assets: media_type partitioning and binary payload round-trip") {
    val a = Multimodal.assets(docs)
    assert(a.schema("payload").dataType.typeName == "binary")
    val got = a.orderBy("asset_id")
      .select($"media_type", $"payload".cast("string"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("image", "first document text"), ("audio", "second one"),
      ("video", "third, a video asset"), ("image", "vierte")))
  }

  test("decodeMeta is deterministic and in declared ranges") {
    val m = Multimodal.assets(docs)
      .select(Multimodal.decodeMeta($"payload").as("d"))
      .select("d.width", "d.height", "d.n_frames")
      .as[(Int, Int, Int)].collect()
    assert(m.forall { case (w, h, nf) =>
      w >= 64 && w < 1920 && h >= 64 && h < 1080 && nf >= 1 && nf <= 240 })
    val again = Multimodal.assets(docs)
      .select(Multimodal.decodeMeta($"payload").as("d"))
      .select("d.width", "d.height", "d.n_frames")
      .as[(Int, Int, Int)].collect()
    assert(m.toSeq == again.toSeq)
  }

  test("sampleFrames: video only, every step-th frame") {
    val f = Multimodal.sampleFrames(Multimodal.assets(docs), step = 7)
      .orderBy("asset_id", "frame_no")
      .select("asset_id", "frame_no").as[(Long, Int)].collect().toSeq
    assert(f.map(_._1).distinct == Seq(2L)) // only the video asset
    // payload 20 bytes -> n_frames = 21 -> frames 0,7,14
    assert(f.map(_._2) == Seq(0, 7, 14))
  }

  test("extractFeatures: batch-size independent and deterministic") {
    val a = Multimodal.assets(docs)
    def run(bs: Int) = Multimodal.extractFeatures(a, dim = 4, batchSize = bs)
      .orderBy("asset_id")
      .select($"asset_id", $"n_bytes", $"features")
      .as[(Long, Int, Seq[Float])].collect().toSeq
    val r1 = run(1)
    val r64 = run(64)
    assert(r1 == r64)
    assert(r1.map(_._2) == Seq(19, 10, 20, 6)) // utf8 byte lengths
    assert(r1.forall(_._3.length == 4))
  }

  test("extractFeatures: a NULL payload (undecodable asset) keeps its row " +
       "with null features instead of killing the executor") {
    // null-replay audit finding: a.payload.length NPE'd the task — a
    // single corrupt asset in a 100 TB scan must not fail the job
    val withNull = Seq(
        (1L, Some("img bytes"), "s0", Some(9L)),
        (2L, Option.empty[String], "s1", Option.empty[Long]))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Multimodal.extractFeatures(
        Multimodal.assets(withNull), dim = 4)
      .orderBy("asset_id")
      .select($"asset_id", $"n_bytes", $"features")
      .as[(Long, Int, Option[Seq[Float]])].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L), s"null asset lost its row: $r")
    assert(r(1)._2 == 0 && r(1)._3.isEmpty,
      s"null payload must yield (0, null features): ${r(1)}")
    assert(r(0)._3.exists(_.length == 4), "real asset unaffected")
  }
}
