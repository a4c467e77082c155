package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.Multimodal

/** Property-based invariants for the multimodal family (SURVEY.md §5.3
  * pattern): the stub decode chain is DETERMINISTIC digest arithmetic,
  * so every output is recomputable from scratch in test code — these
  * suites pin the whole chain (payload bytes -> md5 -> meta/frames/
  * features) against an independent Scala model on random payloads,
  * including multi-byte UTF-8 (the byte-length-vs-char-length trap) and
  * partitioning/batch-size independence of the mapPartitions path. */
class MultimodalPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import PropGen.{int, md5hex}

  /** Random docs with the columns [[Multimodal.assets]] reads; texts mix
    * ascii words with multi-byte tokens so payload byte length != char
    * length for some rows. */
  private def genDocs(n: Int, seed: Long): Seq[(Long, String, String, Int)] = {
    val vocab = Seq("alpha", "beta", "gamma", "näive", "héllo", "日本", "x")
    (0 until n).map { i =>
      val len = int(seed + i, 1, 12)
      val text = (0 until len)
        .map(j => vocab(int(seed + 1000L * i + j, 0, vocab.length - 1)))
        .mkString(" ")
      (i.toLong, text, "src" + (i % 3), text.length)
    }
  }

  private def toAssets(docs: Seq[(Long, String, String, Int)]) = {
    val s = spark
    import s.implicits._
    Multimodal.assets(docs.toDF("doc_id", "text", "source", "n_chars"))
  }

  test("decodeMeta == the Scala digest-arithmetic model on random payloads") {
    val docs = genDocs(40, 21001L)
    val got = toAssets(docs)
      .select(col("asset_id"), Multimodal.decodeMeta(col("payload")).as("d"))
      .select(col("asset_id"), col("d.width"), col("d.height"), col("d.n_frames"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val want = docs.map { case (id, text, _, _) =>
      val payload = text.getBytes("UTF-8")
      val hex = md5hex(payload)
      (id,
        64 + (hex.charAt(0).toInt * 256 + hex.charAt(1).toInt) % 1856,
        64 + (hex.charAt(2).toInt * 256 + hex.charAt(3).toInt) % 1016,
        payload.length % 240 + 1)
    }
    assert(got == want, "width/height/n_frames must match the md5-ascii model")
    // non-vacuity: some payload's byte length differs from its char
    // length (multi-byte tokens landed), so n_frames is byte-derived
    assert(docs.exists { case (_, t, _, _) => t.getBytes("UTF-8").length != t.length },
      "no multi-byte payload generated")
  }

  test("sampleFrames == the model: step-filtered frame indexes with the " +
       "per-frame digest chain") {
    // planted 1-byte video (44 % 3 == 2): n_frames = 2, exactly one
    // sampled frame — the degenerate grid the random lengths never hit
    val docs = genDocs(36, 22001L) :+ ((44L, "x", "src0", 1))
    val step = 5
    val got = Multimodal.sampleFrames(toAssets(docs), step = step)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = docs.filter(_._1 % 3 == 2).flatMap { case (id, text, _, _) =>
      val payload = text.getBytes("UTF-8")
      val digest = md5hex(payload)
      val nFrames = payload.length % 240 + 1
      (0 until nFrames).filter(_ % step == 0).map { f =>
        (id, f, md5hex(s"$digest:$f".getBytes("UTF-8")))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want, "video-only filter, frame grid, and frame digests " +
      "must match the model")
    // non-vacuity: some video has > 1 sampled frame, some exactly 1
    val perAsset = want.groupBy(_._1).map(_._2.length)
    assert(perAsset.exists(_ > 1) && perAsset.exists(_ == 1),
      "frame-count shapes too uniform to exercise the step filter")
  }

  test("extractFeatures == the model, invariant under partitioning and " +
       "batch size") {
    val docs = genDocs(40, 23001L)
    val assets = toAssets(docs)
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      Multimodal.extractFeatures(df, dim = 6, batchSize = bs)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getSeq[Float](3).toList))
        .sortBy(_._1).toSeq
    val base = run(assets, 64)
    val want = docs.map { case (id, text, _, _) =>
      val payload = text.getBytes("UTF-8")
      val hex = md5hex(payload)
      val mt = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      (id, mt, payload.length, (0 until 6).map(d => hex.charAt(d).toFloat).toList)
    }
    assert(base == want, "features must be the md5-hex ascii codes, " +
      "n_bytes the UTF-8 byte count")
    // the mapPartitions path must not depend on physical layout: same
    // rows under a hostile repartition and a batch size that forces
    // many partial batches
    assert(run(assets.repartition(7), 1) == base,
      "repartition(7) + batchSize=1 changed the result — the batched " +
        "per-partition path leaked physical layout into values")
  }
}
