package graft.datax

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, column pruning, partition
  * behavior, batched per-partition execution — while the actual codec call
  * is STUBBED with a deterministic fake (this container has no image/audio
  * libraries). In production [[extractFeatures]]'s `fakeDecode` is replaced
  * by the real codec invocation; nothing else changes.
  *
  * Scale design: payloads never leave the executor (no collect), metadata
  * derivation is pure column expressions (codegen'd, scan-side), and the
  * batched mapPartitions path controls peak memory by decoding
  * `batchSize` assets at a time — the Scala analogue of arrow-batched
  * mapInPandas.
  */
object Multimodal {

  /** Asset table derived from `documents`: opaque payload + typed meta.
    * (The testdata has no real media bytes; text-as-bytes stands in. The
    * schema — id, media_type, binary payload, meta struct — is the real
    * contract.) */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("n_bytes_declared")).as("meta"))

  /** STUB decode: deterministic pseudo-dimensions from the payload digest
    * (ascii codes of the first md5-hex chars — portable to any SQL
    * engine). A real decoder reads the codec header instead. */
  def decodeMeta(payload: Column): Column = {
    val d = md5(payload)
    struct(
      (lit(64) + (ascii(substring(d, 1, 1)) * 256 + ascii(substring(d, 2, 1))) % 1856)
        .as("width"),
      (lit(64) + (ascii(substring(d, 3, 1)) * 256 + ascii(substring(d, 4, 1))) % 1016)
        .as("height"),
      (octet_length(payload) % 240 + 1).as("n_frames"))
  }

  /** Frame sampling for video assets: every `step`-th frame index, one
    * output row per sampled frame with a deterministic per-frame digest
    * (stub for "decode frame n"). */
  def sampleFrames(assets: DataFrame, step: Int): DataFrame = {
    val withMeta = assets
      .filter(col("media_type") === "video")
      .withColumn("_dec", decodeMeta(col("payload")))
    withMeta.select(
        col("asset_id"),
        explode(filter(sequence(lit(0), col("_dec.n_frames") - 1),
          i => i % step === 0)).as("frame_no"),
        md5(col("payload")).as("_digest"))
      .select(col("asset_id"), col("frame_no"),
        md5(concat(col("_digest"), lit(":"), col("frame_no").cast("string")))
          .as("frame_digest"))
  }

  final case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])
  final case class AssetFeatures(asset_id: Long, media_type: String,
      n_bytes: Int, features: Array[Float])

  /** Batched per-partition feature extraction — the shape a real
    * embedding/codec model runs in: assets stream through in batches of
    * `batchSize` (bounding decoder/model peak memory), one output row per
    * asset. `fakeDecode` is the stub standing in for the codec+model
    * call; it is deterministic in the payload bytes.
    *
    * A NULL payload (undecodable asset) must NOT kill the executor (it
    * NPE'd here before the null-replay audit): the asset keeps its
    * output row with `n_bytes = 0, features = null` — visible to audits,
    * and dropped for free by any inner explode over the features. */
  def extractFeatures(assets: DataFrame, dim: Int = 8,
                      batchSize: Int = 64): DataFrame = {
    val ds: Dataset[Asset] = assets
      .select("asset_id", "media_type", "payload")
      .as[Asset](Encoders.product[Asset])
    ds.mapPartitions { it: Iterator[Asset] =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: model.embed(decode(batch)) — one call per batch
        batch.map(a => AssetFeatures(a.asset_id, a.media_type,
          if (a.payload == null) 0 else a.payload.length,
          if (a.payload == null) null else fakeDecode(a.payload, dim)))
      }
    }(Encoders.product[AssetFeatures]).toDF()
  }

  /** Deterministic stand-in for decode+embed: ascii codes of the payload
    * digest's leading hex chars. Digesting reads every payload byte (the
    * I/O shape of a real decode), and the integer-valued floats are exact
    * in any engine — the driver's DuckDB oracle replays them as
    * `ascii(substr(md5(text), d+1, 1))`. */
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    require(dim <= 32, "stub features are drawn from the 32 md5 hex chars")
    val hex = java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    Array.tabulate(dim)(d => hex.charAt(d).toFloat)
  }
}
