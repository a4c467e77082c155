package graft.datax

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at scale: exact (hash groupBy), MinHash+LSH
  * (shingle -> signature -> band-bucket join -> verify), SimHash, and
  * n-gram Jaccard.
  *
  * Scale design notes:
  *  - exact dedup is one shuffle on the 16-byte digest, with map-side
  *    partial aggregation;
  *  - MinHash signatures are computed entirely scan-side with nested
  *    higher-order functions — NO explode of (shingle x hashId) rows, so
  *    the only shuffled data is (docId, band, bandSig): the classic
  *    pay-per-band LSH cost, independent of document length;
  *  - candidate verification touches only bucket collisions, never the
  *    full pair space (the n-gram Jaccard self-join below IS the full
  *    pair space restricted to shared shingles — correct but quadratic
  *    in the worst case; it exists as the exact baseline/verifier).
  *  - the default hash is md5 with lexicographic-min over hex strings (a
  *    valid uniform permutation family, and portable to any SQL oracle);
  *    swap `hashShingle` for xxhash64 to trade portability for speed.
  */
object Dedup {

  /** Distinct word k-shingles of the text; empty array when the document
    * has fewer than k tokens (Spark's `sequence(1, n)` is DESCENDING for
    * n<1, so the short-doc case must be guarded, not clamped). */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextStats.tokens(text)
    when(size(toks) >= k,
      array_distinct(
        filter(
          transform(sequence(lit(1), size(toks) - (k - 1)),
            i => concat_ws(" ", slice(toks, i, lit(k)))),
          s => s =!= "")))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash permutation: min over shingles of md5(seed:shingle).
    * Lexicographic min over hex digests ≡ min over a random permutation. */
  private def minhashOne(sh: Column, seed: Column): Column =
    array_min(transform(sh, x => md5(concat(seed.cast("string"), lit(":"), x))))

  /** The numHashes-long MinHash signature, computed scan-side. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i => minhashOne(sh, i))

  /** LSH band signatures: bands of rows hashes each collapsed to one
    * digest. Two docs sharing any band are candidates. */
  def lshBandSigs(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows)))))

  /** Exact Jaccard over the distinct shingle sets. */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB))
    inter / (size(shA) + size(shB) - inter)
  }

  /** Exact duplicate groups by normalized-text digest: representative
    * (min id) + member count; groups of 1 are non-duplicates. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("representative"), count(lit(1)).as("n_docs"))

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 4, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val withSh = docs.select(col(idCol).as("id"),
        shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = withSh.select(col("id"), col("sh"),
        posexplode(lshBandSigs(minhashSignature(col("sh"), numHashes), bands, rows))
          .as(Seq("band", "bsig")))
    val a = banded.select(col("band"), col("bsig"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bsig"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard pairs via shared-shingle self-join — the
    * exhaustive baseline MinHash approximates. Quadratic in bucket size;
    * use minhashNearDups at scale. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val exploded = sh.select(col("id"), col("sh"), explode(col("sh")).as("s"))
    val pairs = exploded.as("a").join(exploded.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
    pairs.select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64-based; Spark-native,
    * not SQL-portable — verified by spec, rows-only in the oracle). */
  def simhash64(text: Column): Column = {
    val toks = TextStats.tokens(text)
    // per bit j: sum of (bit_j(hash(t)) ? 1 : -1) over tokens; sign -> bit
    val bitSums = transform(sequence(lit(0), lit(63)), j =>
      aggregate(toks, lit(0),
        (acc, t) => acc + when(call_function("shiftright", xxhash64(t), j)
          .bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, j) => when(s > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH:
    * bucket by sign-pattern over `planes` pseudo-random hyperplanes
    * (deterministic, hash-derived), verify candidates with exact cosine.
    * Only bucket collisions are verified — never the full pair space. */
  def embeddingNearDups(vectors: DataFrame, idCol: String, vecCol: String,
                        planes: Int = 8, threshold: Double = 0.9): DataFrame = {
    val v = vectors.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
    // hyperplane p component j = ±1 from xxhash64(p:j) parity; sign of
    // dot(vec, plane) = sign of sum(±vec_j)
    val sigExpr = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(
        zip_with(col("vec"), sequence(lit(0), size(col("vec")) - 1),
          (x, j) => when(xxhash64(concat(p.cast("string"), lit(":"), j.cast("string")))
            .bitwiseAND(1) === 1, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, "1").otherwise("0")
    })
    val bucketed = v.select(col("id"), col("vec"),
      concat_ws("", sigExpr).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
