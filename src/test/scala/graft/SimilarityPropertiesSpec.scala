package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.{Dedup, Similarity}

/** Property-based invariants for the similarity family (SURVEY.md §5.3),
  * complementing the fixed-corpus oracle rows (d08/d09/d25/d29/d39):
  * random vector sets exercise tie and cluster shapes the testdata
  * generator never produces, and each property is checked against an
  * INDEPENDENT Scala model, not a replay of the operator's output.
  *
  * Vectors carry small-INTEGER entries so every dot product and fold sum
  * is IEEE-exact: the Scala model then reproduces Spark's arithmetic
  * bit-for-bit (same ops, same order, no rounding slack), and ranking /
  * threshold comparisons admit no tolerance fudge. All generators are
  * seeded — every run sees the same vectors. */
class SimilarityPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** n random integer-entry vectors (dim entries in -3..3, last entry
    * 1..3 so no vector is zero and cosine never divides by zero). */
  private def genVecs(n: Int, seed: Long, dim: Int): Seq[(Long, Array[Float])] = {
    val gen = for {
      head <- Gen.listOfN(dim - 1, Gen.choose(-3, 3))
      tail <- Gen.choose(1, 3)
    } yield (head :+ tail).map(_.toFloat).toArray
    (0 until n).map(i => i.toLong -> gen(Gen.Parameters.default, Seed(seed + i)).get)
  }

  private def toDF(vs: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    vs.toDF("vec_id", "embedding")
  }

  /** The model's arithmetic mirrors the operators': sequential fold dot,
    * sqrt norms, dot / (normA * normB) in that association. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** The ivfIndex centroid pick, modeled: every stride-th id, sorted,
    * first nCentroids. */
  private def modelCentroids(vs: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Array[Float])] = {
    val stride = math.max(1L, vs.length.toLong / k)
    vs.filter(_._1 % stride == 0).sortBy(_._1).take(k)
  }

  /** Nearest-centroid assignment, modeled: best by (cosine desc,
    * centroid_id asc). */
  private def modelAssign(vs: Seq[(Long, Array[Float])],
                          cs: Seq[(Long, Array[Float])]): Map[Long, Long] =
    vs.map { case (id, v) =>
      id -> cs.map { case (cid, c) => (cid, cos(v, c)) }
        .minBy { case (cid, s) => (-s, cid) }._1
    }.toMap

  test("bruteForceTopK == the Scala model: (cosine desc, id asc) ranking " +
       "with planted exact ties") {
    // ids 30..34 are ids 0..4 scaled by 2: cosine is scale-invariant and
    // the x2 scaling is exact in IEEE, so each copy EXACTLY ties its
    // original against every query — the tie-break path runs for real
    val base = genVecs(30, 7001L, dim = 6)
    val vecs = base ++ (0 until 5).map(i =>
      (30L + i) -> base(i)._2.map(x => x * 2.0f))
    val queries = vecs.filter(_._1 < 6)
    val k = 5
    val got = Similarity.bruteForceTopK(toDF(vecs), toDF(queries), k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val want = queries.flatMap { case (qid, q) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, q)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want,
      "brute-force top-k must equal the model ranking bit-for-bit")
    // non-vacuity: some query's top-k really contains an exact cosine tie
    // (adjacent ranks, equal score) — the id tie-break path ran
    assert(got.groupBy(_._1).exists { case (_, rows) =>
      rows.map(_._4).distinct.length < rows.length
    }, "no exact tie landed in any top-k under this seed")
  }

  test("ivfTopK probing EVERY bucket == bruteForceTopK: the approximation " +
       "is exact when nothing is pruned") {
    val vecs = genVecs(40, 7101L, dim = 6)
    val queries = vecs.filter(_._1 % 7 == 0)
    val (centroids, assigned) = Similarity.ivfIndex(toDF(vecs), nCentroids = 4)
    val ivf = Similarity.ivfTopK(centroids, assigned, toDF(queries),
        k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val brute = Similarity.bruteForceTopK(toDF(vecs), toDF(queries), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(ivf == brute,
      "nProbe == nCentroids scans every bucket exactly once — IVF must " +
        "reproduce the exhaustive ranking row for row")
  }

  test("semanticDedup is CHARACTERIZED by its contract: dropped iff a " +
       "smaller-id same-cluster neighbor at-or-above threshold") {
    // planted near-twins (x2-scaled copies, exact cosine 1) plus random
    // vectors: both drop and keep paths run on every cluster shape
    val base = genVecs(36, 7201L, dim = 6)
    val vecs = base ++ (0 until 8).map(i =>
      (100L + i) -> base(3 * i)._2.map(x => x * 2.0f))
    val threshold = 0.9
    val out = Similarity.semanticDedup(toDF(vecs), nCentroids = 5,
        threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    Dedup.releaseShingleCaches()
    assert(out.length == vecs.length, "one row per input vector")

    val byId = vecs.toMap
    val cs = modelCentroids(vecs, 5)
    val wantAssign = modelAssign(vecs, cs)
    out.foreach { case (id, cid, _) =>
      assert(cid == wantAssign(id),
        s"vector $id assigned to $cid; model says nearest centroid is ${wantAssign(id)}")
    }
    val cluster = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cid, keep) =>
      val dominated = vecs.exists { case (other, v) =>
        other < id && cluster(other) == cid && cos(v, byId(id)) >= threshold
      }
      assert(keep == !dominated,
        s"vector $id: keep=$keep but a smaller-id near-twin in cluster " +
          s"$cid exists=$dominated")
    }
    // the planted copies make the check non-vacuous: every copy shares a
    // cluster with its original (cosine 1 to the same centroids) and drops
    assert(out.count(!_._3) >= 8, "all planted twins must be dropped")
  }

  test("labelCentroids == model means; chunked fold == flat fold where " +
       "sums are exact") {
    val vecs = genVecs(40, 7301L, dim = 5)
    val s = spark
    import s.implicits._
    val labeled = vecs.map { case (id, v) => (id, "lbl" + (id % 3), v) }
      .toDF("vec_id", "label", "embedding")
    def rows(chunkIds: Long) =
      Similarity.labelCentroids(labeled, "label", "vec_id", "embedding", chunkIds)
        .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getDouble(2), r.getLong(3))))
        .sortBy(_._1).toSeq
    val flat = rows(0L)
    val want = (for {
      lbl <- 0 until 3
      members = vecs.filter(_._1 % 3 == lbl)
      dim <- 0 until 5
    } yield (("lbl" + lbl, dim),
      (members.map(_._2(dim).toDouble).sum / members.length, members.length.toLong)))
      .sortBy(_._1)
    assert(flat == want, "flat fold must equal the model mean exactly " +
      "(integer entries: the sum is order-independent and IEEE-exact)")
    assert(rows(7L) == flat,
      "chunked-range fold re-associates only exact partial sums here — " +
        "must be bit-identical to the flat fold")
    // chunkIds = -1 ("auto", round 18): ids 0..39 -> width 40 ->
    // ceil(sqrt(40)) = 7, exactly the explicit run above
    assert(Similarity.chunkIdsFor(0L, 39L) == 7L)
    assert(rows(-1L) == flat,
      "the auto derivation must route through the same chunked fold")
  }

  test("kmeansCentroidsOrdered: chunked fold == flat fold at any chunking " +
       "(integer vectors keep every Lloyd sum exact)") {
    val vecs = genVecs(40, 7401L, dim = 5)
    def run(chunkIds: Long) =
      Similarity.kmeansCentroidsOrdered(toDF(vecs), nCentroids = 4,
          iterations = 2, chunkIds = chunkIds)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val flat = run(0L)
    assert(flat.nonEmpty && flat.map(_._1).distinct.size == 4)
    assert(run(7L) == flat,
      "per-chunk partial sums are exact on integer entries, so the " +
        "two-level fold must reproduce the flat Lloyd refinement bit-for-bit")
    assert(run(-1L) == flat, "chunkIds = -1 (auto) — same fold, derived size")
  }

  /** The d42 md5(seed:tag:id) hash-uniform, modeled byte-for-byte. */
  private def md5u(seed: Long, tag: String, id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
  }

  /** Ordered-fold squared L2 (ascending dims — sqDist's association). */
  private def sqm(a: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - c(i); s += d * d; i += 1 }
    s
  }

  test("ivfSeedsReservoir == model bottom-k by hash coin; " +
       "ivfSeedsKMeansParallel == independent model on integer vectors; " +
       "both partitioning-invariant") {
    val vecs = genVecs(60, 7601L, dim = 5)
    val df = toDF(vecs)
    // RESERVOIR: bottom-5 ids by (md5u, id)
    val wantRes = vecs.map { case (id, _) => (md5u(42L, "res", id), id) }
      .sorted.take(5).map(_._2).sorted
    def resIds(d: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSeedsReservoir(d, 5)
        .select("centroid_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(resIds(df) == wantRes.toSeq)
    assert(resIds(df.repartition(7)) == wantRes.toSeq)

    // KMEANS||: the full model — min-id first center, 2 cost-weighted
    // rounds under the same coin, cosine-weighted top-4 reduction
    val k = 4; val l = 2.0 * k
    var centers = Vector(
      (vecs.minBy(_._1)._1, vecs.minBy(_._1)._2.map(_.toDouble)))
    for (r <- 1 to 2) {
      val costs = vecs.map { case (id, v) =>
        (id, centers.map(c => sqm(v, c._2)).min) }
      val psi = costs.map(_._2).sum // exact: integer entries
      if (psi > 0) {
        val known = centers.map(_._1).toSet
        val picked = costs
          .filter { case (id, cost) => md5u(42L, s"r$r", id) * psi < cost * l }
          .collect { case (id, _) if !known(id) =>
            (id, vecs.find(_._1 == id).get._2.map(_.toDouble)) }
          .sortBy(_._1)
        centers = centers ++ picked
      }
    }
    // weights: cosine-nearest (ties to the lower centroid id), count
    val weights = vecs.map { case (_, v) =>
      centers.minBy { case (cid, c) =>
        (-cos(v, c.map(_.toFloat).toArray), cid) }._1
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // greedy farthest-point: heaviest first, then max min-sq-L2 to the
    // chosen set, ties to the lower id
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    var chosen = Vector(centers.maxBy { case (cid, _) =>
      (weights.getOrElse(cid, 0L), -cid) })
    var rest = centers.filterNot(_._1 == chosen.head._1)
    while (chosen.size < k && rest.nonEmpty) {
      val next = rest.maxBy { case (cid, cvec) =>
        (chosen.map(ch => d2(cvec, ch._2)).min, -cid) }
      chosen = chosen :+ next
      rest = rest.filterNot(_._1 == next._1)
    }
    val wantKm = chosen.map(_._1).sorted
    def kmIds(d: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSeedsKMeansParallel(d, k, rounds = 2)
        .select("centroid_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kmIds(df) == wantKm,
      s"kmeans|| seeds must equal the model, got ${kmIds(df)} want $wantKm")
    assert(kmIds(df.repartition(7)) == wantKm,
      "hash coins + exact integer sums: partitioning must not change the seeds")
    // sanity: the cost-weighted rounds actually picked beyond the k cap
    assert(centers.size > k, "oversampling must produce > k candidates")
  }

  test("kmeans|| cost pass: centers-as-data join form == literal " +
       "min-of-folds form, bit-equal per point (round-18 de-literalization " +
       "pin — the production path no longer grows the plan with |centers|)") {
    // both integer-entry vectors (every sum exact) AND non-integer
    // floats: the per-point pin needs no integer crutch — each
    // (point, center) fold is the SAME ordered fold in both forms, and
    // min over identical doubles is exact regardless of entries (only
    // ψ's cross-point SUM needs integer entries, pinned by the model
    // test above)
    for ((vecs, tag) <- Seq(
        (genVecs(60, 7603L, dim = 5), "integer"),
        (genVecs(60, 7607L, dim = 5).map { case (id, v) =>
          (id, v.map(_ / 7.0f)) }, "float"))) {
      val centers: Seq[(Long, Seq[Double])] = vecs.take(7)
        .map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
      val v = toDF(vecs).select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      val literal = v.select(col("id"), array_min(array(
          centers.map(c => fold(col("vec"), typedLit(c._2))): _*)).as("_cost"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val s = spark; import s.implicits._
      val joined = v.crossJoin(broadcast(centers.toDF("centroid_id", "cvec")))
        .select(col("id"), fold(col("vec"), col("cvec")).as("_d2"))
        .groupBy("id").agg(min("_d2").as("_cost"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(joined.keySet == literal.keySet)
      for ((id, c) <- literal)
        assert(java.lang.Double.doubleToLongBits(joined(id)) ==
               java.lang.Double.doubleToLongBits(c),
          s"[$tag] id=$id: join ${joined(id)} != literal $c")
    }
  }

  test("kmeans|| seeding covers skewed clusters the stride sample misses") {
    // 16 true clusters with sizes 1..16 (heavily skewed), cluster
    // membership PSEUDO-SHUFFLED relative to id order — the stride
    // pick (every n/k-th id) lands ~uniformly over ids, so it samples
    // clusters in proportion to their size and misses small ones;
    // kmeans|| chases remaining quantization cost and finds them.
    val dirs = (0 until 16).map { c =>
      Array.tabulate(8)(j => (((c * 8 + j) * 2654435761L % 13).toFloat - 6f) * 8f)
    }
    val members = for {
      c <- 0 until 16
      m <- 0 to c // cluster c has c+1 members -> sizes 1..16
    } yield (c, m)
    // shuffle deterministically: order members by md5 of their index
    val shuffled = members.zipWithIndex
      .sortBy { case (_, i) => md5u(7L, "shuf", i.toLong) }
    val vecs = shuffled.zipWithIndex.map { case (((c, m), _), id) =>
      (id.toLong, dirs(c).zipWithIndex.map { case (x, j) =>
        x + (((m * 31 + j) % 3) - 1).toFloat }) // small integer jitter
    }
    val df = toDF(vecs)
    val clusterOf = vecs.map(_._1).zip(shuffled.map(_._1._1)).toMap
    def coverage(ids: Seq[Long]): Int = ids.map(clusterOf).distinct.size
    val strideIds = Similarity.ivfIndex(df, nCentroids = 16)._1
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    val kmIds = Similarity.ivfSeedsKMeansParallel(df, nCentroids = 16,
        rounds = 3)
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    assert(kmIds.size == 16 && strideIds.size == 16)
    assert(coverage(kmIds) > coverage(strideIds),
      s"kmeans|| must cover more true clusters: km=${coverage(kmIds)} " +
        s"stride=${coverage(strideIds)}")
  }

  test("pqCentroidsKMeans: chunked fold == flat fold at any chunking " +
       "(integer vectors keep every subspace-mean sum exact)") {
    val vecs = genVecs(40, 7501L, dim = 6)
    def run(chunkIds: Long) =
      Similarity.pqCentroidsKMeans(toDF(vecs), m = 2, ksub = 4,
          iterations = 2, chunkIds = chunkIds)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .sortBy(t => (t._1, t._2)).toSeq
    val flat = run(0L)
    assert(flat.size == 2 * 4, "m x ksub codebook rows")
    // non-vacuous: at least one cell moved off its stride seed, so both
    // runs exercised the means step, not just the seed passthrough
    val seed = Similarity.pqCentroids(toDF(vecs), m = 2, ksub = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(flat != seed, "refinement must change at least one centroid")
    assert(run(3L) == flat && run(17L) == flat,
      "per-chunk partial sums are exact on integer entries, so the " +
        "two-level fold must reproduce the flat refinement bit-for-bit")
    assert(run(-1L) == flat, "chunkIds = -1 (auto) — same fold, derived size")
  }
}
