package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.Dedup

/** Property-based invariants for the dedup family (SURVEY.md §5.3),
  * complementing the fixed-corpus oracle rows (d02/d05/d21/d30/d49):
  * random word-soup corpora exercise shapes the testdata generator never
  * produces, and each property is a guarantee the pipeline's DESIGN
  * makes, not a replay of its output.
  *
  * All generators are seeded — every run sees the same corpora. */
class DedupPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Random word-soup docs over a small vocabulary; every doc holds at
    * least `minLen` tokens so k-shingles exist when minLen >= k. */
  private def genDocs(n: Int, seed: Long, minLen: Int, maxLen: Int): DataFrame = {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gen = for {
      len <- Gen.choose(minLen, maxLen)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = (0 until n).map(i =>
      Row(i.toLong, gen(Gen.Parameters.default, Seed(seed + i)).get))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def pairSet(pairs: DataFrame): Set[(Long, Long)] = {
    val s = pairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.releaseShingleCaches()
    s
  }

  test("exact duplicates are ALWAYS caught: identical text => identical " +
       "signatures => same buckets => jaccard 1.0") {
    // 40 base docs plus an exact copy of each at id+100: LSH is
    // probabilistic for near-misses, but identical shingle sets collide
    // in every band by construction — recall 1.0 is a guarantee, not luck
    val base = genDocs(40, 101L, minLen = 4, maxLen = 12)
    val docs = base.union(
      base.select((col("doc_id") + 100).as("doc_id"), col("text")))
    val found = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Dedup.releaseShingleCaches()
    (0L until 40L).foreach { i =>
      val j = found.get((i, i + 100))
      assert(j.contains(1.0),
        s"exact copy pair ($i, ${i + 100}) must be found with jaccard 1.0; got $j")
    }
  }

  test("dedupCorpus is a FIXPOINT: survivors hold no near-dup pair and " +
       "no exact-fingerprint group > 1") {
    // near-dups guaranteed by copies with one extra word (same trick as
    // the incrementalNearDups property); exact dups by verbatim copies
    val base = genDocs(30, 211L, minLen = 4, maxLen = 12)
    val docs = base
      .union(base.select((col("doc_id") + 100).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text")))
      .union(base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 200).as("doc_id"), col("text")))
    val survivors = Dedup.dedupCorpus(docs, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .localCheckpoint(eager = true) // survivors settle before re-running
    Dedup.releaseShingleCaches()
    assert(survivors.count() < docs.count(), "vacuous: nothing was dropped")
    // the pipeline is deterministic, so re-running it on the surviving
    // subset reproduces exactly the pairs among survivors — none may exist
    val residual = pairSet(Dedup.minhashNearDups(survivors, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3))
    assert(residual.isEmpty, s"near-dup pairs survived dedupCorpus: $residual")
    val exactGroups = Dedup.exactDupGroups(survivors, "doc_id", "text")
      .filter(col("n_docs") > 1).count()
    assert(exactGroups == 0, "exact-duplicate group survived dedupCorpus")
  }

  test("dupClusters == brute-force union-find, on BOTH the driver and " +
       "distributed paths") {
    // random edge list over 40 nodes — not a dedup output, so the
    // property covers arbitrary graph shapes (chains, stars, cliques)
    val edgeGen = for {
      a <- Gen.choose(0L, 39L)
      b <- Gen.choose(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val edges = (0 until 60).flatMap(i =>
      edgeGen(Gen.Parameters.default, Seed(307L + i))).distinct
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(edges.map(e => Row(e._1, e._2))),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))

    // reference model: plain union-find in test code
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(rb) = ra
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOf = members.groupBy(find).map { case (r, ms) => r -> ms.min }
    val expect = members.map(m => m -> minOf(find(m))).toMap

    def got(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(Dedup.dupClusters(pairs)) == expect, "driver union-find path")
    // driverMaxPairs=0 forces the distributed min-label loop; plain
    // one-hop propagation needs O(diameter) rounds, so give chains room
    assert(got(Dedup.dupClusters(pairs, maxIterations = 50,
      driverMaxPairs = 0L)) == expect, "distributed label-propagation path")
  }

  test("streaming ingest drive == fold-wise dedupIncrement on RANDOM " +
       "corpora with guaranteed cross-batch plants") {
    // the d52 fold-equivalence beyond the 9-doc fixture: a random corpus
    // with planted near-dups (copy + one word, id+100) and exact dups
    // (verbatim copy, id+200). The pmod(id, 3) split makes every plant
    // land in a DIFFERENT batch than its base (+100 ≡ +1, +200 ≡ +2 mod
    // 3), so each dropped plant exercises the stored cross-batch index —
    // and the drive must equal dedupCorpus on split 0 followed by the
    // oracle-gated dedupIncrement folded over the rest.
    import graft.streaming.{BatchFiles, DedupStream}
    val base = genDocs(40, 601L, minLen = 4, maxLen = 12)
    val docs = base
      .union(base.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100).as("doc_id"),
          concat(col("text"), lit(" extraword")).as("text")))
      .union(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 200).as("doc_id"), col("text")))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedup-stream-prop").toString
    BatchFiles.write(docs, s"$dir/src", "doc_id", splits = 3)
    val streamed = DedupStream.ingestAvailableNow(spark, s"$dir/src",
        s"$dir/index", s"$dir/ckpt", "doc_id", "text",
        k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val splits = (0 until 3).map(i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i))
    val folded = splits.tail.foldLeft(
      Dedup.dedupCorpus(splits.head, "doc_id", "text",
        k = 4, numHashes = 16, bands = 8, threshold = 0.3)) { (index, b) =>
      index.unionByName(
        Dedup.dedupIncrement(b, index, "doc_id", "text",
          k = 4, numHashes = 16, bands = 8, threshold = 0.3))
    }.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    Dedup.releaseShingleCaches()
    assert(streamed == folded,
      "drive survivors must equal the fold-wise dedupIncrement composition")
    // non-vacuity: cross-batch drops really happened — some planted copy
    // (id >= 100) is gone while corpus size shrank overall
    val total = docs.count()
    assert(streamed.size < total, "vacuous: nothing was dropped")
    val plants = docs.filter(col("doc_id") >= 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plants.exists(p => !streamed.contains(p)),
      "no planted cross-batch duplicate was dropped")
  }

  test("corpus invariant by INDUCTION: dedupIncrement keeps the deduped " +
       "index free of near-dup and exact-dup pairs") {
    // index = dedupCorpus(first half); batch = second half, seeded with
    // guaranteed cross-half near-dups (copy + one word) and exact copies
    val half = genDocs(25, 401L, minLen = 4, maxLen = 12)
    val batchRaw = genDocs(25, 501L, minLen = 4, maxLen = 12)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
      .union(half.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" extraword")).as("text")))
      .union(half.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000).as("doc_id"), col("text")))
    val index = Dedup.dedupCorpus(half, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .localCheckpoint(eager = true)
    Dedup.releaseShingleCaches()
    val admitted = Dedup.dedupIncrement(batchRaw, index, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .localCheckpoint(eager = true)
    Dedup.releaseShingleCaches()
    assert(admitted.count() < batchRaw.count(), "vacuous: nothing was rejected")
    val corpus = index.union(admitted)
    val residual = pairSet(Dedup.minhashNearDups(corpus, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3))
    assert(residual.isEmpty,
      s"near-dup pairs in index+admitted after dedupIncrement: $residual")
    val exactGroups = Dedup.exactDupGroups(corpus, "doc_id", "text")
      .filter(col("n_docs") > 1).count()
    assert(exactGroups == 0, "exact-dup group in index+admitted")
  }

  test("leakageSafeSplit: no duplicate pair straddles splits; singletons " +
       "get the naive d22 assignment; straddle-fixes actually occur") {
    import graft.datax.TextStats
    // base soup + exact copies (+500) + near-copies (+1000: one token
    // appended — high jaccard at these lengths): dup pairs of BOTH
    // kinds, plus chains (i ~ i+500 exact, i ~ i+1000 near => all
    // three must share a split)
    val base = genDocs(60, 4242L, minLen = 8, maxLen = 14)
    val docs = base
      .union(base.select((col("doc_id") + 500).as("doc_id"), col("text")))
      .union(base.select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" omega")).as("text")))
      .localCheckpoint(eager = true)
    val split = Dedup.leakageSafeSplit(docs, "doc_id", "text",
        k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      .localCheckpoint(eager = true)
    Dedup.releaseShingleCaches()
    val byId = split.select("doc_id", "rep", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every near-dup or exact-dup pair shares rep AND split
    val near = pairSet(Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 4, numHashes = 16, bands = 8, threshold = 0.3))
    assert(near.nonEmpty, "vacuous: generator produced no near-dup pairs")
    near.foreach { case (a, b) =>
      assert(byId(a)._2 == byId(b)._2,
        s"near-dup pair ($a, $b) straddles splits: ${byId(a)} vs ${byId(b)}")
    }
    (0L until 60L).foreach { i =>
      assert(byId(i)._2 == byId(i + 500)._2, s"exact pair ($i, ${i + 500}) straddles")
      assert(byId(i)._1 == byId(i + 500)._1 && byId(i)._1 == byId(i + 1000)._1,
        s"chain $i/${i + 500}/${i + 1000} not in one group")
    }
    // singletons (docs in no pair) must reduce to the naive d22 split
    val paired = near.flatMap(p => Seq(p._1, p._2)) ++
      (0L until 60L).flatMap(i => Seq(i, i + 500, i + 1000))
    val naive = docs.select(col("doc_id"),
        TextStats.splitName(col("doc_id")).as("naive"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val singletons = byId.keySet -- paired
    singletons.foreach { id =>
      assert(byId(id)._1 == id && byId(id)._2 == naive(id),
        s"singleton $id diverged from the naive split")
    }
    // non-vacuity: at least one duplicate pair whose NAIVE assignments
    // differ — i.e. the leakage the operator exists to fix occurred
    assert((0L until 60L).exists(i =>
      naive(i) != naive(i + 500) || naive(i) != naive(i + 1000)),
      "no pair with differing naive splits — the fix was never exercised")
  }
}
