package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FrameOps

/** Property-based invariants (SURVEY.md §5.3). Strategy: generate many
  * random frame-arrays with ScalaCheck, evaluate each property over ONE
  * DataFrame of all samples (one Spark job per property, not one per
  * sample — per-sample jobs would make 100 cases take minutes). */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val genFrame: Gen[Row] = for {
    path <- Gen.oneOf("/a.jpg", "/b.jpg", "/c.jpg", "/d.jpg", "/e.jpg")
    ar <- Gen.choose(1.0, 2.5)
    va <- Gen.option(Gen.choose(0.0, 10.0))
    w <- Gen.option(Gen.choose(100, 4000))
  } yield Row(path, ar, va.map(Double.box).orNull, w.map(Integer.valueOf).orNull)

  private val genRowOfFrames: Gen[(Seq[Row], Seq[String])] = for {
    frames <- Gen.listOfN(8, genFrame).map(_.take(8))
    n <- Gen.choose(0, 8)
    incorrect <- Gen.someOf(Seq("/a.jpg", "/b.jpg", "/c.jpg", "/x.jpg"))
  } yield (frames.take(n), incorrect.toSeq)

  private def samplesDf(count: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("frames", ArrayType(Fixtures.frameType)),
      StructField("incorrect_frames", ArrayType(StringType))))
    val rows = (0 until count).map { i =>
      val (frames, inc) = genRowOfFrames(
        Gen.Parameters.default, Seed(i.toLong)).get
      Row(i, frames, inc)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("pickBackdrop ∈ frames.path ∖ incorrect_frames (or null when none valid)") {
    val df = samplesDf(200).select(
      col("frames"), col("incorrect_frames"),
      FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")).as("pick"))
    val bad = df.filter(col("pick").isNotNull &&
      (!array_contains(transform(col("frames"), _.getField("path")), col("pick")) ||
        array_contains(col("incorrect_frames"), col("pick"))))
    assert(bad.count() == 0)
    val noneValid = df.filter(
      size(FrameOps.validFrames(col("frames"), col("incorrect_frames"))) === 0)
    assert(noneValid.filter(col("pick").isNotNull).count() == 0)
  }

  test("pickBackdrop == Python-model replay on tie/empty-path-dense random frames") {
    // Dedicated coarse generator: few distinct (va, w) values so exact
    // ties are COMMON, plus empty-string and null paths — the two
    // sub-fidelity edges of app/utils/frames.py:12,17 (truthy-path
    // filter; stable reverse sort => first occurrence wins ties).
    val paths = Seq("", null, "/a.jpg", "/b.jpg", "/c.jpg", "/d.jpg")
    def genCase(seed: Long): (Seq[Row], Seq[String]) = {
      val g = for {
        n <- Gen.choose(0, 6)
        frames <- Gen.listOfN(n, for {
          p <- Gen.oneOf(paths)
          va <- Gen.oneOf[Any](null, 0.0, 5.0, 5.0, 9.0)
          w <- Gen.oneOf[Any](null, 100, 1920, 1920)
        } yield Row(p, 1.78, va, w))
        inc <- Gen.someOf(Seq("/a.jpg", "/b.jpg"))
      } yield (frames, inc.toSeq)
      g(Gen.Parameters.default, Seed(seed)).get
    }
    val cases = (0 until 300).map(i => (i, genCase(1000L + i)))
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("frames", ArrayType(Fixtures.frameType)),
      StructField("incorrect_frames", ArrayType(StringType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (i, (f, inc)) => Row(i, f, inc) }),
      schema)
    val got = df.select(col("i"),
        FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")).as("pick"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    // independent replay of pick_backdrop: truthy-path filter, bad-set
    // exclusion, stable sort on (va or 0, w or 0) reverse, head's path
    cases.foreach { case (i, (frames, inc)) =>
      val bad = inc.toSet
      val valid = frames.filter { f =>
        val p = f.getString(0)
        p != null && p.nonEmpty && !bad(p)
      }
      val expected =
        if (valid.isEmpty) None
        else Some(valid.sortBy { f =>
          val va = Option(f.get(2)).map(_.asInstanceOf[Double]).getOrElse(0.0)
          val w = Option(f.get(3)).map(_.asInstanceOf[Int]).getOrElse(0)
          (-va, -w) // stable sortBy: equal keys keep input order = reverse=True
        }.head.getString(0))
      assert(got(i) == expected, s"case $i: frames=$frames inc=$inc")
    }
    // non-vacuity: the generator must actually exercise both edges
    assert(cases.exists { case (_, (f, inc)) =>
      val bad = inc.toSet
      val valid = f.filter(x => Option(x.getString(0)).exists(_.nonEmpty) && !bad(x.getString(0)))
      valid.groupBy(x => (Option(x.get(2)).getOrElse(0.0), Option(x.get(3)).getOrElse(0)))
        .exists(_._2.map(_.getString(0)).distinct.size > 1)
    }, "no case with an exact (va, w) tie across distinct paths")
    assert(cases.exists(_._2._1.exists(f => f.getString(0) == "")),
      "no case with an empty-string path")
  }

  test("normalizeFrames: output paths unique, drawn from input, widths maximal") {
    val df = samplesDf(200).select(col("frames"),
      FrameOps.normalizeFrames(col("frames")).as("norm"))
    val paths = transform(col("norm"), _.getField("path"))
    assert(df.filter(size(array_distinct(paths)) =!= size(paths)).count() == 0)
    assert(df.filter(size(array_except(paths,
      transform(col("frames"), _.getField("path")))) > 0).count() == 0)
    // each kept width == max width among input frames with that path
    val widthOk = df.filter(!forall(col("norm"), n =>
      n.getField("width") === array_max(transform(
        filter(col("frames"), f => f.getField("path") === n.getField("path")),
        f => coalesce(f.getField("width"), lit(0))))))
    assert(widthOk.count() == 0)
  }

  test("normalizeFrames == _normalize_frames Python-model replay on tie/alias/falsy-dense random frames") {
    // Random replay against an independent reimplementation of
    // app/catalog/upsert.py:8-34, on a generator dense in the three
    // fidelity edges: exact width ties (strict `>` keeps the FIRST
    // occurrence), legacy `frame_path` alias fall-through (`path or
    // frame_path` — empty string is falsy), and falsy final paths
    // (dropped). Output ORDER matters too: a Python dict keeps each
    // key's FIRST-insertion position across value updates.
    def genCase(seed: Long): Seq[Row] = {
      val g = for {
        n <- Gen.choose(0, 7)
        frames <- Gen.listOfN(n, for {
          p <- Gen.oneOf(null, "", "/a.jpg", "/a.jpg", "/b.jpg", "/c.jpg")
          fp <- Gen.oneOf(null, "", "/a.jpg", "/l1.jpg", "/l2.jpg")
          ar <- Gen.oneOf[Any](null, 1.78)
          va <- Gen.oneOf[Any](null, 0.0, 5.0, 9.0)
          w <- Gen.oneOf[Any](null, 0, 100, 500, 500)
        } yield Row(p, fp, ar, va, w))
      } yield frames
      g(Gen.Parameters.default, Seed(seed)).get
    }
    val cases = (0 until 300).map(i => (i, genCase(7000L + i)))
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("frames", ArrayType(Fixtures.rawFrameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (i, f) => Row(i, f) }),
      schema)
    val got = df.select(col("i"),
        FrameOps.normalizeFrames(col("frames"), legacyAlias = true).as("norm"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Row](1).map(n =>
        (n.getString(0), Option(n.get(1)), Option(n.get(2)), Option(n.get(3)))))
      .toMap
    // independent model of _normalize_frames
    def model(frames: Seq[Row]): Seq[(String, Option[Any], Option[Any], Option[Any])] = {
      val norm = frames.flatMap { f =>
        val p = Option(f.getString(0)).filter(_.nonEmpty)
          .orElse(Option(f.getString(1)).filter(_.nonEmpty))
        p.map(path => (path, Option(f.get(2)), Option(f.get(3)), Option(f.get(4))))
      }
      val byPath = scala.collection.mutable.LinkedHashMap[String,
        (String, Option[Any], Option[Any], Option[Any])]()
      norm.foreach { f =>
        val wNew = f._4.map(_.asInstanceOf[Int]).getOrElse(0)
        byPath.get(f._1) match {
          case Some(cur) =>
            val wCur = cur._4.map(_.asInstanceOf[Int]).getOrElse(0)
            if (wNew > wCur) byPath.update(f._1, f) // strict >: ties keep FIRST
          case None => byPath.update(f._1, f)
        }
      }
      byPath.values.toSeq
    }
    cases.foreach { case (i, frames) =>
      assert(got(i) == model(frames), s"case $i: frames=$frames")
    }
    // non-vacuity: the generator must actually exercise every edge
    def resolvedPaths(frames: Seq[Row]): Seq[(String, Int)] = frames.flatMap { f =>
      Option(f.getString(0)).filter(_.nonEmpty)
        .orElse(Option(f.getString(1)).filter(_.nonEmpty))
        .map(_ -> Option(f.get(4)).map(_.asInstanceOf[Int]).getOrElse(0))
    }
    assert(cases.exists { case (_, f) =>
      resolvedPaths(f).groupBy(identity).exists(_._2.size > 1)
    }, "no case with an exact (path, width-or-0) tie — first-occurrence keep untested")
    assert(cases.exists(_._2.exists(f =>
      !Option(f.getString(0)).exists(_.nonEmpty) &&
        Option(f.getString(1)).exists(_.nonEmpty))),
      "no case exercising the frame_path alias fall-through")
    assert(cases.exists(_._2.exists(f =>
      !Option(f.getString(0)).exists(_.nonEmpty) &&
        !Option(f.getString(1)).exists(_.nonEmpty))),
      "no case with a falsy final path (dropped entry)")
    assert(cases.exists { case (_, f) =>
      val direct = f.flatMap(x => Option(x.getString(0)).filter(_.nonEmpty)).toSet
      f.exists(x => !Option(x.getString(0)).exists(_.nonEmpty) &&
        Option(x.getString(1)).exists(_.nonEmpty) && direct(x.getString(1)))
    }, "no case where an alias-resolved path collides with a direct path")
  }

  test("addToSet: idempotent, dedups, preserves prior order; pullAll removes") {
    val add = Seq("/b.jpg", "/z.jpg")
    val df = samplesDf(200).select(col("incorrect_frames").as("inc"),
      FrameOps.addToSet(col("incorrect_frames"), add).as("once"))
      .select(col("inc"), col("once"), FrameOps.addToSet(col("once"), add).as("twice"),
        FrameOps.pullAll(col("once"), add).as("pulled"))
    assert(df.filter(col("once") =!= col("twice")).count() == 0) // idempotent
    assert(df.filter(size(array_distinct(col("once"))) =!= size(col("once")))
      .count() == 0) // set semantics
    assert(df.filter(array_contains(col("pulled"), "/z.jpg") ||
      array_contains(col("pulled"), "/b.jpg")).count() == 0) // removed
    // prefix-preservation: original (deduped) elements stay in order
    assert(df.filter(
      slice(col("once"), lit(1), size(array_distinct(col("inc")))) =!=
        array_distinct(col("inc"))).count() == 0)
  }

  test("filterBackdrops: banded aspect ratios, unique paths, sorted by (va,w) desc") {
    val df = samplesDf(200).select(
      FrameOps.filterBackdrops(col("frames")).as("out"))
    val ars = transform(col("out"), f => coalesce(f.getField("aspect_ratio"), lit(0.0)))
    assert(df.filter(!forall(ars, a => a.between(1.5, 2.2))).count() == 0)
    val paths = transform(col("out"), _.getField("path"))
    assert(df.filter(size(array_distinct(paths)) =!= size(paths)).count() == 0)
    val keys = transform(col("out"), f => struct(
      coalesce(f.getField("vote_average"), lit(0.0)).as("va"),
      coalesce(f.getField("width"), lit(0)).as("w")))
    assert(df.filter(keys =!= reverse(array_sort(keys))).count() == 0)
  }

  test("filterBackdrops == fetch_backdrops Python-model replay on tie/edge-dense random frames") {
    // Replays app/tmdb_client.py:193-220 independently: is_valid (ar
    // band on `or 0`, non-negative `va or 0`), falsy-path skip,
    // first-occurrence dedup via `seen`, frame dict stores `va or 0`,
    // stable reverse sort on (va or 0, width or 0). Coarse generator so
    // exact (va, w) ties across distinct paths are common.
    def genCase(seed: Long): Seq[Row] = {
      val g = for {
        n <- Gen.choose(0, 7)
        frames <- Gen.listOfN(n, for {
          p <- Gen.oneOf("", null, "/a.jpg", "/b.jpg", "/c.jpg", "/d.jpg")
          ar <- Gen.oneOf[Any](null, 1.0, 1.8, 1.8, 2.0)
          va <- Gen.oneOf[Any](null, -1.0, 0.0, 5.0, 5.0)
          w <- Gen.oneOf[Any](null, 100, 1920, 1920)
        } yield Row(p, ar, va, w))
      } yield frames
      g(Gen.Parameters.default, Seed(seed)).get
    }
    val cases = (0 until 300).map(i => (i, genCase(2000L + i)))
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("frames", ArrayType(Fixtures.frameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (i, f) => Row(i, f) }), schema)
    val got = df.select(col("i"), FrameOps.filterBackdrops(col("frames")).as("out"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Row](1).map(f =>
        (f.getString(0), Option(f.get(1)), f.getDouble(2), Option(f.get(3)))))
      .toMap
    cases.foreach { case (i, frames) =>
      val seen = scala.collection.mutable.Set[String]()
      val kept = frames.flatMap { f =>
        val ar = Option(f.get(1)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        val va0 = Option(f.get(2)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        val p = f.getString(0)
        if (ar >= 1.5 && ar <= 2.2 && va0 >= 0 &&
            p != null && p.nonEmpty && !seen(p)) {
          seen += p
          Some((p, Option(f.get(1)), va0, Option(f.get(3))))
        } else None
      }
      val expected = kept.sortBy(t =>
        (-t._3, -t._4.map(_.asInstanceOf[Int]).getOrElse(0).toDouble)) // stable
      assert(got(i) == expected, s"case $i: frames=$frames")
    }
    // non-vacuity: ties across distinct paths and falsy paths both occur
    assert(cases.exists { case (_, fs) =>
      fs.filter(f => f.getString(0) != null && f.getString(0).nonEmpty)
        .groupBy(f => (Option(f.get(2)).getOrElse(0.0), Option(f.get(3)).getOrElse(0)))
        .exists(_._2.map(_.getString(0)).distinct.size > 1)
    }, "no exact (va, w) tie across distinct paths generated")
    assert(cases.exists(_._2.exists(f => f.getString(0) == "")),
      "no empty-string path generated")
    assert(cases.exists(_._2.exists(f => f.get(2) == null)),
      "no null vote_average generated")
  }

  // ---- datax operator invariants (round 4) ----

  /** Random word-soup corpus over a SMALL vocabulary — small so that
    * duplicate k-grams actually occur across documents. */
  private def genDocs(n: Int, seed: Long, maxLen: Int): DataFrame = {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gen = for {
      len <- Gen.choose(0, maxLen)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    import org.apache.spark.sql.types.{LongType, StringType}
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = (0 until n).map(i =>
      Row(i.toLong, gen(Gen.Parameters.default, Seed(seed + i)).get))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("dupSpanRemoval: conservation, bounds, determinism, minCount monotone, oversize-k no-op") {
    import graft.datax.{Dedup, TextStats}
    val d = genDocs(80, 7L, maxLen = 12)
    def run(k: Int, minCount: Long) = {
      val r = Dedup.dupSpanRemoval(d, "doc_id", "text", k, minCount)
        .collect().map(x => x.getLong(0) ->
          ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
      Dedup.releaseShingleCaches()
      r
    }
    val r = run(3, 2)
    assert(r.size == 80, "one output row per input doc")
    assert(r.values.forall(x => x._3 >= 0 && x._3 <= x._2),
      "0 <= n_dropped <= n_tokens")
    val expected = d.select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.forall { case (id, x) => x._2 == expected(id) },
      "n_tokens is the input token count")
    assert(run(3, 2) == r, "deterministic across runs")
    val stricter = run(3, 3)
    assert(r.keys.forall(id => stricter(id)._3 <= r(id)._3),
      "raising minCount can only shrink per-doc drops")
    assert(run(20, 2).values.forall(_._3 == 0L),
      "k beyond every doc length drops nothing")
  }

  test("incrementalNearDups == the cross-side slice of minhashNearDups on the union") {
    import graft.datax.Dedup
    // base docs 0..29 plus a near-copy of each at id+31: (i+31) % 3 ==
    // (i+1) % 3, so copies land on the OTHER side of the %3 split for
    // 2/3 of the pairs — cross-side near-dups are guaranteed, not left
    // to random-text luck
    val base = genDocs(30, 11L, maxLen = 12)
    val d = base.union(base.select((col("doc_id") + 31).as("doc_id"),
      concat(col("text"), lit(" extraword")).as("text")))
    val sorted = (p: (Long, Long)) => (math.min(p._1, p._2), math.max(p._1, p._2))
    val inc = Dedup.incrementalNearDups(
        d.filter(col("doc_id") % 3 === 0), d.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", k = 3, numHashes = 16, bands = 8, threshold = 0.3)
      .select("id_a", "id_b")
      .collect().map(x => sorted((x.getLong(0), x.getLong(1)))).toSet
    Dedup.releaseShingleCaches()
    val all = Dedup.minhashNearDups(d, "doc_id", "text",
        k = 3, numHashes = 16, bands = 8, threshold = 0.3)
      .select("id_a", "id_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    Dedup.releaseShingleCaches()
    val cross = all.filter(p => (p._1 % 3 == 0) != (p._2 % 3 == 0))
    assert(inc == cross,
      "the two-sided band join + verify finds EXACTLY the union " +
        "pipeline's cross pairs — no extra, none missing")
    assert(cross.nonEmpty, "vacuous run: vocabulary too large for dups")
  }

  test("snapshotDiff: ids = union of snapshots; status determined by membership + fingerprint") {
    import graft.datax.Curation
    val d = genDocs(60, 23L, maxLen = 8)
    val prev = d.filter(col("doc_id") % 4 =!= 0)
    val cur = d.filter(col("doc_id") % 4 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    val got = Curation.snapshotDiff(prev, cur, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val expect = (0L until 60L).map { id =>
      id -> (if (id % 4 == 0) "added" // absent from prev
        else if (id % 4 == 1) "removed" // absent from cur
        else if (id % 5 == 0) "changed" // ' v2' always changes the tokens
        else "unchanged")
    }.toMap
    assert(got == expect)
  }
}
