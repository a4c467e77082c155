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
}
