package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.Profile

/** Property pin for the one datax family that had none: Profile is a
  * thin wrapper over built-ins, so the model is equally thin — exact
  * per-column counts recomputed independently over the same rows
  * (null-dense generator so the non-null/distinct distinction is
  * actually exercised; NULL must not count as a distinct value). */
class ProfilePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile(exact=true) == independent per-column count model on null-dense random rows") {
    val genRow: Gen[Row] = for {
      a <- Gen.oneOf[Any](null, 1L, 2L, 3L)
      b <- Gen.oneOf[Any](null, null, "x", "y")
      c <- Gen.oneOf[Any](null, 0.5, 1.5)
    } yield Row(a, b, c)
    val rows = (0 until 400).map(i => genRow(Gen.Parameters.default, Seed(7000L + i)).get)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 7), schema)
    val got = Profile.profile(df, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Seq("a", "b", "c").zipWithIndex.foreach { case (name, i) =>
      val vals = rows.map(_.get(i))
      val nonNull = vals.filter(_ != null)
      val expected = (rows.size.toLong, nonNull.size.toLong, nonNull.distinct.size.toLong)
      assert(got(name) == expected, s"column $name: got ${got(name)}, model $expected")
    }
    // non-vacuity: nulls and duplicates both occur in every column
    (0 until 3).foreach { i =>
      val vals = rows.map(_.get(i))
      assert(vals.contains(null) && vals.filter(_ != null).distinct.size < vals.count(_ != null),
        s"generator degenerate for column $i")
    }
    // profileWithHllGate: exact columns match the same model, the claim
    // column certifies the HLL against them (the d19a oracle shape)
    val gated = Profile.profileWithHllGate(df, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getBoolean(4)))
      .toMap
    Seq("a", "b", "c").zipWithIndex.foreach { case (name, i) =>
      val nonNull = rows.map(_.get(i)).filter(_ != null)
      assert(gated(name)._1 ==
        ((rows.size.toLong, nonNull.size.toLong, nonNull.distinct.size.toLong)),
        s"gated column $name exact counts diverge from the model")
      assert(gated(name)._2,
        s"HLL estimate for $name outside 10% of exact at trivial cardinality")
    }
  }

  test("profile survives hostile column names (quotes/backticks/commas in " +
       "the stack() splice)") {
    // review finding: raw names spliced into expr("stack(...)") — a
    // quote broke the parse, and quote+SQL could splice expressions
    val schema = StructType(Seq(StructField("it's, `weird`", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L), Row(2L), Row(null))),
      schema)
    val r = Profile.profile(df, Seq("it's, `weird`")).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "it's, `weird`", "label survives verbatim")
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3)) == ((4L, 3L, 2L)))
    val g = Profile.profileWithHllGate(df, Seq("it's, `weird`")).collect()
    assert(g.head.getLong(3) == 2L && g.head.getBoolean(4))
    // backslashes: the parser treats \ as an escape inside the string
    // literal — unescaped, 'a\qb' mangled the label to "aqb" and a
    // trailing backslash swallowed the closing quote (parse error, or
    // with a second crafted name raw SQL splice)
    for (name <- Seq("a\\qb", "trail\\", "both\\'n`,\\")) {
      val sch = StructType(Seq(StructField(name, LongType)))
      val bdf = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L), Row(1L), Row(null))), sch)
      val br = Profile.profile(bdf, Seq(name)).collect()
      assert(br.head.getString(0) == name, s"label mangled: ${br.head}")
      assert((br.head.getLong(1), br.head.getLong(2), br.head.getLong(3))
        == ((3L, 2L, 1L)), s"counts wrong for $name: ${br.head}")
    }
  }
}
