package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.Similarity

/** Pins all four [[Similarity.validEmbeddings]] policies on a
  * null/ragged fixture (verdict r13 #1): the library-facing `"fail"`
  * default (including the prune-path negative control behind its
  * "cannot be pruned" claim), `"drop"` ≡ the manual filter, the
  * `"dropWarn"` stderr accounting, and the `"quarantine"` dead-letter
  * sink (verdict r13 #5). */
class ValidEmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // good (1, 2) + every malformed shape: null (3), wrong dim (4),
  // empty (5)
  private def fixture = Seq[(Long, Option[Array[Float]])](
    (1L, Some(Array(1.0f, 2.0f, 3.0f))),
    (2L, Some(Array(4.0f, 5.0f, 6.0f))),
    (3L, None),
    (4L, Some(Array(7.0f, 8.0f))),
    (5L, Some(Array.empty[Float]))
  ).toDF("vec_id", "embedding")

  private def clean = fixture
    .filter($"embedding".isNotNull && size($"embedding") === 3)

  private def messageChain(ex: Throwable): String =
    Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")

  test("fail (default) raises at execution, naming the column and the opt-outs") {
    val ex = intercept[Throwable] {
      Similarity.validEmbeddings(fixture, "embedding", 3).collect()
    }
    val chain = messageChain(ex)
    assert(chain.contains("malformed embedding in `embedding`"),
      s"message must name the column:\n$chain")
    assert(chain.contains("\"drop\"") && chain.contains("\"dropWarn\"")
      && chain.contains("\"quarantine\""),
      s"message must name the opt-out policies:\n$chain")
    // a clean corpus flows through untouched
    assert(Similarity.validEmbeddings(clean, "embedding", 3).count() == 2)
  }

  test("fail survives column pruning: validate -> select id only -> still raises") {
    // The r13 implementation grafted raise_error as a PROJECTED column;
    // Catalyst's ColumnPruning drops unused project expressions, so a
    // caller that never read the vector column downstream lost the
    // guard silently (ADVICE r13). The Filter graft cannot be pruned:
    // this negative control is the empirical pin behind the scaladoc.
    val ex = intercept[Throwable] {
      Similarity.validEmbeddings(fixture, "embedding", 3)
        .select("vec_id").count()
    }
    assert(messageChain(ex).contains("malformed embedding in `embedding`"),
      "the guard must fire even when the vector column is never consumed")
  }

  test("drop is exactly the manual not-null + dim filter") {
    val got = Similarity.validEmbeddings(fixture, "embedding", 3,
        onMalformed = "drop")
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("dropWarn reports the dropped count on stderr; zero drops stay silent") {
    def captureErr(body: => Unit): String = {
      val buf = new ByteArrayOutputStream()
      val old = System.err
      System.setErr(new PrintStream(buf, true))
      try body finally System.setErr(old)
      buf.toString
    }
    val noisy = captureErr {
      val got = Similarity.validEmbeddings(fixture, "embedding", 3,
          onMalformed = "dropWarn")
        .select("vec_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L))
    }
    assert(noisy.contains(
      "validEmbeddings(embedding, dim=3): dropped 3 malformed row(s)"),
      s"expected the dropped-count warning, stderr was:\n$noisy")
    val silent = captureErr {
      assert(Similarity.validEmbeddings(clean, "embedding", 3,
        onMalformed = "dropWarn").count() == 2)
    }
    assert(!silent.contains("dropped"),
      s"zero-drop corpus must not warn, stderr was:\n$silent")
  }

  test("quarantine dead-letters malformed rows with reasons; main path == drop") {
    val dir = Files.createTempDirectory("graft-quarantine").toFile
    val sink = new java.io.File(dir, "malformed").getAbsolutePath
    val got = Similarity.validEmbeddings(fixture, "embedding", 3,
        onMalformed = "quarantine", quarantineDir = Some(sink))
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), "clean rows flow on, identical to drop")
    val reasons = spark.read.parquet(sink)
      .select("vec_id", "malformed_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(
      3L -> "null_vector", 4L -> "ragged_dim_2", 5L -> "ragged_dim_0"))
    // append semantics: a rerun adds to the sink, never clobbers it
    Similarity.validEmbeddings(fixture, "embedding", 3,
      onMalformed = "quarantine", quarantineDir = Some(sink)).count()
    assert(spark.read.parquet(sink).count() == 6)
  }

  test("validEmbeddingsSplit: lazy twin of quarantine — same partition, zero side effects") {
    // round 16: the split face returns (clean, quarantine) pure — the
    // composition-safe alternative to the eager dead-letter write
    val (clean, quarantine) = Similarity.validEmbeddingsSplit(
      fixture, "embedding", 3)
    assert(clean.select("vec_id").as[Long].collect().toSet == Set(1L, 2L),
      "clean side == the drop-mode output")
    val reasons = quarantine.select("vec_id", "malformed_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(
      3L -> "null_vector", 4L -> "ragged_dim_2", 5L -> "ragged_dim_0"),
      s"same reasons as the eager dead-letter, got $reasons")
  }

  test("invalid policy / missing quarantine dir reject loudly") {
    val badPolicy = intercept[IllegalArgumentException] {
      Similarity.validEmbeddings(fixture, "embedding", 3, onMalformed = "ignore")
    }
    assert(badPolicy.getMessage.contains("\"ignore\""))
    val noDir = intercept[IllegalArgumentException] {
      Similarity.validEmbeddings(fixture, "embedding", 3,
        onMalformed = "quarantine")
    }
    assert(noDir.getMessage.contains("quarantineDir"))
  }
}
