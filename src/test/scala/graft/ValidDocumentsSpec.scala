package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.{Dedup, TextStats}

/** Pins the text-side entry contract [[TextStats.validDocuments]]
  * (verdict r14 #5): the exact policy twin of validEmbeddings, so both
  * modalities dead-letter alike. The dedup family handles null/empty
  * text SILENTLY (null-safe fingerprints group them) — this is the
  * accounting hook that makes them visible; main-path semantics (what
  * dedupIncrement computes on the clean slice) stay untouched. */
class ValidDocumentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // good (1, 2) + every malformed shape: null (3), empty (4),
  // whitespace-only (5)
  private def fixture = Seq[(Long, Option[String])](
    (1L, Some("the quick brown fox jumps over the lazy dog")),
    (2L, Some("a completely different document about spark")),
    (3L, None),
    (4L, Some("")),
    (5L, Some("   \t "))
  ).toDF("doc_id", "text")

  private def messageChain(ex: Throwable): String =
    Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")

  test("fail (default) raises at execution and survives column pruning") {
    val ex = intercept[Throwable] {
      TextStats.validDocuments(fixture, "text").collect()
    }
    val chain = messageChain(ex)
    assert(chain.contains("malformed document in `text`"),
      s"message must name the column:\n$chain")
    assert(chain.contains("\"quarantine\""),
      s"message must name the opt-outs:\n$chain")
    // prune-path negative control (the validEmbeddings r13 lesson):
    // the guard must fire even when the text column is never consumed
    val ex2 = intercept[Throwable] {
      TextStats.validDocuments(fixture, "text").select("doc_id").count()
    }
    assert(messageChain(ex2).contains("malformed document in `text`"))
    // a clean corpus flows through untouched
    assert(TextStats.validDocuments(fixture.filter($"doc_id" <= 2), "text")
      .count() == 2)
  }

  test("drop == manual filter; dropWarn reports the count on stderr") {
    val got = TextStats.validDocuments(fixture, "text", onMalformed = "drop")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    def captureErr(body: => Unit): String = {
      val buf = new ByteArrayOutputStream()
      val old = System.err
      System.setErr(new PrintStream(buf, true))
      try body finally System.setErr(old)
      buf.toString
    }
    val noisy = captureErr {
      assert(TextStats.validDocuments(fixture, "text",
        onMalformed = "dropWarn").count() == 2)
    }
    assert(noisy.contains("validDocuments(text): dropped 3 malformed row(s)"),
      s"expected the dropped-count warning, stderr was:\n$noisy")
    val silent = captureErr {
      assert(TextStats.validDocuments(fixture.filter($"doc_id" <= 2), "text",
        onMalformed = "dropWarn").count() == 2)
    }
    assert(!silent.contains("dropped"),
      s"zero-drop corpus must not warn, stderr was:\n$silent")
  }

  test("quarantine dead-letters null/empty text with reasons; composes in front of dedupIncrement") {
    val dir = Files.createTempDirectory("graft-doc-quarantine").toFile
    val sink = new java.io.File(dir, "malformed").getAbsolutePath
    val cleanBatch = TextStats.validDocuments(fixture, "text",
      onMalformed = "quarantine", quarantineDir = Some(sink))
    assert(cleanBatch.select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "clean rows flow on, identical to drop")
    val reasons = spark.read.parquet(sink)
      .select("doc_id", "malformed_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(
      3L -> "null_text", 4L -> "empty_text", 5L -> "empty_text"))
    // append semantics (documented call-time side effect): rerun adds
    TextStats.validDocuments(fixture, "text",
      onMalformed = "quarantine", quarantineDir = Some(sink)).count()
    assert(spark.read.parquet(sink).count() == 6)
    // the composed ST3 shape: quarantine the batch, THEN increment —
    // the main path computes exactly dedupIncrement-on-the-clean-slice
    val index = Seq(
      (101L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val survivors = Dedup.dedupIncrement(cleanBatch, index, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L),
      s"doc 1 collides with the index, doc 2 survives; got $survivors")
  }

  test("validDocumentsSplit: lazy twin of quarantine — same partition, zero side effects") {
    // round 16: the eager quarantine's call-time write is a documented
    // footgun; the split face returns both frames pure. Pin: clean ==
    // the drop-mode output, quarantine rows/reasons == what the eager
    // mode writes — and calling/composing repeatedly writes NOTHING.
    val (clean, quarantine) = TextStats.validDocumentsSplit(fixture, "text")
    val (clean2, _) = TextStats.validDocumentsSplit(fixture, "text") // re-call: pure
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(clean2.union(clean).select("doc_id").distinct().count() == 2)
    val reasons = quarantine.select("doc_id", "malformed_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(
      3L -> "null_text", 4L -> "empty_text", 5L -> "empty_text"),
      s"same reasons as the eager dead-letter, got $reasons")
  }

  test("invalid policy / missing quarantine dir reject loudly") {
    val badPolicy = intercept[IllegalArgumentException] {
      TextStats.validDocuments(fixture, "text", onMalformed = "ignore")
    }
    assert(badPolicy.getMessage.contains("\"ignore\""))
    val noDir = intercept[IllegalArgumentException] {
      TextStats.validDocuments(fixture, "text", onMalformed = "quarantine")
    }
    assert(noDir.getMessage.contains("quarantineDir"))
  }
}
