package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** ST4 retry/backoff + ST3 give-up semantics (reference:
  * app/tmdb_client.py:44-136, app/sync_top.py:222-265): linear backoff,
  * terminal HTTP status errors, empty-page degradation, error-kind
  * classification, and the per-task wiring inside the paged source. */
class RetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transient failures retry with LINEAR backoff, then succeed") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val got = Retry.withRetry(maxAttempts = 5, backoffMillis = 1000L,
        sleep = sleeps += _)(Seq.empty[Int]) {
      calls += 1
      if (calls < 4) throw new java.io.IOException("flaky")
      Seq(42)
    }
    assert(got == Seq(42) && calls == 4)
    assert(sleeps.toSeq == Seq(1000L, 2000L, 3000L), "sleep(attempt) — linear, not exponential")
  }

  test("exhausted retries give up with the empty page and a classified error") {
    var giveUp: Option[Retry.GiveUp] = None
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Retry.withRetry(maxAttempts = 3, backoffMillis = 10L,
        sleep = sleeps += _, onGiveUp = g => giveUp = Some(g))(Seq.empty[Int]) {
      throw new java.io.IOException("down")
    }
    assert(got.isEmpty)
    assert(sleeps.toSeq == Seq(10L, 20L), "no sleep after the final attempt")
    assert(giveUp.contains(Retry.GiveUp("network", 3, "down")))
  }

  test("an HTTP status error is terminal: no retry, immediate empty page") {
    var calls = 0
    var giveUp: Option[Retry.GiveUp] = None
    val got = Retry.withRetry(maxAttempts = 5, backoffMillis = 1000L,
        sleep = _ => fail("must not sleep"), onGiveUp = g => giveUp = Some(g))(Seq.empty[Int]) {
      calls += 1
      throw Retry.HttpStatusError(404, "/movie/1")
    }
    assert(got.isEmpty && calls == 1)
    assert(giveUp.exists(g => g.kind == "http" && g.attempts == 1))
  }

  test("an opted-in 429 retries after the SERVER-specified pause, not the backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val got = Retry.withRetry(maxAttempts = 4, backoffMillis = 1000L,
        sleep = sleeps += _)(Seq.empty[Int]) {
      calls += 1
      if (calls == 1) throw Retry.RateLimited("/p", 7000L)      // Retry-After: 7
      else if (calls == 2) throw Retry.RateLimited("/p", -1L)    // header missing
      else Seq(1)
    }
    assert(got == Seq(1) && calls == 3)
    assert(sleeps.toSeq == Seq(7000L, 2000L),
      "server pause first; missing header falls back to linear backoff (attempt 2)")
    assert(Retry.classify(Retry.RateLimited("u", 1)).name == "http")
  }

  test("a hostile Retry-After is capped: no multi-hour task-thread stalls") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    Retry.withRetry(maxAttempts = 2, backoffMillis = 10L,
        sleep = sleeps += _)(Seq.empty[Int]) {
      calls += 1
      if (calls == 1) throw Retry.RateLimited("/p", 86400000L) // 24h
      Seq(1)
    }
    assert(sleeps.toSeq == Seq(Retry.MaxPauseMillis), "pause clamps to the 5-min cap")
  }

  test("a persistent opted-in 429 burns the attempt budget, then empties") {
    var giveUp: Option[Retry.GiveUp] = None
    var calls = 0
    val got = Retry.withRetry(maxAttempts = 3, backoffMillis = 10L,
        sleep = _ => (), onGiveUp = g => giveUp = Some(g))(Seq.empty[Int]) {
      calls += 1
      throw Retry.RateLimited("/p", 0L)
    }
    assert(got.isEmpty && calls == 3)
    assert(giveUp.exists(g => g.kind == "http" && g.attempts == 3))
  }

  test("error taxonomy matches the reference's skipped_* counters") {
    assert(Retry.classify(new java.io.IOException).name == "network")
    assert(Retry.classify(new java.net.SocketTimeoutException).name == "network")
    assert(Retry.classify(Retry.HttpStatusError(500, "u")).name == "http")
    assert(Retry.classify(new IllegalStateException).name == "other")
  }

  private def writeFeed(pages: Int, perPage: Int): String = {
    val dir = Files.createTempDirectory("retryfeed").toString
    var id = 0
    for (p <- 1 to pages) {
      val lines = (1 to perPage).map { _ =>
        id += 1
        s"""{"id": $id, "title": "Movie $id", "vote_count": ${1000 - id}, "popularity": ${id / 10.0}}"""
      }
      Files.write(Paths.get(dir, s"page-$p.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("paged source: a transiently-failing page retries INSIDE its task and recovers") {
    val dir = writeFeed(pages = 3, perPage = 4)
    try {
      Retry.Faults.failNext(s"$dir/page-2.json", times = 2,
        new java.io.IOException("transient"))
      val df = spark.read.format("tmdb-pages").option("path", dir)
        .option("backoffMillis", 0).load()
      assert(df.count() == 12, "all rows present after in-task retries")
    } finally Retry.Faults.clear()
  }

  test("paged source: an exhausted page degrades to the empty page; others unaffected") {
    val dir = writeFeed(pages = 3, perPage = 4)
    try {
      Retry.Faults.failNext(s"$dir/page-2.json", times = 99,
        new java.io.IOException("hard down"))
      val df = spark.read.format("tmdb-pages").option("path", dir)
        .option("backoffMillis", 0).option("maxAttempts", 3).load()
      val pages = df.select("_page").as[Int].collect().toSeq
      assert(pages.count(_ == 1) == 4 && pages.count(_ == 3) == 4)
      assert(!pages.contains(2), "poisoned page yields zero rows, job succeeds")
    } finally Retry.Faults.clear()
  }

  test("give-up pages surface as CLASSIFIED custom scan metrics, not just stderr") {
    // review finding: the ST3 give-up record went only to executor
    // stderr. The reader now counts give-ups by the reference's
    // skipped_* taxonomy and reports them through the DSv2 custom
    // metric API (summed into the scan node's SQL metrics).
    import graft.sources.{PagedSource, PageInputPartition, PageReader}
    val dir = writeFeed(pages = 1, perPage = 2)
    try {
      Retry.Faults.failNext(s"$dir/page-1.json", times = 99,
        new java.io.IOException("hard down"))
      val reader = new PageReader(PageInputPartition(1, s"$dir/page-1.json"),
        maxAttempts = 2, backoffMillis = 0)
      assert(!reader.next(), "exhausted page degrades to empty")
      val m = reader.currentMetricsValues().map(t => t.name -> t.value).toMap
      assert(m == Map("giveUpPages_network" -> 1L, "giveUpPages_http" -> 0L,
        "giveUpPages_other" -> 0L), s"got $m")
    } finally Retry.Faults.clear()
    // a healthy page reports zeros
    val ok = new PageReader(PageInputPartition(1, s"$dir/page-1.json"))
    assert(ok.next())
    assert(ok.currentMetricsValues().forall(_.value == 0L))
    // and the scan declares the metrics so the engine aggregates them
    assert(PagedSource.giveUpMetrics().map(_.name()).toSet ==
      Set("giveUpPages_network", "giveUpPages_http", "giveUpPages_other"))
  }
}
