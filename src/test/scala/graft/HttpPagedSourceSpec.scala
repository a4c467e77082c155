package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Live HTTP transport of the paged source against a local stub server:
  * the reference's status/network taxonomy (app/tmdb_client.py:44-136) —
  * 2xx returns the results envelope; any non-2xx (429 and 500 alike) is
  * TERMINAL, dead-lettered without a retry; timeouts/connect failures
  * retry with linear backoff then give up empty. One poisoned page never
  * fails the scan. */
class HttpPagedSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  // per-path request counters: the retry-vs-terminal assertions
  private val hits = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()

  private def count(path: String): Int =
    Option(hits.get(path)).map(_.get()).getOrElse(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit =
    try {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    } catch { case _: java.io.IOException => () } // client already gone (timed out)

  private def pageOf(ex: HttpExchange): Int =
    ex.getRequestURI.getQuery.split("&").collectFirst {
      case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
    }.getOrElse(1)

  private def resultsBody(page: Int, perPage: Int): String = {
    val items = (1 to perPage).map { i =>
      val id = (page - 1) * perPage + i
      s"""{"id": $id, "title": "Movie $id", "vote_count": ${1000 - id}, "popularity": ${id / 10.0}}"""
    }
    s"""{"page": $page, "results": [${items.mkString(",")}], "total_pages": 99}"""
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      hits.computeIfAbsent(path, _ => new AtomicInteger()).incrementAndGet()
      path match {
        case "/ok" => respond(ex, 200, resultsBody(pageOf(ex), 4))
        case "/mixed" =>
          val p = pageOf(ex)
          if (p == 2) respond(ex, 500, """{"status_message": "boom"}""")
          else respond(ex, 200, resultsBody(p, 4))
        case "/throttled" => respond(ex, 429, """{"status_message": "rate limited"}""")
        case "/limited" =>
          // first hit rate-limits WITH a Retry-After header; then recovers
          if (count("/limited") == 1) {
            ex.getResponseHeaders.add("Retry-After", "0")
            respond(ex, 429, """{"status_message": "rate limited"}""")
          } else respond(ex, 200, resultsBody(pageOf(ex), 4))
        case "/limited-hard" =>
          ex.getResponseHeaders.add("Retry-After", "0")
          respond(ex, 429, """{"status_message": "rate limited"}""")
        case "/error500" => respond(ex, 500, """{"status_message": "boom"}""")
        case "/slow" =>
          Thread.sleep(600) // beyond the request timeout below
          respond(ex, 200, resultsBody(pageOf(ex), 4))
        case "/flaky" =>
          // first two hits time out, third succeeds: the retry recovery path
          if (count("/flaky") <= 2) Thread.sleep(600)
          respond(ex, 200, resultsBody(pageOf(ex), 4))
        case _ => respond(ex, 404, "{}")
      }
    })
    // cached pool: handlers that sleep past the client timeout must not
    // starve later requests into spurious queue-side timeouts
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def read(path: String, maxPages: Int, extra: Map[String, String] = Map.empty) = {
    val base = spark.read.format("tmdb-pages")
      .option("url", s"http://127.0.0.1:$port$path?api_key=k&page={page}")
      .option("maxPages", maxPages)
      .option("backoffMillis", 1) // pin the schedule; no wall-clock waits
      .option("requestTimeoutMillis", 200)
      .option("maxAttempts", 3)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("live pages: results envelope unwrapped, page provenance, partition per page") {
    val df = read("/ok", maxPages = 3)
    assert(df.count() == 12)
    assert(df.select("_page").distinct().as[Int].collect().sorted.toSeq == (1 to 3))
    assert(df.rdd.getNumPartitions == 3)
    assert(df.filter($"_page" === 2).select("id").as[Long].collect().sorted.toSeq == (5L to 8L))
  }

  test("HTTP status errors are terminal: no retry, page degrades to empty, scan survives") {
    // ONE action: every extra action re-scans the source and re-fetches
    val pages = read("/mixed", maxPages = 3).select("_page").as[Int].collect()
    // page 2 is the 500: its 4 rows are missing, the others intact
    assert(pages.length == 8)
    assert(pages.distinct.sorted.toSeq == Seq(1, 3))
    // terminal means exactly one request per page — 3 pages, 3 hits
    assert(count("/mixed") == 3, "status errors must not be retried")
  }

  test("429 follows the same terminal path as 500 (reference has no Retry-After)") {
    val df = read("/throttled", maxPages = 2)
    assert(df.count() == 0)
    assert(count("/throttled") == 2, "one request per page, no retry on 429")
  }

  test("honorRetryAfter: a 429 with Retry-After is retried after the delay and recovers") {
    val df = read("/limited", maxPages = 1,
      extra = Map("honorRetryAfter" -> "true"))
    assert(df.count() == 4, "the page recovers on the paced retry")
    assert(count("/limited") == 2, "one 429, one successful retry")
  }

  test("honorRetryAfter: a persistent 429 burns the attempt budget, then empties") {
    val df = read("/limited-hard", maxPages = 1,
      extra = Map("honorRetryAfter" -> "true"))
    assert(df.count() == 0)
    assert(count("/limited-hard") == 3, "retried up to maxAttempts, unlike the terminal default")
  }

  test("timeouts are network errors: retried maxAttempts times, then empty") {
    val df = read("/slow", maxPages = 1)
    assert(df.count() == 0)
    assert(count("/slow") == 3, "timeout should burn all 3 attempts")
  }

  test("a flaky page recovers within the retry budget") {
    val df = read("/flaky", maxPages = 1)
    assert(df.count() == 4)
    assert(count("/flaky") == 3, "two timeouts then the successful attempt")
  }

  test("limit pushdown caps planned live pages") {
    val df = read("/ok", maxPages = 10, extra = Map("pageSize" -> "4")).limit(6)
    assert(df.count() == 6)
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.contains("limitPages=2"), s"scan description missing page cap:\n$planned")
  }

  test("live mode requires an explicit page window and a {page} placeholder") {
    val noWindow = intercept[Exception] {
      spark.read.format("tmdb-pages")
        .option("url", s"http://127.0.0.1:$port/ok?page={page}").load().count()
    }
    assert(noWindow.getMessage.contains("maxPages"))
    val noPlaceholder = intercept[Exception] {
      spark.read.format("tmdb-pages")
        .option("url", s"http://127.0.0.1:$port/ok").option("maxPages", 2).load().count()
    }
    assert(noPlaceholder.getMessage.contains("{page}"))
  }
}
