package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The two page transports behind [[PageReader]] — one fetch = one page,
  * the unit the reference retrieves per HTTP round-trip
  * (app/tmdb_client.py:44-136).
  *
  *  - [[http]]: live GET with the JDK HttpClient. A non-2xx status
  *    throws [[Retry.HttpStatusError]], which the ST4 envelope treats as
  *    TERMINAL (the reference dead-letters status errors and returns the
  *    empty page `{}` without retrying — tmdb_client.py:68-86; that
  *    includes 429: the reference has no Retry-After handling).
  *    Connect/read timeouts surface as `java.io.IOException` subclasses
  *    → the envelope's `network` class, retried with linear backoff.
  *  - [[file]]: offline fixture directory, one JSON-lines file per page.
  *
  * Both return the page's ITEM nodes; the live variant unwraps the
  * reference's `{"results": [...]}` envelope (tmdb_client.py:293-382
  * consumes `data.get("results", [])`), so a missing/empty `results`
  * key is an empty page, exactly like the reference's `{}` give-up
  * value.
  *
  * One `HttpClient` is shared per JVM (the reference keeps one global
  * httpx.AsyncClient — tmdb_client.py:22-32); the connect timeout
  * mirrors its `Timeout(30.0, connect=10.0)` constant. Per-request
  * read timeout is an option (`requestTimeoutMillis`, default 30 s).
  */
object PageFetch {
  private lazy val mapper = new ObjectMapper()
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def isLive(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** GET one live page; throws HttpStatusError (terminal) on non-2xx,
    * IOException (retryable network) on connect/read failure. With
    * `honorRetryAfter` (source option, default false = reference
    * parity), a 429 throws [[Retry.RateLimited]] instead — retryable,
    * paced by the `Retry-After` header (delta-seconds form; the
    * HTTP-date form and a missing header fall back to the envelope's
    * linear backoff via -1). */
  def http(url: String, requestTimeoutMillis: Long,
           honorRetryAfter: Boolean = false): Seq[JsonNode] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMillis))
      .header("Accept", "application/json")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 429 && honorRetryAfter)
      throw Retry.RateLimited(url, retryAfterMillis(resp))
    if (resp.statusCode() / 100 != 2)
      throw Retry.HttpStatusError(resp.statusCode(), url)
    itemsOf(mapper.readTree(resp.body()))
  }

  /** `Retry-After` delta-seconds -> millis; -1 when absent/unparseable.
    * Negative values are treated as unparseable; huge values are clamped
    * BEFORE the *1000 (a parseable astronomic header must not overflow
    * Long into an instant retry) — the envelope caps the actual pause at
    * [[Retry.MaxPauseMillis]] anyway. */
  private def retryAfterMillis(resp: HttpResponse[String]): Long = {
    val h = resp.headers().firstValue("Retry-After")
    if (!h.isPresent) -1L
    else try {
      val s = h.get.trim.toLong
      if (s < 0) -1L else math.min(s, Retry.MaxPauseMillis / 1000L) * 1000L
    } catch { case _: NumberFormatException => -1L }
  }

  /** One offline fixture page: JSON-lines, one item per line. */
  def file(path: String): Seq[JsonNode] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().filter(_.trim.nonEmpty).map(mapper.readTree).toList
    finally src.close()
  }

  /** Unwrap a page payload to its item nodes: the TMDB `results`
    * envelope, a bare array, or (anything else, e.g. the `{}` error
    * page) no items. */
  private def itemsOf(root: JsonNode): Seq[JsonNode] =
    if (root == null) Seq.empty
    else if (root.has("results") && root.get("results").isArray)
      root.get("results").elements().asScala.toSeq
    else if (root.isArray) root.elements().asScala.toSeq
    else Seq.empty
}
