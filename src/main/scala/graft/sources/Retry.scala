package graft.sources

/** ST4 — per-request retry with linear backoff, and the ST3 give-up
  * contract (reference: app/tmdb_client.py:44-136, app/sync_top.py:222-265):
  *
  *  - an HTTP STATUS error is terminal: the reference dead-letters it and
  *    returns the empty page `{}` without retrying;
  *  - network errors (ConnectError/ReadTimeout) and unexpected errors
  *    retry up to `maxAttempts`, sleeping `attempt` seconds between tries
  *    (linear backoff), then give up with the empty page;
  *  - failures are CLASSIFIED — the reference's skipped_network /
  *    skipped_http / skipped_other counters key off the same taxonomy.
  *
  * A bad page must never fail the job: the caller gets `empty` and keeps
  * going. At scale the point is that retries are per-TASK — one flaky
  * page backs off inside its own partition reader while the other 499
  * pages of a year sync proceed in parallel, instead of stalling a
  * sequential fetch loop.
  *
  * `sleep` is injectable so tests pin the backoff schedule without
  * wall-clock waits.
  */
object Retry {

  /** Upper bound on any single server-requested pause (5 min). */
  val MaxPauseMillis: Long = 300000L

  sealed abstract class Kind(val name: String)
  case object Network extends Kind("network")
  case object Http extends Kind("http")
  case object Other extends Kind("other")

  /** The status-code failure of a live transport (`raise_for_status`).
    * Terminal: never retried. */
  final case class HttpStatusError(status: Int, url: String)
      extends RuntimeException(s"HTTP $status $url")

  /** A 429 whose `Retry-After` the caller OPTED to honor (the
    * `honorRetryAfter` source option; default off = reference parity,
    * which treats every status error as terminal — tmdb_client.py:68-86).
    * Retryable: the envelope pauses `retryAfterMillis` (the server's
    * requested delay) instead of the linear backoff; a missing or
    * unparseable header is carried as -1 and falls back to linear
    * backoff. Classified `http` for the give-up counters. */
  final case class RateLimited(url: String, retryAfterMillis: Long)
      extends RuntimeException(
        s"HTTP 429 $url (Retry-After ${retryAfterMillis}ms)")

  /** The reference's except-clause taxonomy: HTTPStatusError | network
    * (IO) | everything else. */
  def classify(e: Throwable): Kind = e match {
    case _: HttpStatusError => Http
    case _: RateLimited => Http
    case _: java.io.IOException => Network
    case _ => Other
  }

  /** What the dead-letter row would carry (ST3): error class, attempts
    * burned, message. */
  final case class GiveUp(kind: String, attempts: Int, error: String)

  /** Run `fetch`; on failure retry with linear backoff (sleep
    * `backoffMillis * attempt` after attempt 1..maxAttempts-1). Http
    * failures and exhausted retries invoke `onGiveUp` and yield `empty`.
    */
  def withRetry[T](maxAttempts: Int = 5, backoffMillis: Long = 1000L,
                   sleep: Long => Unit = Thread.sleep,
                   onGiveUp: GiveUp => Unit = g => System.err.println(s"[tmdb-pages] give-up: $g"))
                  (empty: => T)(fetch: => T): T = {
    var attempt = 1
    while (true) {
      try return fetch
      catch {
        // NonFatal ONLY: an OutOfMemoryError must fail the task, not be
        // retried in a broken JVM and swallowed into an empty page; an
        // InterruptedException (task kill) must propagate promptly, not
        // sit out backoff sleeps
        case scala.util.control.NonFatal(e) =>
          val kind = classify(e)
          // terminal: any http status error EXCEPT an opted-in 429
          val terminal = kind == Http && !e.isInstanceOf[RateLimited]
          if (terminal || attempt >= maxAttempts) {
            onGiveUp(GiveUp(kind.name, attempt, String.valueOf(e.getMessage)))
            return empty
          }
          sleep(e match {
            // server-paced, but CAPPED: a hostile/buggy Retry-After must
            // not pin an executor task thread for hours
            case RateLimited(_, ms) if ms >= 0 => math.min(ms, MaxPauseMillis)
            case _ => backoffMillis * attempt       // linear backoff
          })
          attempt += 1
      }
    }
    empty // unreachable
  }

  /** Test-only fault injection for the offline page reader: register a
    * count of synthetic failures for a path; each read attempt consumes
    * one. Local-mode only (same-JVM static), which is exactly where the
    * spec runs. */
  object Faults {
    private val remaining = new java.util.concurrent.ConcurrentHashMap[String, (Int, Throwable)]()
    def failNext(path: String, times: Int, error: Throwable): Unit =
      remaining.put(path, (times, error))
    def clear(): Unit = remaining.clear()
    def maybeThrow(path: String): Unit = {
      val cur = remaining.get(path)
      if (cur != null && cur._1 > 0) {
        remaining.put(path, (cur._1 - 1, cur._2))
        throw cur._2
      }
    }
  }
}
