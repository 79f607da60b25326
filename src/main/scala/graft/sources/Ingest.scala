package graft.sources

import scala.util.{Failure, Success, Try}

/** SURVEY.md §2.A `src_api_fetch` — the ingest boundary.
  *
  * The reference fetches one entity at a time over HTTP with one retry
  * after a 1 s sleep and a 1.0 s/entity rate limit
  * (`fetch_data.py:134-140,316`). That is a connector concern, not a
  * relational operator: in the engine it lands a bronze snapshot dir that
  * [[graft.pipeline.Refresh]] then processes. The fetch/clock functions
  * are injected so the policy is unit-testable offline (this container
  * has no egress, and the engine never fetches at query time).
  *
  * At scale this runs as a partitioned job: ids are distributed,
  * `fetchAll` runs per partition with a per-partition rate limiter —
  * never a driver-side loop.
  */
object Ingest {

  final case class FetchResult[A](id: String, result: Either[Throwable, A])

  /** One retry after `backoffMs`, mirroring the reference's
    * try/sleep/retry (`fetch_data.py:136-140`). */
  def fetchWithRetry[A](fetch: String => A, backoffMs: Long = 1000,
                        sleep: Long => Unit = Thread.sleep)(id: String): Either[Throwable, A] =
    Try(fetch(id)) match {
      case Success(a) => Right(a)
      case Failure(_) =>
        sleep(backoffMs)
        Try(fetch(id)).toEither
    }

  /** Sequential fetch loop with a rate limit between entities and
    * skip-and-continue error policy (`fetch_data.py:308-316,277-279`).
    * The retry backoff is an independent policy knob from the per-entity
    * rate limit (both default to the reference's 1 s).
    * Returns (successes, failures) — failures feed `join_anti_failures`. */
  def fetchAll[A](ids: Seq[String], fetch: String => A,
                  rateLimitMs: Long = 1000,
                  backoffMs: Long = 1000,
                  sleep: Long => Unit = Thread.sleep): (Seq[(String, A)], Seq[String]) = {
    val results = ids.map { id =>
      val r = FetchResult(id, fetchWithRetry(fetch, backoffMs, sleep)(id))
      sleep(rateLimitMs)
      r
    }
    (results.collect { case FetchResult(id, Right(a)) => id -> a },
      results.collect { case FetchResult(id, Left(_)) => id })
  }
}
