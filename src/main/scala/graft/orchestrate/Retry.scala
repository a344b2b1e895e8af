package graft.orchestrate

import scala.annotation.tailrec

/** Shared retry policy (max attempts + exponential backoff) used by the
  * batch stage runner and the streaming micro-batch sink — one
  * implementation of the reference's redelivery contract (SDP.py:133-136)
  * so the two paths cannot drift.
  *
  * Job-group cancellation is detected and NEVER retried: relaunching a
  * cancelled Spark job would silently override the user's cancel
  * ([[graft.service.PipelineService.cancel]]).
  */
object Retry {

  final case class Exhausted(attempts: Int, last: Throwable, cancelled: Boolean)

  /** Spark's job/stage cancellation message shapes — deliberately
    * narrow: matching any message merely *containing* "cancel" would
    * misclassify ordinary data errors (e.g. a row mentioning
    * 'order_cancelled') as user cancellations and skip their retries. */
  private val CancellationPattern =
    "(?i)(job \\d+ cancelled|cancellation of (all )?job|job group .* cancelled|stage \\d+ (was )?cancelled)".r

  def isCancellation(e: Throwable): Boolean = {
    var cur = e
    while (cur != null) {
      val m = Option(cur.getMessage).getOrElse("")
      if (CancellationPattern.findFirstIn(m).isDefined) return true
      cur = cur.getCause
    }
    false
  }

  /** Run `body`, retrying up to `maxRetries` total attempts with
    * exponential backoff. `onAttemptFailure(attempt, error)` fires after
    * each failed attempt (journaling hook). */
  def withBackoff[A](maxRetries: Int, backoffMs: Long)
                    (onAttemptFailure: (Int, Throwable) => Unit = (_, _) => ())
                    (body: => A): Either[Exhausted, A] = {
    @tailrec
    def loop(attempt: Int): Either[Exhausted, A] = {
      val result =
        try Right(body)
        catch { case e: Exception => Left(e) }
      result match {
        case Right(a) => Right(a)
        case Left(e) =>
          val n = attempt + 1
          onAttemptFailure(n, e)
          if (isCancellation(e)) Left(Exhausted(n, e, cancelled = true))
          else if (n >= maxRetries) Left(Exhausted(n, e, cancelled = false))
          else {
            Thread.sleep(backoffMs * (1L << (n - 1)))
            loop(n)
          }
      }
    }
    loop(0)
  }
}
