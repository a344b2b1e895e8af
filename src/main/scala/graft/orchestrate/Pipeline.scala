package graft.orchestrate

import graft.model.{PipelineConfig, PipelineOutcome, PipelineStatus}
import graft.state.StateLog
import org.apache.spark.sql.DataFrame

import scala.annotation.tailrec

/** Orchestration DSL (SURVEY §2.10) — the reference's Step Functions
  * machine re-expressed as a driver-side flow over DataFrames.
  *
  * The reference's "query plan" is a DAG of Lambda tasks with conditional
  * routing (SDP.py:342-421): Task → Choice → Parallel → Succeed/Fail, with
  * per-stage retry/backoff (README:44, max-retries=3 SDP.py:703-707) and a
  * whole-run deadline (2 h, SDP.py:427). In the Spark collapse the bulk
  * data never leaves the cluster — a [[Flow.Task]] transforms a (lazy)
  * DataFrame, so chaining tasks composes one Catalyst plan; only Choice
  * predicates (driver-side scalars like the quality score) force actions.
  */
object Flow {
  sealed trait Node
  /** Run a stage, continue with `next`. `f` is lazy plan composition. */
  final case class Task(name: String, f: DataFrame => DataFrame, next: Node) extends Node
  /** Branch on a driver-side predicate over the current frame (the
    * reference's Choice on the state document, SDP.py:404-418). */
  final case class Choice(name: String, pred: DataFrame => Boolean,
                          ifTrue: Node, ifFalse: Node) extends Node
  /** Scatter the frame over n branch transforms and union the results —
    * the reference's fixed 3-way Parallel (SDP.py:372-390). Spark tasks
    * already parallelize per partition; this exists for API parity and
    * for branches with genuinely different logic. */
  final case class Parallel(name: String, branches: Seq[DataFrame => DataFrame],
                            next: Node) extends Node
  /** Step Functions Map state — DYNAMIC parallelism: derive a bounded
    * item list from the current frame AT RUNTIME (a driver-side scalar
    * read, e.g. the distinct partition keys), run `perItem` once per
    * item, union the results. Differs from [[Parallel]] exactly the way
    * the reference's Map differs from its Parallel: the fan-out is
    * data-driven, not declared in the machine. When items are partition
    * keys, each branch's filter partition-prunes its scan, so the union
    * reads the table once across branches. `maxItems` is a loud guard
    * against unbounded fan-out (a Map over a million keys is a groupBy
    * wearing the wrong API). */
  final case class MapState(name: String, items: DataFrame => Seq[String],
                            perItem: (DataFrame, String) => DataFrame,
                            next: Node, maxItems: Int = 64) extends Node
  /** Terminal success; `score` extracts the reported quality. */
  final case class Succeed(score: DataFrame => Double = _ => 1.0) extends Node
  /** Terminal failure (SDP.py:414-417). */
  final case class Fail(cause: String) extends Node
}

/** Executes a [[Flow]] with per-stage retry + exponential backoff, state
  * journaling, deadline enforcement, and error capture. */
final class PipelineRunner(stateLog: StateLog, config: PipelineConfig = PipelineConfig()) {

  def run(pipelineId: String, flow: Flow.Node, input: DataFrame): PipelineOutcome = {
    val deadline = System.currentTimeMillis() + config.deadlineMs
    stateLog.append(pipelineId, "pipeline", PipelineStatus.Running)
    val outcome = exec(pipelineId, flow, input, deadline)
    outcome match {
      case PipelineOutcome.Succeeded(s) =>
        stateLog.append(pipelineId, "pipeline", PipelineStatus.Succeeded, f"score=$s%.6f")
      case PipelineOutcome.Failed(c) if c.contains(CancelledMarker) =>
        // a cancel must stay CANCELLED — do not overwrite with FAILED
        stateLog.append(pipelineId, "pipeline", PipelineStatus.Cancelled, c)
      case PipelineOutcome.Failed(c) =>
        stateLog.append(pipelineId, "pipeline", PipelineStatus.Failed, c)
    }
    outcome
  }

  private val CancelledMarker = "cancelled"

  @tailrec
  private def exec(id: String, node: Flow.Node, df: DataFrame, deadline: Long): PipelineOutcome = {
    if (System.currentTimeMillis() > deadline)
      return PipelineOutcome.Failed("Pipeline deadline exceeded")
    node match {
      case Flow.Task(name, f, next) =>
        withRetry(id, name)(f(df)) match {
          case Right(out) => exec(id, next, out, deadline)
          case Left(err)  => PipelineOutcome.Failed(s"$name: $err")
        }
      case Flow.Choice(name, pred, t, fb) =>
        withRetry(id, name)(pred(df)) match {
          case Right(b)  => exec(id, if (b) t else fb, df, deadline)
          case Left(err) => PipelineOutcome.Failed(s"$name: $err")
        }
      case Flow.Parallel(name, branches, next) =>
        withRetry(id, name)(branches.map(_(df)).reduce(_ unionByName _)) match {
          case Right(out) => exec(id, next, out, deadline)
          case Left(err)  => PipelineOutcome.Failed(s"$name: $err")
        }
      case Flow.MapState(name, items, perItem, next, maxItems) =>
        // deriving the item list is retryable cluster work; the WIRING
        // guards are not — a 65-items-with-maxItems-64 machine fails the
        // same way on every attempt, so retrying it only burns the
        // backoff budget and journals spurious attempt rows
        withRetry(id, s"$name:items")(items(df)) match {
          case Left(err) => PipelineOutcome.Failed(s"$name: $err")
          case Right(list) if list.isEmpty =>
            PipelineOutcome.Failed(s"$name: empty item list")
          case Right(list) if list.size > maxItems =>
            PipelineOutcome.Failed(
              s"$name: ${list.size} items exceed maxItems=$maxItems")
          case Right(list) =>
            withRetry(id, name)(
              list.map(perItem(df, _)).reduce(_ unionByName _)) match {
              case Right(out) => exec(id, next, out, deadline)
              case Left(err)  => PipelineOutcome.Failed(s"$name: $err")
            }
        }
      case Flow.Succeed(score) =>
        withRetry(id, "succeed")(score(df)) match {
          case Right(s)  => PipelineOutcome.Succeeded(s)
          case Left(err) => PipelineOutcome.Failed(s"succeed: $err")
        }
      case Flow.Fail(cause) => PipelineOutcome.Failed(cause)
    }
  }

  /** ≤ maxRetries attempts with exponential backoff ([[Retry]]),
    * journaling each attempt — the SQS redelivery + DLQ-after-3 contract
    * (SDP.py:133-136) collapsed to a driver-side loop. A job-group
    * cancellation is surfaced immediately, never retried. */
  private def withRetry[A](id: String, stage: String)(body: => A): Either[String, A] = {
    stateLog.append(id, stage, PipelineStatus.Running)
    Retry.withBackoff(config.maxRetries, config.retryBackoffMs)(
      onAttemptFailure = (n, e) =>
        stateLog.append(id, stage, PipelineStatus.Failed,
          s"attempt=$n ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
    )(body) match {
      case Right(out) =>
        stateLog.append(id, stage, PipelineStatus.Succeeded)
        Right(out)
      case Left(Retry.Exhausted(_, e, true)) =>
        Left(s"cancelled: ${Option(e.getMessage).getOrElse("")}")
      case Left(Retry.Exhausted(n, e, false)) =>
        Left(s"failed after $n attempts: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
    }
  }
}
