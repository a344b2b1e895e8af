package graft.service

import graft.model.{PipelineOutcome, PipelineStateRow, PipelineStatus}
import graft.state.StateLog
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}

/** Control-plane API (SURVEY §2.10, §3.3) — the reference's
  * `GET/POST /pipelines`, `GET /pipelines/{id}`, `DELETE /pipelines/{id}`
  * surface (SDP.py:478-485, README:168-191) as a Scala service.
  *
  * `start` runs the supplied pipeline body asynchronously under a
  * Spark job group named by the pipeline id, so `cancel` maps directly to
  * `SparkContext.cancelJobGroup` — in-flight Spark jobs abort, and the
  * state log records CANCELLED. Status/list read the [[StateLog]], whose
  * in-memory front gives read-your-writes immediately after `start`.
  */
final class PipelineService(spark: SparkSession, stateLog: StateLog)(
    implicit ec: ExecutionContext) {

  private val running = new ConcurrentHashMap[String, Future[PipelineOutcome]]()
  private val cancelRequested = ConcurrentHashMap.newKeySet[String]()

  /** Submit a run; returns its id immediately (POST /pipelines).
    *
    * `priority` maps to a FAIR-scheduler pool (the reference's priority
    * queue lane, SDP.py:140-144): with `spark.scheduler.mode=FAIR` and a
    * pool config, high-priority runs get weighted scheduling; without
    * one, the property is inert — routing degrades gracefully. */
  def start(body: String => PipelineOutcome, priority: String = "normal"): String = {
    val id = UUID.randomUUID().toString
    stateLog.append(id, "pipeline", PipelineStatus.Running, s"submitted priority=$priority")
    val fut = Future {
      spark.sparkContext.setJobGroup(id, s"pipeline $id", interruptOnCancel = true)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", priority)
      try body(id)
      finally {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        spark.sparkContext.clearJobGroup()
      }
    }
    val safe = fut.recover { case e =>
      val cause = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      stateLog.append(id, "pipeline", PipelineStatus.Failed, cause)
      PipelineOutcome.Failed(cause)
    }.map { outcome =>
      // cancel() is racy against driver-side code (cancelJobGroup only
      // kills in-flight Spark jobs): if the run completed anyway after a
      // cancel was acknowledged, re-assert CANCELLED as the final state
      // so status(id) agrees with what the caller observed.
      if (cancelRequested.remove(id))
        stateLog.append(id, "pipeline", PipelineStatus.Cancelled,
          s"cancel requested; body finished with ${outcome.getClass.getSimpleName}")
      outcome
    }
    running.put(id, safe)
    id
  }

  /** GET /pipelines/{id}. */
  def status(id: String): Option[PipelineStateRow] = stateLog.currentStatus(id)

  /** GET /pipelines?status=... . */
  def list(statusFilter: Option[String] = None): DataFrame = stateLog.list(statusFilter)

  /** PUT /pipelines/{id} — update run metadata (priority reroute, config
    * tweak) on a known pipeline. The change is journaled as a state row
    * carrying the run's CURRENT status, so `status(id)` reflects the new
    * detail without perturbing lifecycle state. False for unknown ids. */
  def update(id: String, detail: String): Boolean =
    stateLog.appendDetail(id, "pipeline", s"updated: $detail").isDefined

  /** DELETE /pipelines/{id} — cancel in-flight Spark jobs + journal it. */
  def cancel(id: String): Boolean = {
    val wasRunning = Option(running.get(id)).exists(!_.isCompleted)
    if (wasRunning) cancelRequested.add(id)
    spark.sparkContext.cancelJobGroup(id)
    if (wasRunning) stateLog.append(id, "pipeline", PipelineStatus.Cancelled)
    wasRunning
  }

  /** Await a run's outcome (tests / synchronous callers). */
  def await(id: String, timeoutMs: Long = 120000): Option[PipelineOutcome] =
    Option(running.get(id)).map { f =>
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(timeoutMs, "ms"))
    }
}
