package graft.state

import graft.model.PipelineStatus
import org.apache.spark.sql.streaming.StreamingQueryListener

/** K4: notification/metrics hook — streaming-query lifecycle and
  * per-micro-batch progress journaled into the [[StateLog]], the engine
  * analog of the reference's SNS notifications + CloudWatch metrics
  * (SDP.py:282, :511-576). Dashboards query the same journal the batch
  * pipeline writes (G2, `StateLog.stageMetrics`). */
final class StreamMetricsListener(stateLog: StateLog)
    extends StreamingQueryListener {

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    stateLog.append(name(event.name, event.id.toString), "stream",
      PipelineStatus.Running, s"runId=${event.runId}")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    stateLog.append(name(p.name, p.id.toString), "stream_batch",
      PipelineStatus.Succeeded,
      s"batchId=${p.batchId} rows=${p.numInputRows} " +
        f"rowsPerSec=${Option(p.processedRowsPerSecond).getOrElse(0.0)}%.1f")
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    stateLog.append(name(null, event.id.toString), "stream",
      event.exception.fold(PipelineStatus.Succeeded)(_ => PipelineStatus.Failed),
      event.exception.getOrElse(""))

  private def name(n: String, id: String): String =
    Option(n).filter(_.nonEmpty).getOrElse(s"query-$id")
}
