package graft.model

/** Core pipeline data model (SURVEY.md §1, §2.10).
  *
  * The reference's pipeline carries a JSON state document between stages
  * (SDP.py:342-421 `result_path` accretion) and journals per-stage status
  * rows to a key-value table with composite key `pipeline_id` + ISO-8601
  * `timestamp` (SDP.py:325-339). Here both become plain case classes: the
  * state document is driver-side (it is metadata about a run, never bulk
  * data), and state rows append to a Parquet journal via
  * [[graft.state.StateLog]].
  */

/** Directory layout mirroring the reference's four buckets + error prefix
  * (SDP.py:70-117 raw/processed/archive/config; SDP.py:198 `errors/`). */
final case class PipelineLayout(root: String) {
  val raw: String       = s"$root/raw"
  val incoming: String  = s"$root/raw/incoming"
  val processed: String = s"$root/processed"
  val archive: String   = s"$root/archive"
  val config: String    = s"$root/config"
  val errors: String    = s"$root/errors"
  val state: String     = s"$root/state"
  val checkpoints: String = s"$root/checkpoints"
}

/** Runtime scalar config, mirroring the reference's SSM parameters
  * (SDP.py:701-720: max-retries=3, batch-size=100, quality-threshold=0.85)
  * and the hard-coded Choice gate 0.8 (SDP.py:413). */
final case class PipelineConfig(
    maxRetries: Int = 3,
    batchSize: Int = 100,
    qualityThreshold: Double = 0.85,
    gateThreshold: Double = 0.8,
    retryBackoffMs: Long = 100L,
    deadlineMs: Long = 2L * 60 * 60 * 1000, // state machine timeout 2h, SDP.py:427
)

object PipelineConfig {
  /** Load from a key-value store (the SSM parameter-store analog,
    * SDP.py:701-720) — keys mirror the reference's parameter names;
    * unknown keys are ignored, missing keys keep defaults. */
  def from(params: Map[String, String]): PipelineConfig = {
    val base = PipelineConfig()
    PipelineConfig(
      maxRetries = params.get("max-retries").map(_.toInt).getOrElse(base.maxRetries),
      batchSize = params.get("batch-size").map(_.toInt).getOrElse(base.batchSize),
      qualityThreshold = params.get("quality-threshold").map(_.toDouble)
        .getOrElse(base.qualityThreshold),
      gateThreshold = params.get("gate-threshold").map(_.toDouble)
        .getOrElse(base.gateThreshold),
      retryBackoffMs = params.get("retry-backoff-ms").map(_.toLong)
        .getOrElse(base.retryBackoffMs),
      deadlineMs = params.get("deadline-ms").map(_.toLong).getOrElse(base.deadlineMs))
  }

  /** Load from a properties file under the config dir (SDP.py:113-117's
    * config bucket). */
  def fromPropertiesFile(path: String): PipelineConfig = {
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    from(props.asScala.toMap)
  }
}

/** One row of the per-stage state journal (SDP.py:325-339: partition key
  * pipeline_id STRING, sort key timestamp STRING i.e. ISO-8601). */
final case class PipelineStateRow(
    pipeline_id: String,
    timestamp: String,
    stage: String,
    status: String,
    detail: String)

object PipelineStatus {
  val Running   = "RUNNING"
  val Succeeded = "SUCCEEDED"
  val Failed    = "FAILED"
  val Cancelled = "CANCELLED"
}

/** Terminal result of a run — the Succeed / Fail states of the reference's
  * state machine (SDP.py:414-417, Fail cause "Data quality score below
  * threshold"). */
sealed trait PipelineOutcome {
  def isSuccess: Boolean = this.isInstanceOf[PipelineOutcome.Succeeded]
}
object PipelineOutcome {
  final case class Succeeded(qualityScore: Double) extends PipelineOutcome
  final case class Failed(cause: String) extends PipelineOutcome
}
