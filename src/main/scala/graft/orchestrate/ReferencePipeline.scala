package graft.orchestrate

import graft.model.{PipelineConfig, PipelineLayout, PipelineOutcome}
import graft.quality.Quality
import graft.quality.Quality.Check
import graft.sink.Sinks
import graft.state.StateLog
import graft.transform.Transform
import graft.validate.SchemaValidator
import graft.validate.SchemaValidator.Rule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's end-to-end batch pipeline (SURVEY §3.1), collapsed to
  * one Spark program:
  *
  * validate → ValidationChoice (invalid → quarantine) → transform →
  * quality → QualityChoice (score > 0.8 → promote, else fail), with
  * per-stage state journaling and the archive copy (SDP.py:268).
  *
  * Gate-before-write ordering (SURVEY §7.4): the processed output is
  * staged under a run-scoped directory and only *promoted* (atomic rename)
  * after the quality gate passes — the transformed data is written once,
  * scored from the staged files, and never recomputed.
  */
object ReferencePipeline {

  final case class Spec(
      rules: Seq[Rule],
      transform: Transform.Step,
      checks: Seq[Check],
      tsCol: String = "ts")

  def run(pipelineId: String, input: DataFrame, spec: Spec,
          layout: PipelineLayout, stateLog: StateLog,
          config: PipelineConfig = PipelineConfig()): PipelineOutcome = {
    val spark = input.sparkSession
    val staging = s"${layout.processed}/.staging/$pipelineId"
    val runner = new PipelineRunner(stateLog, config)

    // The gate's score is computed once, from the staged files, and carried
    // to the Succeed terminal — promote moves those files, so re-reading
    // after promotion would race the rename.
    var gateScore = 0.0
    val flow =
      Flow.Task("validate", SchemaValidator.applyRules(_, spec.rules),
        Flow.Task("route", { validated =>
          val (valid, invalid) = SchemaValidator.route(validated)
          Sinks.quarantine(invalid.drop(SchemaValidator.IsValidCol),
            layout.errors, "validation", pipelineId)
          valid.drop(SchemaValidator.IsValidCol, SchemaValidator.ErrorsCol)
        },
        Flow.Task("archive", { df => Sinks.archive(df, layout.archive, pipelineId); df },
        Flow.Task("transform", spec.transform,
        Flow.Task("stage_output", { df =>
          // OVERWRITE: a retry after a partial write — or a re-run of the
          // same pipeline id whose earlier attempt failed the gate —
          // replaces the stale staging content instead of appending a
          // duplicate copy that promote would then publish.
          Sinks.writePartitioned(df, staging, spec.tsCol,
            org.apache.spark.sql.SaveMode.Overwrite)
          // score what was actually written; an all-invalid batch stages
          // zero files, which must fail the gate, not crash the read-back
          try spark.read.parquet(staging)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
          }
        },
        Flow.Choice("quality_gate",
          { df => gateScore = Quality.batchScore(df, spec.checks)
                  gateScore > config.gateThreshold },
          Flow.Task("promote", { df =>
            Sinks.promoteStaged(spark, staging, layout.processed); df },
            Flow.Succeed(_ => gateScore)),
          Flow.Fail("Data quality score below threshold")))))))

    runner.run(pipelineId, flow, input)
  }

  /** Convenience filter used by tests to inspect quarantined rows. */
  def quarantined(spark: org.apache.spark.sql.SparkSession,
                  layout: PipelineLayout, pipelineId: String): DataFrame =
    Sinks.readQuarantine(spark, layout.errors)
      .filter(col("_error_batch") === pipelineId)
}
