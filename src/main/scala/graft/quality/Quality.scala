package graft.quality

import graft.model.PipelineOutcome
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality scoring + threshold gate (SURVEY §2.4 G1, §2.2 P6).
  *
  * The reference computes a per-batch quality score in [0,1] and routes on
  * `score > 0.8` (SDP.py:413 `number_greater_than("$.quality_result.score",
  * 0.8)`; configured default 0.85, SDP.py:714-719). The score itself is the
  * fraction of rows passing the configured checks — README:237 "Data
  * Quality Score: Average quality score".
  *
  * Implementation is pure Column algebra (`avg(when(...))`), which Spark
  * executes as a partial (map-side) + final aggregate: one tiny shuffle of
  * per-partition sums regardless of data size, and the same expression
  * works in batch, `groupBy`, and streaming-window contexts.
  */
object Quality {

  /** A named quality check; true = the row passes. */
  final case class Check(name: String, predicate: Column)

  /** Fraction-of-rows-passing-all-checks, as an aggregate Column.
    * Null predicate results count as failures. An empty check list is
    * vacuously true — score 1.0 regardless of row count (a constant, not
    * an avg: avg over an EMPTY frame is null and would coalesce to 0.0,
    * failing the gate for an empty micro-batch with nothing to check). */
  def scoreAll(checks: Seq[Check]): Column =
    if (checks.isEmpty) coalesce(max(lit(1.0)), lit(1.0)) // aggregate-positioned constant
    else coalesce(
      avg(when(checks.map(c => coalesce(c.predicate, lit(false)))
          .reduce(_ && _), 1.0)
        .otherwise(0.0)),
      lit(0.0))

  /** Per-check pass rates: one aggregate column per check, named after it. */
  def perCheck(checks: Seq[Check]): Seq[Column] =
    checks.map(c =>
      avg(when(coalesce(c.predicate, lit(false)), 1.0).otherwise(0.0)).as(c.name))

  /** Weighted composite of per-check pass rates; weights need not sum to 1
    * (they are normalized). */
  def weighted(checks: Seq[(Check, Double)]): Column =
    if (checks.isEmpty) scoreAll(Nil)
    else {
      val total = checks.map(_._2).sum
      checks.map { case (c, w) =>
        avg(when(coalesce(c.predicate, lit(false)), 1.0).otherwise(0.0)) * (w / total)
      }.reduce(_ + _)
    }

  /** Compute the batch score on the driver (one aggregate job). */
  def batchScore(df: DataFrame, checks: Seq[Check]): Double =
    df.agg(scoreAll(checks).as("score")).head().getDouble(0)

  /** The QualityChoice gate (SDP.py:411-418): score strictly above the
    * threshold succeeds; otherwise Fail with the reference's cause text. */
  def gate(score: Double, threshold: Double = 0.8): PipelineOutcome =
    if (score > threshold) PipelineOutcome.Succeeded(score)
    else PipelineOutcome.Failed("Data quality score below threshold")
}
