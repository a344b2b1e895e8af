package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY §2.9) — the custom-aggregate extension
  * surface. Aggregators compose with `Dataset.select(agg.toColumn)` and
  * `KeyValueGroupedDataset.agg`, and run with partial (map-side)
  * aggregation in batch AND streaming — the property the reference's
  * per-batch quality metric needs (SURVEY G1).
  */
object Aggregators {

  /** Pass-rate over booleans: the typed form of the quality score — a
    * (passed, total) buffer merged associatively; 0/0 → 0.0. */
  object PassRate extends Aggregator[Boolean, (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), passed: Boolean): (Long, Long) =
      (if (passed) b._1 + 1 else b._1, b._2 + 1)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Numerically-stable streaming variance (Welford/Chan parallel merge):
    * per-column distribution stats for data-quality profiling without a
    * second pass. */
  object VarianceStats extends Aggregator[Double, (Long, Double, Double), (Long, Double, Double)] {
    def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
      val n = b._1 + 1
      val delta = x - b._2
      val mean = b._2 + delta / n
      (n, mean, b._3 + delta * (x - mean))
    }
    def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
      if (a._1 == 0) b
      else if (b._1 == 0) a
      else {
        val n = a._1 + b._1
        val delta = b._2 - a._2
        val mean = a._2 + delta * b._1 / n
        (n, mean, a._3 + b._3 + delta * delta * a._1 * b._1 / n)
      }
    }
    /** (count, mean, variance). */
    def finish(b: (Long, Double, Double)): (Long, Double, Double) =
      (b._1, b._2, if (b._1 < 2) 0.0 else b._3 / b._1)
    def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  }
}
