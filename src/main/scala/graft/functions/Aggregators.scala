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

  /** K-minimum-values distinct sketch (Bar-Yossef et al. '02 / the theta
    * sketch family): keep the K smallest distinct 64-bit hash values of a
    * set; every derived estimate reads off that sample. The capability
    * HLL (q25/g07) structurally lacks is SET ALGEBRA — two KMV sketches
    * union (merge + trim) and, via the theta rule, estimate an
    * INTERSECTION's distinct count, which is how a 100 TB pipeline asks
    * "how many users/docs do sources A and B share" without the exact
    * pairwise distinct join. Buffer is a sorted unsigned-ascending
    * `Array[Long]` ≤ K entries — a few KB per group regardless of
    * cardinality, merged associatively map-side like every Aggregator.
    *
    * Input is the caller's 64-bit hash (`xxhash64` of the key), so the
    * sketch is deterministic across runs and engines hashing the same
    * keys. The hot path is O(1): a value ≥ the current K-th minimum (the
    * common case once warm) is rejected on one unsigned compare. */
  class KmvSketch(val k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    private def unsignedLt(a: Long, b: Long): Boolean =
      java.lang.Long.compareUnsigned(a, b) < 0
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      if (b.length == k && !unsignedLt(h, b(b.length - 1))) return b
      // unsigned binary search for the insert point; equal hash = already
      // sampled (the sketch holds DISTINCT values)
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compareUnsigned(b(mid), h)
        if (c == 0) return b
        else if (c < 0) lo = mid + 1
        else hi = mid
      }
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(b, lo, out, lo + 1, n - lo - 1)
      out
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      KmvSketch.union(a, b, k)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object KmvSketch {
    /** Default sample size: rse ≈ 1/√(K−1) ≈ 3.1 % per estimate. */
    val DefaultK = 1024

    private def unsignedMergeDistinct(a: Array[Long], b: Array[Long],
                                      cap: Int): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, cap))
      var i = 0; var j = 0; var n = 0
      while (n < cap && (i < a.length || j < b.length)) {
        val takeA =
          j >= b.length ||
            (i < a.length && java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
        val v = if (takeA) a(i) else b(j)
        if (takeA) {
          if (j < b.length && a(i) == b(j)) j += 1
          i += 1
        } else j += 1
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    /** Union sketch of two sketches: merged distinct minima, trimmed to K. */
    def union(a: Array[Long], b: Array[Long], k: Int = DefaultK): Array[Long] =
      unsignedMergeDistinct(a, b, k)

    /** Hash position as a uniform double in (0, 1]: the K-th minimum's
      * position is the theta the estimators divide by. */
    private def pos(h: Long): Double =
      ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble

    /** Distinct-count estimate: exact while the sketch is undersampled,
      * (K−1)/pos(K-th min) once full. */
    def estimate(s: Array[Long], k: Int = DefaultK): Double =
      if (s.length < k) s.length.toDouble
      else (k - 1).toDouble / pos(s(k - 1))

    /** Theta-rule intersection estimate: θ = min of the two sketches'
      * sampling thresholds; count the common retained values below θ and
      * scale by 1/θ. Exact when both sets were fully sampled. */
    def intersectEstimate(a: Array[Long], b: Array[Long],
                          k: Int = DefaultK): Double = {
      val thetaA = if (a.length < k) 1.0 else pos(a(k - 1))
      val thetaB = if (b.length < k) 1.0 else pos(b(k - 1))
      val theta = math.min(thetaA, thetaB)
      var i = 0; var j = 0; var c = 0L
      while (i < a.length && j < b.length) {
        val cmp = java.lang.Long.compareUnsigned(a(i), b(j))
        if (cmp == 0) { if (pos(a(i)) <= theta) c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c / theta
    }

    /** Union distinct-count estimate off the merged sketch. */
    def unionEstimate(a: Array[Long], b: Array[Long],
                      k: Int = DefaultK): Double =
      estimate(union(a, b, k), k)
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
