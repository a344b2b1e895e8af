package graft

import graft.queries.BehaviorQueries
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-9 batch (g32 Kolmogorov–Smirnov, g33 Gini
  * concentration, g34 pair-cosine moments, t26 BPE pair census) — each
  * law rebuilds the operator's contract in plain driver-side Scala over
  * the collected sf0.001 corpus, independent of both the Spark plan and
  * the DuckDB oracle. g34's law is the load-bearing one: the operator
  * computes the N² statistic through the Gram identity, and the rebuild
  * here is the literal brute-force pair loop it replaces.
  */
class RoundNineOpsSpec extends SparkSpec {

  test("g32: D_scaled matches a plain-Scala CDF sweep; D bounded by n_a*n_b") {
    val row = BehaviorQueries.g32KsTest(spark, sf).collect().head
    val (nA, nB, dScaled, dPpm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val cents = Tables.events(spark, sf)
      .filter(col("event_type").isin(
        BehaviorQueries.RankSumA, BehaviorQueries.RankSumB))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (col("event_type") === BehaviorQueries.RankSumA).as("isa"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val nAExp = cents.count(_._2).toLong
    val nBExp = cents.size - nAExp
    var cumA = 0L; var cumB = 0L; var dExp = 0L
    cents.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      cumA += g.count(_._2); cumB += g.count(!_._2)
      dExp = math.max(dExp, math.abs(cumA * nBExp - cumB * nAExp))
    }
    assert(nA == nAExp && nB == nBExp, s"counts ($nA,$nB) vs ($nAExp,$nBExp)")
    assert(dScaled == dExp, s"D_scaled $dScaled vs rebuilt $dExp")
    assert(dScaled <= nA * nB && dPpm == dScaled * 1000000L / (nA * nB))
  }

  test("g33: gini matches the explicit sorted-rank formula per source; 0 <= gini < 1") {
    val got = BehaviorQueries.g33GiniConcentration(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val xs = ds.map(_._2).sorted
      val n = xs.size.toLong
      val s = xs.sum
      val rankMass = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val giniExp =
        if (n == 0 || s == 0) 0L
        else (2 * rankMass - (n + 1) * s) * 1000000L / (n * s)
      val (gn, gs, gg) = got(src)
      assert(gn == n && gs == s && gg == giniExp,
        s"$src: got ($gn,$gs,$gg) expected ($n,$s,$giniExp)")
      assert(gg >= 0L && gg < 1000000L)
    }
    assert(got.keySet == docs.map(_._1).toSet)
  }

  test("g34: the Gram-identity numerator equals the brute-force pair loop") {
    val got = Similarity.g34PairMoments(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0),
        // HALF_UP away-from-zero, matching Spark/DuckDB round() exactly
        // (math.round(-0.5) would round toward +inf instead)
        r.getSeq[Float](1).map(x => new java.math.BigDecimal(
          x.toDouble * Similarity.PairQuant)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue).toArray))
      .toSeq
    vecs.groupBy(_._1).foreach { case (lab, vs) =>
      val qs = vs.map(_._2)
      var num = 0L
      for (i <- qs.indices; j <- qs.indices if i != j)
        num += qs(i).zip(qs(j)).map { case (a, b) => a * b }.sum
      val (n, gotNum, gotPairs) = got(lab)
      assert(n == qs.size.toLong, s"label $lab n")
      assert(gotPairs == n * (n - 1), s"label $lab pairs")
      assert(gotNum == num, s"label $lab: identity $gotNum vs brute force $num")
    }
    assert(got.keySet == vecs.map(_._1).toSet)
  }

  test("t26: pair counts match a plain-Scala census; ranking is (count desc, pair)") {
    val got = TextAnalysis.t26BpePairs(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val words = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(r => r.getString(0).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" "))
      .filter(_.nonEmpty).toSeq
    val counts = words.filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val expTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(TextAnalysis.BpeTopPairs)
    assert(got.map(t => (t._2, t._3)) == expTop,
      s"got=${got.take(5)} expected=${expTop.take(5)}")
    assert(got.map(_._1) == (1 to got.size))
  }
}
