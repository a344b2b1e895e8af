package graft

import graft.queries.{BehaviorQueries, PipelineQueries}
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

  test("t27: OOV curve matches a plain-Scala top-V sweep and is non-increasing in V") {
    val got = TextAnalysis.t27OovLadder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    val words = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(r => r.getString(0).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" "))
      .filter(_.nonEmpty).toSeq
    val counts = words.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, n) => (-n, t) }
    val total = words.size.toLong
    TextAnalysis.OovVocabSizes.zip(got).foreach { case (v, (gv, gn, gin, gppm)) =>
      val top = ranked.take(v.toInt)
      val in = top.map(_._2).sum
      assert(gv == v && gn == top.size.toLong && gin == in,
        s"V=$v got ($gv,$gn,$gin) expected ($v,${top.size},$in)")
      assert(gppm == (total - in) * 1000000L / total)
    }
    got.map(_._4).sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }

  test("g35: micro-rounded sums rebuild exactly; decomposition tracks true Theil") {
    val got = BehaviorQueries.g35Theil(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val nTot = docs.size.toLong
    val sTot = docs.map(_._2).sum
    var cells = 0
    var trueWithinWeighted = 0.0
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val nG = ds.size.toLong
      val sG = ds.map(_._2).sum
      // exact integer rebuild of the micro-rounded cell sums
      val byV = ds.groupBy(_._2).map { case (v, g) => (v, g.size.toLong) }
      val withinExp = byV.map { case (v, c) =>
        new java.math.BigDecimal(
          c.toDouble * v.toDouble / sG.toDouble *
            math.log(v.toDouble * nG.toDouble / sG.toDouble) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }.sum
      val betweenExp = new java.math.BigDecimal(
        sG.toDouble / sTot.toDouble *
          math.log(sG.toDouble * nTot.toDouble / (nG.toDouble * sTot.toDouble)) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      val (gn, gs, gw, gb) = got(src)
      assert(gn == nG && gs == sG, s"$src rollup")
      assert(gw == withinExp, s"$src within: $gw vs $withinExp")
      assert(gb == betweenExp, s"$src between: $gb vs $betweenExp")
      cells += byV.size
      // true (unrounded) within contribution, weighted by s_g/S
      val trueWithin = byV.map { case (v, c) =>
        c.toDouble / nG * (v.toDouble * nG / sG) *
          math.log(v.toDouble * nG / sG)
      }.sum
      trueWithinWeighted += sG.toDouble / sTot * trueWithin
    }
    // decomposition: between + weighted within == the true global Theil,
    // and the emitted micro sums sit within the per-cell rounding budget
    val mu = sTot.toDouble / nTot
    val trueTotal = docs.map { case (_, v) =>
      (v / mu) * math.log(v / mu)
    }.sum / nTot
    val trueBetween = docs.groupBy(_._1).map { case (_, ds) =>
      val nG = ds.size.toDouble; val sG = ds.map(_._2).sum.toDouble
      sG / sTot * math.log(sG * nTot / (nG * sTot))
    }.sum
    assert(math.abs(trueBetween + trueWithinWeighted - trueTotal) < 1e-9,
      "Theil decomposition identity")
    val gotDecomposed = got.values.map(_._4).sum / 1e6 +
      got.map { case (_, (_, gs, gw, _)) => gs.toDouble / sTot * (gw / 1e6) }.sum
    assert(math.abs(gotDecomposed - trueTotal) < (cells + got.size) * 1e-6 + 1e-9,
      s"micro-rounded total $gotDecomposed vs true $trueTotal")
  }

  test("p33: the A-ES sample reproduces from java MD5 exactly") {
    val got = PipelineQueries.p33WeightedReservoir(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Number](2).longValue)).toSeq
    val docs = Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def u48(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val keyed = docs.map { case (id, w) =>
      val u = (2.0 * u48(id) + 1.0) / 562949953421312.0
      (id, w, math.log(u) / w)
    }
    val exp = keyed.sortBy { case (id, _, k) => (-k, id) }
      .take(PipelineQueries.ReservoirK)
    assert(got.map(t => (t._2, t._3)) == exp.map(t => (t._1, t._2)),
      s"got=${got.take(3)} expected=${exp.take(3)}")
    assert(got.map(_._1) == (1 to got.size))
  }

  test("g36: the window identity equals the literal CUSUM recursion") {
    val got = BehaviorQueries.g36Cusum(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    // rebuild the densified hourly series driver-side
    val hours = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
    val lo = hours.keys.min; val hi = hours.keys.max
    val dense = (lo to hi by 3600000L).map(t => hours.getOrElse(t, 0L))
    val nTot = dense.sum; val hh = dense.size.toLong
    val mu = nTot * 1000000L / hh
    val k = mu + mu / BehaviorQueries.CusumSlackDenom
    val hThr = BehaviorQueries.CusumHFactor * mu
    // the literal recursion the operator replaces with two windows
    var sPrev = 0L
    val exp = dense.map { x =>
      sPrev = math.max(0L, sPrev + x * 1000000L - k)
      (sPrev, sPrev > hThr)
    }
    assert(got.size == exp.size, s"${got.size} vs ${exp.size}")
    got.zip(exp).foreach { case ((h, _, s, a), (se, ae)) =>
      assert(s == se && a == ae, s"at $h: ($s,$a) vs ($se,$ae)")
    }
  }

  test("st16 == p33: the stream-maintained reservoir equals the batch A-ES sample") {
    val stream = graft.streaming.StreamReplay.st16ReservoirReplay(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val batch = PipelineQueries.p33WeightedReservoir(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(stream == batch, s"stream=${stream.take(5)} batch=${batch.take(5)}")
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
