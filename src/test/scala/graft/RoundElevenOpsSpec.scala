package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Semantic laws for the round-11 batch: s21's IVF-cell kNN vote
  * (bounded panel, exact-vote accuracy rebuilt brute-force in plain
  * Scala) and the bounded-scale invariants the round introduced (d14's
  * fixed-size bench suite, d16's witness cap — the caps themselves are
  * pinned in DedupSimilaritySpec/RoundSevenOpsSpec; here we pin the
  * SIZE laws that make the 100 TB story true). */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("s21: panel census + exact-vote accuracy match a plain-Scala rebuild; agreement contract holds") {
    val got = Similarity.s21IvfKnnVote(spark, sf).collect()
      .map(r => r.getAs[Long]("true_label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_exact_correct"),
         r.getAs[Boolean]("agree_ok"))).toMap
    assert(got.nonEmpty)

    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Long)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val holdout = vecs.filter(_._1 % 5 == 0)
    val panel = holdout.sortBy(v => md5hex(v._1.toString))
      .take(Similarity.KnnPanelN)
    val labeled = vecs.filter(_._1 % 5 != 0)
    // the exact vote, brute force: rank all labeled by (round6 cos DESC,
    // nb_id), top KnnVoteK, argmax by (count DESC, label ASC)
    val preds = panel.map { case (qid, qe, trueLabel) =>
      val top = labeled
        .map { case (nid, ne, nl) => (rnd6(cos(qe, ne)), nid, nl) }
        .sortBy { case (c, nid, _) => (-c, nid) }
        .take(Similarity.KnnVoteK)
      val pred = top.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (trueLabel, pred == trueLabel)
    }
    val expect = preds.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.count(_._2).toLong)
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (l, (n, nc)) =>
      val (gn, gnc, _) = got(l)
      assert(gn == n && gnc == nc, s"label $l: got ($gn,$gnc) expect ($n,$nc)")
    }
    // the panel is fixed-size (or the whole holdout when smaller)
    assert(got.values.map(_._1).sum ==
      math.min(Similarity.KnnPanelN, holdout.length).toLong)
    // the agreement boolean is a PANEL-level fact: identical on every row
    assert(got.values.map(_._3).toSet.size == 1)
    assert(got.values.head._3, "IVF vote agreement fell below the floor")
  }

  test("d14: the bench suite is fixed-size and md5-deterministic (O(1) broadcast law)") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id")).as[Long].collect()
    val benchIds = vecs.sortBy(v => md5hex(v.toString))
      .take(Dedup.SemContamBenchN).toSet
    val out = Dedup.d14SemanticDecontam(spark, sf)
      .select(col("vec_id")).as[Long].collect().toSet
    // training side = exact complement of the fixed suite
    assert(out == (vecs.toSet -- benchIds))
    assert(benchIds.size == Dedup.SemContamBenchN)
  }
}
