package graft

import graft.queries.{ControlPlaneQueries, PipelineQueries}
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-8 third batch (s16 JL projection, k05
  * dynamic partition pruning, p32 PPS sampling, t24 feature hashing). */
class RoundEightOpsSpec extends SparkSpec {

  test("p32: the two-level prefix-sum sample equals the driver-side slot rule") {
    val got = PipelineQueries.p32PpsSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_weight"))).toSeq
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
      .sortBy(_._1)
    val w = docs.map(_._2).sum
    val k = math.max(1L, docs.length.toLong / PipelineQueries.PpsDenom)
    var c = 0L
    val expect = docs.flatMap { case (id, nc) =>
      val prev = c; c += nc
      if (c * k / w > prev * k / w) Some((id, c)) else None
    }.toSeq
    assert(got == expect, "selected set mismatch")
    assert(got.size <= k, s"${got.size} > k=$k")
    // certainty items (w_i > W/k) are always selected
    val sel = got.map(_._1).toSet
    docs.filter { case (_, nc) => nc * k > w }
      .foreach { case (id, _) => assert(sel.contains(id), s"certainty item $id") }
  }

  test("t24: hashed feature mass conserves tokens, docs, and vocabulary") {
    val got = TextAnalysis.t24FeatureHash(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    assert(got.map(_.getAs[Long]("tf")).sum == toks.count())
    assert(got.map(_.getAs[Long]("n_terms")).sum ==
      toks.select(col("term")).distinct().count())
    got.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b < TextAnalysis.FeatureHashBuckets)
      assert(r.getAs[Long]("df") <= r.getAs[Long]("tf"))
    }
  }

  test("s16: JL recall clears the floor, measured independently against s01") {
    val exact = Similarity.s01BruteForceTopK(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.s16JlTopK(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    val recalls = exact
      .join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / Similarity.TopK)
        .as("recall"))
      .collect()
    assert(recalls.length == Similarity.NumQueries)
    recalls.foreach { r =>
      assert(r.getAs[Double]("recall") >= Similarity.JlRecallFloor,
        s"query ${r.get(0)} recall ${r.get(1)}")
    }
    // the registered contract row states the same facts
    val row = Similarity.s16JlRecall(spark, sf).collect()
    assert(row.length == Similarity.NumQueries)
    row.foreach { r =>
      assert(r.getAs[Long]("n_results") == Similarity.TopK.toLong)
      assert(r.getAs[Boolean]("recall_ok"))
    }
  }

  test("k05: DPP fires and the pruned-scan rollup equals the direct computation") {
    val got = ControlPlaneQueries.k05DppPrune(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Boolean]("scan_dpp_pruned")),
      "dynamic partition pruning did not reach the fact scan")
    // independent path: same hot-day rollup straight off the corpus,
    // no partitioned copy, no join
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("event_type"), col("value"))
    val days = ev.groupBy(col("d"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("n_errors"))
      .collect().map(r => r.getAs[java.sql.Date]("d") -> r.getAs[Long]("n_errors"))
    val tot = days.map(_._2).sum
    val hot = days.filter { case (_, n) => n * days.length > tot }.map(_._1).toSet
    val expect = ev.collect()
      .filter(r => hot.contains(r.getAs[java.sql.Date]("d")))
      .groupBy(_.getAs[java.sql.Date]("d"))
      .map { case (d, rows) =>
        d -> (rows.length.toLong,
          rows.map(r => math.round(r.getAs[Double]("value") * 1000000)).sum)
      }
    assert(got.length == expect.size)
    got.foreach { r =>
      val d = r.getAs[java.sql.Date]("event_date")
      val (n, micros) = expect(d)
      assert(r.getAs[Long]("n_events") == n, s"$d n_events")
      assert(r.getAs[Long]("sum_value_micros") == micros, s"$d sum")
    }
  }
}
