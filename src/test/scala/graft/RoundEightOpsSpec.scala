package graft

import graft.queries.ControlPlaneQueries
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Semantic laws for the round-8 third batch (s16 JL projection, k05
  * dynamic partition pruning). */
class RoundEightOpsSpec extends SparkSpec {

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
