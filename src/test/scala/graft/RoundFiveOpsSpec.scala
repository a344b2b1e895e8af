package graft

import graft.functions.StringFunctions
import graft.queries.{ExtendedQueries, PipelineQueries}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-5 additions: the binned range join must
  * equal the naive theta-join it replaces, the hash split/mix must be
  * deterministic pure functions of the id, the profiler must agree with
  * direct per-column aggregates, and NFC normalization must compose
  * decomposed sequences exactly. Plan shapes live in [[PlanSpec]]. */
class RoundFiveOpsSpec extends SparkSpec {
  import spark.implicits._

  test("a02: binned range join equals the naive theta-join formulation") {
    val got = ExtendedQueries.a02RangeJoin(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("w_start"))
    val naive = wins.join(ev,
        col("ts") >= col("w_start") &&
          col("ts") < col("w_start") + expr("INTERVAL 30 MINUTE"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_in_window"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("win_id")).collect()
    assert(got.length == naive.length && got.length > 0)
    got.zip(naive).foreach { case (g, n) => assert(g == n, s"$g != $n") }
  }

  test("a02: every window contains at least its own opening event") {
    val rows = ExtendedQueries.a02RangeJoin(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_in_window") >= 1L))
  }

  test("p12: split is a deterministic pure function of doc_id with sane proportions") {
    val a = PipelineQueries.p12TrainSplit(spark, sf).collect()
    val b = PipelineQueries.p12TrainSplit(spark, sf).collect()
    assert(a.sameElements(b))
    val byS = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    // cut points are 10/256 and 20/256; corpus is small so allow wide slack
    assert(byS.getOrElse("train", 0) / n > 0.8, byS)
    assert(byS.getOrElse("test", 0) + byS.getOrElse("val", 0) > 0, byS)
    assert(byS.values.sum == a.length)
  }

  test("p13: mix keeps every doc of the smallest source and never exceeds totals") {
    val rows = PipelineQueries.p13SourceMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val minTotal = rows.map(_.getAs[Long]("n_total")).min
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= total, r.toString)
      // the smallest source gets threshold 256 → keeps everything
      if (total == minTotal) assert(kept == total, r.toString)
    }
  }

  test("g04: profile rows agree with direct aggregates") {
    val prof = PipelineQueries.g04Profile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    assert(prof.keySet == Set("event_id", "event_type", "props", "user_id", "value"))
    prof.values.foreach(r => assert(r.getAs[Long]("n") == n))
    assert(prof("event_id").getAs[Long]("n_null") == 0L)
    assert(prof("event_id").getAs[Long]("n_distinct") == n) // primary key
    val types = ev.select(countDistinct(col("event_type"))).as[Long].head()
    assert(prof("event_type").getAs[Long]("n_distinct") == types)
    assert(prof("value").getAs[Double]("min_num") ==
      ev.select(min(col("value"))).as[Double].head())
    assert(prof("event_type").isNullAt(prof("event_type").fieldIndex("min_num")))
    assert(prof("value").isNullAt(prof("value").fieldIndex("min_s")))
  }

  test("nfc: composes decomposed sequences, fixed-points NFC text, propagates null") {
    val decomposed = "caf" + "e\u0301" // e + combining acute, 5 chars
    val precomposed = "caf\u00e9"      // U+00E9, 4 chars
    val df = Seq(
      Some(decomposed),
      Some(precomposed),
      Some("plain ascii"),
      None).toDF("s")
    val out = df.select(StringFunctions.nfc(col("s")).as("n")).collect()
    assert(out(0).getString(0) == precomposed)
    assert(out(1).getString(0) == precomposed)
    assert(out(2).getString(0) == "plain ascii")
    assert(out(3).isNullAt(0))
  }

  test("nfc: participates in whole-stage codegen and agrees with interpreted eval") {
    val df = spark.range(50).select(
      concat(lit("x"), col("id").cast("string"),
        when(col("id") % 2 === 0, lit("e\u0301")).otherwise(lit("ok"))).as("s"))
    val q = df.select(StringFunctions.nfc(col("s")).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    val gen = q.as[String].collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(StringFunctions.nfc(col("s")).as("n")).as[String].collect().toSeq
      assert(gen == interp)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("q37: sliding windows scatter every event into exactly 4 covering windows") {
    val ev = Tables.events(spark, sf)
    val total = ExtendedQueries.q37SlidingWindow(spark, sf)
      .agg(sum(col("n"))).as[Long].head()
    assert(total == 4 * ev.count())
  }

  test("st07: streamed session windows equal the batch session aggregate under the same watermark") {
    val got = graft.streaming.StreamReplay.st07SessionReplay(spark, sf)
    val feedEnd = lit(graft.streaming.StreamReplay.SessionFeedEnd).cast("timestamp")
    val ev = Tables.events(spark, sf).filter(col("ts") < feedEnd)
      .select(col("user_id"), col("ts"))
    val wm = ev.agg(max(col("ts"))).as[java.sql.Timestamp].head().getTime - 10 * 60 * 1000L
    val batch = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))
      .filter(col("session_end") <= lit(new java.sql.Timestamp(wm)))
      .orderBy(col("user_id"), col("session_start"))
    val g = got.collect()
    val b = batch.collect()
    assert(g.length == b.length && g.length > 0, s"${g.length} vs ${b.length}")
    g.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("t12: normalization shrinks exactly the planted decomposed rows; final char converges") {
    val rows = TextAnalysis.t12Normalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val even = r.getAs[Long]("doc_id") % 2 == 0
      assert(r.getAs[Boolean]("changed") == even, r.toString)
      val shrink = r.getAs[Int]("n_raw") - r.getAs[Int]("n_nfc")
      assert(shrink == (if (even) 1 else 0), r.toString)
      assert(r.getAs[String]("last_char") == "\u00e9", r.toString)
    }
  }
}
