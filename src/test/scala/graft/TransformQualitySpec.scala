package graft

import graft.model.PipelineOutcome
import graft.quality.Quality
import graft.quality.Quality.Check
import graft.transform.Transform
import org.apache.spark.sql.functions._

class TransformQualitySpec extends SparkSpec {
  import spark.implicits._

  test("cleanStrings trims and collapses whitespace") {
    val df = Seq("  a   b  c ", "x").toDF("s")
    val out = Transform.cleanStrings("s")(df).as[String].collect().toSet
    assert(out == Set("a b c", "x"))
  }

  test("dedupByKey keeps the min-tiebreak row per key") {
    val df = Seq((1L, "k1"), (2L, "k1"), (3L, "k2")).toDF("id", "k")
    val out = Transform.dedupByKey(Seq("k"), "id")(df)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("upsert: newer update wins, older update is a no-op, new keys insert") {
    val base = Seq((1L, 5L, "old1"), (2L, 5L, "old2"), (3L, 5L, "old3"))
      .toDF("k", "ver", "payload")
    val updates = Seq(
      (1L, 9L, "new1"),   // newer version → replaces
      (2L, 3L, "stale2"), // older version → no-op (CDC out-of-order)
      (4L, 1L, "new4"))   // unseen key → inserts
      .toDF("k", "ver", "payload")
    val out = Transform.upsert(base, updates, Seq("k"), "ver")
      .select("k", "payload").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "new1", 2L -> "old2", 3L -> "old3", 4L -> "new4"))
  }

  test("scd2Apply equals the global rebuild; intervals chain without gaps") {
    val old = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("k", "ver")
    val nw  = Seq((1L, 30L), (3L, 5L)).toDF("k", "ver")
    val applied = Transform.scd2Apply(Transform.scd2(old, Seq("k"), "ver"),
        nw, Seq("k"), "ver")
      .select("k", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect().toSet
    val rebuilt = Transform.scd2(old.unionByName(nw), Seq("k"), "ver")
      .select("k", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(applied == rebuilt)
    // expected chains: k=1 10→20→30→open, k=2 10→open, k=3 5→open
    assert(applied == Set(
      (1L, 10L, Some(20L)), (1L, 20L, Some(30L)), (1L, 30L, None),
      (2L, 10L, None), (3L, 5L, None)))
  }

  test("enrichOn broadcast-joins and keeps unmatched fact rows") {
    val fact = Seq((1L, 10.0), (9L, 20.0)).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = Transform.enrichOn(dim, "k")(fact)
    assert(out.count() == 2)
    assert(out.filter(col("name").isNull).select("k").as[Long].head() == 9L)
    // the join must be planned as a broadcast, not a shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("derivePartitions emits the reference's year/month/day/hour columns") {
    val df = Seq("2024-03-05 17:30:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val row = Transform.derivePartitions("ts")(df)
      .select("year", "month", "day", "hour").head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3)) == ((2024, 3, 5, 17)))
  }

  test("salted aggregate matches the direct aggregate (skew pattern)") {
    import graft.transform.SaltedAggregate
    val df = Tables.lineitem(spark, sf)
    val direct = df.groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = SaltedAggregate(df, "l_returnflag", saltBuckets = 7,
        partials = Seq(sum("l_quantity").as("s"), count(lit(1)).as("n")),
        merges = Seq(sum("s").as("s"), sum("n").as("n")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted.map(t => (t._1, math.round(t._2 * 100), t._3)) ==
      direct.map(t => (t._1, math.round(t._2 * 100), t._3)))
  }

  test("quarantine replay restores the original input schema") {
    import graft.sink.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString + "/errors"
    val bad = Tables.events(spark, sf).limit(10)
    Sinks.quarantine(bad, dir, "validation", "b1")
    Sinks.quarantine(bad.limit(3), dir, "validation", "b2")
    val replayed = Sinks.replayQuarantine(spark, dir, Some("b1"))
    assert(replayed.count() == 10)
    assert(replayed.columns.sorted.toSeq == bad.columns.sorted.toSeq)
  }

  test("state log compaction preserves history in fewer files") {
    import graft.state.StateLog
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/state"
    val log = new StateLog(spark, dir)
    (1 to 5).foreach(i => log.append(s"p$i", "stage", "SUCCEEDED"))
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    log.compact()
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(log.journal().count() == 5)
    assert(after < before && after == 1)
  }

  test("pipeline config loads from the parameter-store map and properties file") {
    import graft.model.PipelineConfig
    val c = PipelineConfig.from(Map(
      "max-retries" -> "5", "quality-threshold" -> "0.9", "unknown-key" -> "x"))
    assert(c.maxRetries == 5 && c.qualityThreshold == 0.9 && c.batchSize == 100)
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".properties")
    java.nio.file.Files.writeString(f, "batch-size=250\ngate-threshold=0.7\n")
    val fc = PipelineConfig.fromPropertiesFile(f.toString)
    assert(fc.batchSize == 250 && fc.gateThreshold == 0.7 && fc.maxRetries == 3)
  }

  test("quality score is the pass-all fraction; gate at 0.8 is strict") {
    val df = Seq(1.0, 2.0, -1.0, 3.0, -2.0).toDF("v") // 3/5 pass
    val checks = Seq(Check("positive", col("v") > 0))
    val score = Quality.batchScore(df, checks)
    assert(math.abs(score - 0.6) < 1e-12)
    assert(Quality.gate(score) == PipelineOutcome.Failed("Data quality score below threshold"))
    assert(Quality.gate(0.81).isSuccess)
    assert(!Quality.gate(0.8).isSuccess) // strictly-greater, SDP.py:413
  }

  test("quality score on clean input is exactly 1.0 and weighted normalizes") {
    val df = Seq(1.0, 2.0).toDF("v")
    assert(Quality.batchScore(df, Seq(Check("pos", col("v") > 0))) == 1.0)
    val w = df.agg(Quality.weighted(Seq(
      Check("pos", col("v") > 0) -> 3.0,
      Check("small", col("v") < 1.5) -> 1.0)).as("s")).head().getDouble(0)
    assert(math.abs(w - (1.0 * 0.75 + 0.5 * 0.25)) < 1e-12)
  }

  test("expectations: per-check violation counts, null skipping, one-scan suite") {
    import graft.quality.Expectations
    import graft.quality.Expectations._
    val df = Seq(
      (Some(1L), Some("O"), Some(10.0), "1-URGENT"),
      (Some(2L), Some("O"), Some(500.0), "9-BOGUS"),   // range + format violations
      (Some(2L), Some("X"), None, "2-HIGH"),           // dup key + bad status, null price SKIPPED by range
      (None, None, Some(-5.0), "3-MEDIUM")             // null key counted ONLY by not_null; null status skipped
    ).toDF("id", "status", "price", "prio")
    val out = Expectations.check(df, Seq(
        NotNull("id"),
        Unique(Seq("id")),
        InRange("price", 0.0, 100.0),
        OneOf("status", Seq("O", "F")),
        Matches("prio", "^[1-5]-")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("not_null(id)") == ((1L, 4L, false)))
    // null-keyed row EXEMPT (SQL UNIQUE convention): 3 non-null ids
    // (1, 2, 2), 2 distinct -> 1 surplus copy
    assert(out("unique(id)") == ((1L, 4L, false)))
    assert(out("in_range(price,0.0,100.0)") == ((2L, 4L, false))) // 500 and -5; null skipped
    assert(out("one_of(status)") == ((1L, 4L, false)))            // X; null skipped
    assert(out("matches(prio)") == ((1L, 4L, false)))             // 9-BOGUS
    // a clean suite passes
    val clean = Expectations.check(df, Seq(Matches("prio", "^[0-9]")))
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(3))
    // the whole suite is ONE aggregation pass: a single scan of the input
    val plan = Expectations.check(df, Seq(NotNull("id"), InRange("price", 0, 1),
      Matches("prio", "x"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan) // unpivot is explode, not re-scan
    // merge law (the st14 contract): counters over the whole equal the
    // merged per-slice counters, for any split, for mergeable checks
    val mergeable = Seq(NotNull("id"), InRange("price", 0.0, 100.0),
      OneOf("status", Seq("O", "F")), Matches("prio", "^[1-5]-"))
    assert(mergeable.forall(_.mergeable) && !Unique(Seq("id")).mergeable)
    val whole = Expectations.counters(df, mergeable).collect().head.toSeq
    val merged = Expectations.mergeCounters(
      Expectations.counters(df.limit(2), mergeable),
      Expectations.counters(df.exceptAll(df.limit(2)), mergeable))
      .collect().head.toSeq
    assert(whole == merged, s"whole=$whole merged=$merged")
  }
}
