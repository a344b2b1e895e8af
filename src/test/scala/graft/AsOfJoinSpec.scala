package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left timestamp") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "k2", ts("2024-01-01 10:00:00"))  // key with one right row
    ).toDF("id", "k", "ts")
    val right = Seq(
      (100L, "k1", ts("2024-01-01 09:30:00"), 1.0),
      (101L, "k1", ts("2024-01-01 11:00:00"), 2.0),
      (102L, "k1", ts("2024-01-01 12:00:00"), 3.0), // equal ts → inclusive
      (103L, "k2", ts("2024-01-01 08:00:00"), 4.0)
    ).toDF("rid", "k", "ts", "v")
    val out = Joins.asOf(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id"), col("v").as("match_v")),
        tieBreak = col("rid"))
      .select("id", "match_id", "match_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(100L), Some(1.0))))
    assert(out(1) == ((2L, Some(102L), Some(3.0)))) // inclusive on equal ts
    assert(out(2) == ((3L, None, None)))            // nothing before → null
    assert(out(3) == ((4L, Some(103L), Some(4.0))))
  }

  test("ties on (key, ts) resolve to the greatest tieBreak deterministically") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (7L, "k", ts("2024-01-01 09:00:00"), "a"),
      (9L, "k", ts("2024-01-01 09:00:00"), "b"),
      (8L, "k", ts("2024-01-01 09:00:00"), "c")
    ).toDF("rid", "k", "ts", "tag")
    val out = Joins.asOf(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id"), col("tag").as("match_tag")),
        tieBreak = col("rid"))
      .select("match_id", "match_tag").as[(Long, String)].head()
    assert(out == ((9L, "b")))
  }

  test("tolerance law: within-horizon matches survive, stale matches null out") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")), // match 20 min old → kept
      (2L, "k1", ts("2024-01-01 13:00:00")), // match 120 min old → nulled
      (3L, "k2", ts("2024-01-01 10:00:00"))  // no match at all → null
    ).toDF("id", "k", "ts")
    val right = Seq(
      (100L, "k1", ts("2024-01-01 09:40:00"), 1.0),
      (101L, "k1", ts("2024-01-01 11:00:00"), 2.0)
    ).toDF("rid", "k", "ts", "v")
    def run(within: Option[org.apache.spark.sql.Column]) =
      Joins.asOf(left, right, "k",
          leftTs = col("ts"), rightTs = col("ts"),
          payload = Seq(col("rid").as("match_id")),
          tieBreak = col("rid"), within = within)
        .select("id", "match_id")
        .as[(Long, Option[Long])].collect().sortBy(_._1)
    val bounded = run(Some(expr("INTERVAL '30' MINUTE")))
    assert(bounded(0) == ((1L, Some(100L))))
    assert(bounded(1) == ((2L, None))) // 11:00 match is 2h stale → nulled
    assert(bounded(2) == ((3L, None)))
    // law: within = None and within = ∞ agree row-for-row
    val unbounded = run(None)
    val wide = run(Some(expr("INTERVAL '9999' DAY")))
    assert(unbounded.sameElements(wide))
  }

  test("forward tolerance mirrors: matches further ahead than the horizon null out") {
    val left = Seq(
      (1L, "k", ts("2024-01-01 10:00:00")), // next right 10 min ahead → kept
      (2L, "k", ts("2024-01-01 08:00:00"))  // next right 130 min ahead → nulled
    ).toDF("id", "k", "ts")
    val right = Seq((100L, "k", ts("2024-01-01 10:10:00"), 1.0))
      .toDF("rid", "k", "ts", "v")
    val out = Joins.asOfForward(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id")),
        tieBreak = col("rid"), within = Some(expr("INTERVAL '30' MINUTE")))
      .select("id", "match_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(100L))))
    assert(out(1) == ((2L, None)))
  }

  test("non-numeric tieBreak orders by natural sort (no silent long cast)") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("alpha", "k", ts("2024-01-01 09:00:00")),
      ("zeta",  "k", ts("2024-01-01 09:00:00")),
      ("mid",   "k", ts("2024-01-01 09:00:00"))
    ).toDF("rid", "k", "ts")
    val out = Joins.asOf(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id")),
        tieBreak = col("rid"))
      .select("match_id").as[String].head()
    assert(out == "zeta") // greatest string wins — not a null-cast lottery
  }

  test("asOfNearest picks the closer side; equal distance prefers backward") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")), // back 30 min, fwd 10 min → fwd
      (2L, "k1", ts("2024-01-01 09:45:00")), // back 15 min, fwd 25 min → back
      (3L, "k1", ts("2024-01-01 10:40:00")), // equidistant 30 min → backward
      (4L, "k2", ts("2024-01-01 10:00:00")), // only a forward match exists
      (5L, "k3", ts("2024-01-01 10:00:00"))  // no right rows at all → null
    ).toDF("id", "k", "ts")
    val right = Seq(
      (100L, "k1", ts("2024-01-01 09:30:00")),
      (101L, "k1", ts("2024-01-01 10:10:00")),
      (102L, "k1", ts("2024-01-01 11:10:00")),
      (103L, "k2", ts("2024-01-01 10:20:00"))
    ).toDF("rid", "k", "ts")
    val out = Joins.asOfNearest(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id")),
        tieBreak = col("rid"))
      .select("id", "match_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(101L))))
    assert(out(1) == ((2L, Some(100L))))
    assert(out(2) == ((3L, Some(101L)))) // 10:10 and 11:10 equidistant? no: 30 min back vs 30 min fwd → backward 101
    assert(out(3) == ((4L, Some(103L))))
    assert(out(4) == ((5L, None)))
  }

  test("asOfNearest horizon: both-side gaps beyond `within` null out") {
    val left = Seq(
      (1L, "k", ts("2024-01-01 10:00:00")), // back 90 min, fwd 50 min → both out
      (2L, "k", ts("2024-01-01 09:00:00"))  // back 30 min → kept
    ).toDF("id", "k", "ts")
    val right = Seq(
      (100L, "k", ts("2024-01-01 08:30:00")),
      (101L, "k", ts("2024-01-01 10:50:00"))
    ).toDF("rid", "k", "ts")
    val out = Joins.asOfNearest(left, right, "k",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("rid").as("match_id")),
        tieBreak = col("rid"),
        within = Some(expr("INTERVAL '45' MINUTE")))
      .select("id", "match_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0) == ((1L, None)))
    assert(out(1) == ((2L, Some(100L))))
  }

  test("asOfNearest agrees with the argmin-|gap| definition on events data") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("rid"), col("user_id"), col("ts").as("rts"))
    val got = Joins.asOfNearest(l, r, "user_id",
        leftTs = col("ts"), rightTs = col("rts"),
        payload = Seq(col("rid").as("match_id")),
        tieBreak = col("rid"))
      .select("event_id", "match_id")
      .as[(Long, Option[Long])].collect().toMap
    // brute-force oracle: min |gap| in exact microseconds, ties → the
    // backward side, then larger rid backward / smaller rid forward
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val rights = r.as[(Long, Long, Timestamp)].collect()
      .groupBy(_._2).view.mapValues(_.toSeq).toMap
    l.as[(Long, Long, Timestamp)].collect().foreach { case (id, u, t) =>
      val cands = rights.getOrElse(u, Seq.empty)
      val expect =
        if (cands.isEmpty) None
        else {
          val withGap = cands.map { case (rid, _, rt) =>
            (math.abs(us(rt) - us(t)), us(rt) <= us(t), rid) }
          val minGap = withGap.map(_._1).min
          val atMin = withGap.filter(_._1 == minGap)
          val backward = atMin.filter(_._2)
          Some(if (backward.nonEmpty) backward.map(_._3).max
               else atMin.map(_._3).min)
        }
      assert(got.get(id).flatten == expect, s"left row $id")
    }
  }

  test("asOfBracket emits both directed matches; asOfInterpolate blends them") {
    // numeric time axis (micros-style), as the scaladoc requires
    val left = Seq(
      (1L, "k1", 100L), // interior: brackets (50, v=10) and (150, v=30) → 20
      (2L, "k1", 150L), // exact hit on the 150 row → its value verbatim
      (3L, "k1", 10L),  // before all right rows → forward-only extrapolation
      (4L, "k1", 500L), // after all right rows → backward-only extrapolation
      (5L, "k2", 100L)  // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (900L, "k1", 50L, 10.0),
      (901L, "k1", 150L, 30.0),
      (902L, "k1", 300L, 60.0)
    ).toDF("rid", "k", "t", "v")
    val br = Joins.asOfBracket(left, right, "k",
        leftTs = col("t"), rightTs = col("t"),
        value = col("v"), tieBreak = col("rid"), out = "v")
      .select("id", "prev_v", "prev_ts", "next_v", "next_ts")
      .as[(Long, Option[Double], Option[Long], Option[Double], Option[Long])]
      .collect().sortBy(_._1)
    assert(br(0) == ((1L, Some(10.0), Some(50L), Some(30.0), Some(150L))))
    assert(br(1) == ((2L, Some(30.0), Some(150L), Some(30.0), Some(150L)))) // inclusive both ways
    assert(br(2) == ((3L, None, None, Some(10.0), Some(50L))))
    assert(br(3) == ((4L, Some(60.0), Some(300L), None, None)))
    assert(br(4) == ((5L, None, None, None, None)))
    val interp = Joins.asOfInterpolate(left, right, "k",
        leftTs = col("t"), rightTs = col("t"),
        value = col("v"), tieBreak = col("rid"), out = "v")
      .select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(interp(0) == ((1L, Some(20.0)))) // midpoint of 10 and 30
    assert(interp(1) == ((2L, Some(30.0)))) // exact hit, no zero-gap division
    assert(interp(2) == ((3L, Some(10.0)))) // constant extrapolation fwd
    assert(interp(3) == ((4L, Some(60.0)))) // constant extrapolation back
    assert(interp(4) == ((5L, None)))
  }

  test("asOfInterpolate agrees with a plain-Scala rebuild on events data") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("user_id"),
        unix_micros(col("ts")).as("rt"), col("value"))
    val got = Joins.asOfInterpolate(l, r, "user_id",
        leftTs = col("t"), rightTs = col("rt"),
        value = col("value"), tieBreak = col("rid"), out = "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    val rights = r.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._2).view.mapValues(_.toSeq).toMap
    l.as[(Long, Long, Long)].collect().foreach { case (id, u, t) =>
      val cands = rights.getOrElse(u, Seq.empty)
      // backward: greatest rt <= t, ties → greatest rid; forward: least
      // rt >= t, ties → least rid — the operator's documented tie rules
      val back = cands.filter(_._3 <= t)
        .sortBy(c => (c._3, c._1)).lastOption
      val fwd = cands.filter(_._3 >= t)
        .sortBy(c => (c._3, c._1)).headOption
      val expect = (back, fwd) match {
        case (Some(b), Some(f)) if f._3 != b._3 =>
          Some(b._4 + (f._4 - b._4) * ((t - b._3).toDouble / (f._3 - b._3).toDouble))
        case (Some(b), _) => Some(b._4)
        case (_, Some(f)) => Some(f._4)
        case _            => None
      }
      val g = got.get(id).flatten
      assert((g.isEmpty && expect.isEmpty) ||
        (g.nonEmpty && expect.nonEmpty && math.abs(g.get - expect.get) < 1e-9),
        s"left row $id: got $g expect $expect")
    }
  }

  test("temporal join via asOf: containing interval wins; boundaries half-open; gaps and pre-history null") {
    // a non-contiguous SCD2-style dimension: [10,20) -> 100, [20,30) -> 200,
    // a GAP [30,50), then open-from-50 -> 300
    val dim = Seq(
      ("k", 10L, Some(20L), 100L),
      ("k", 20L, Some(30L), 200L),
      ("k", 50L, None, 300L)
    ).toDF("k", "valid_from", "valid_to", "cents")
    val facts = Seq(
      (1L, "k", 5L),   // pre-history -> null
      (2L, "k", 15L),  // inside first -> 100
      (3L, "k", 20L),  // boundary: half-open, second interval -> 200
      (4L, "k", 29L),  // inside second -> 200
      (5L, "k", 35L),  // in the GAP -> null (the defensive valid_to guard)
      (6L, "k", 50L),  // open-row start -> 300
      (7L, "k", 99L)   // deep in the open row -> 300
    ).toDF("id", "k", "ts")
    val out = Joins.asOf(facts, dim, "k",
        leftTs = col("ts"), rightTs = col("valid_from"),
        payload = Seq(col("cents").as("dim_cents"), col("valid_to").as("dim_to")),
        tieBreak = col("valid_from"))
      .select(col("id"),
        when(col("dim_to").isNull || col("ts") < col("dim_to"),
          col("dim_cents")).as("c"))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(None, Some(100L), Some(200L),
      Some(200L), None, Some(300L), Some(300L)), out.mkString(","))
  }

  test("asOf plans a single shuffle on the key - no nested loop join") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq((2L, "k", ts("2024-01-01 09:00:00"), 1.0)).toDF("rid", "k", "ts", "v")
    val plan = Joins.asOf(left, right, "k",
      col("ts"), col("ts"), Seq(col("v").as("mv")), col("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
