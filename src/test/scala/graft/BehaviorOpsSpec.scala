package graft

import graft.queries.BehaviorQueries
import org.apache.spark.sql.functions._

/** Semantic laws for the behavioral/graph family (g22 PageRank, g23
  * cohort retention, g24 transition matrix, g25 k-anonymity ladder).
  * Each law re-derives the expectation through an INDEPENDENT path —
  * g22's integer recurrence is re-run in pure Scala over the collected
  * edge list, the others check conservation/partition laws against raw
  * corpus counts — so a production-path regression cannot cancel out. */
class BehaviorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("g22: Spark PageRank equals the pure-Scala integer recurrence exactly") {
    val got = BehaviorQueries.g22PageRank(spark, sf).collect()
      .map(r => r.getAs[Long]("page") -> r.getAs[Long]("rank_scaled")).toMap
    // independent path: rebuild edges driver-side from the raw corpus
    val raw = Tables.events(spark, sf)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"),
        unix_micros(col("ts")).as("tss"), col("event_id"))
      .as[(Long, Long, Long, Long)].collect()
    val edges = raw.groupBy(_._1).values.toSeq.flatMap { evs =>
      val pages = evs.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      pages.zip(pages.drop(1))
    }.groupBy(p => p).map { case ((u, v), xs) => (u, v, xs.size.toLong) }.toSeq
    val outw = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> BehaviorQueries.RankScale).toMap
    for (_ <- 1 to BehaviorQueries.PageRankIters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => r(u) * w / outw(u) }.sum
      }
      r = nodes.map(v =>
        v -> (BehaviorQueries.TeleportScaled +
          in.get(v).map(85L * _ / 100L).getOrElse(0L))).toMap
    }
    assert(got == r, "rank fixed-point mismatch")
    assert(got.values.forall(_ >= BehaviorQueries.TeleportScaled))
  }

  test("g23: offset-0 cohort users partition the user base; events conserve") {
    val cells = BehaviorQueries.g23CohortRetention(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(cells.map(_.getAs[Long]("n_events")).sum == ev.count())
    val atZero = cells.filter(_.getAs[Long]("offset_week") == 0L)
    assert(atZero.map(_.getAs[Long]("n_users")).sum ==
      ev.select(col("user_id")).distinct().count())
    assert(cells.forall(_.getAs[Long]("offset_week") >= 0L))
  }

  test("g24: transition counts conserve and row probabilities floor-sum to 1e6") {
    val rows = BehaviorQueries.g24EventTransitions(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    // every event except each user's first contributes exactly one pair
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, rs) =>
      val ppm = rs.map(_.getAs[Long]("p_ppm")).sum
      // floor division loses < 1 ppm per cell
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length, s"row $p ppm $ppm")
    }
  }

  test("g26: chi-square equals the pure-Scala contingency computation") {
    val got = BehaviorQueries.g26ChiSquare(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), expr("weekday(ts) + 1").as("dow"))
      .as[(String, Int)].collect()
    val cells = raw.groupBy(identity(_)).view.mapValues(_.length.toLong).toMap
    val rowTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colTot = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = raw.length.toLong
    val partMicros = cells.toSeq.map { case ((t, w), o) =>
      val e = (rowTot(t) * colTot(w)).toDouble / n
      t -> math.round(math.pow(o - e, 2) / e * 1000000)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = math.rint(partMicros.values.sum / 1000000.0 * 1e6) / 1e6
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n") == rowTot(t), s"$t n")
      assert(math.abs(r.getAs[Double]("chi2_part") - partMicros(t) / 1e6) < 1e-9, s"$t part")
      assert(math.abs(r.getAs[Double]("chi2_total") - total) < 1e-9)
      assert(r.getAs[Long]("dof") == 24L)
      assert(r.getAs[Boolean]("is_dependent") ==
        (r.getAs[Double]("chi2_total") > BehaviorQueries.ChiSqCrit24))
    }
  }

  test("g27: ACF equals the textbook estimator on the driver-side dense series") {
    val got = BehaviorQueries.g27Acf(spark, sf).collect()
    val byHour = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h")).agg(count(lit(1)).as("n"))
      .select(unix_micros(col("h")).as("hu"), col("n"))
      .as[(Long, Long)].collect().toMap
    val lo = byHour.keys.min; val hi = byHour.keys.max
    val series = (lo to hi by 3600000000L).map(h => byHour.getOrElse(h, 0L).toDouble)
    val n = series.length
    val mu = series.sum / n
    val den = series.map(x => (x - mu) * (x - mu)).sum
    val expect = BehaviorQueries.AcfLags.map { k =>
      k -> series.dropRight(k).zip(series.drop(k))
        .map { case (x, y) => (x - mu) * (y - mu) }.sum / den
    }.toMap
    assert(got.length == BehaviorQueries.AcfLags.length)
    got.foreach { r =>
      val k = r.getAs[Int]("lag")
      assert(r.getAs[Long]("n_pairs") == (n - k).toLong, s"lag $k pairs")
      assert(math.abs(r.getAs[Double]("acf") - expect(k)) < 1e-5,
        s"lag $k acf ${r.getAs[Double]("acf")} vs ${expect(k)}")
    }
  }

  test("g28: Benford audit equals the driver-side digit census, all nine bins present") {
    val got = BehaviorQueries.g28Benford(spark, sf).collect()
    assert(got.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val cents = Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"))
      .as[Long].collect().filter(_ > 0)
    val census = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.length.toLong)
    val total = cents.length.toLong
    val devs = got.map { r =>
      val d = r.getAs[Int]("digit")
      assert(r.getAs[Long]("n") == census.getOrElse(d, 0L), s"digit $d n")
      val freq = r.getAs[Long]("n") * 1000000L / total
      assert(r.getAs[Long]("freq_ppm") == freq, s"digit $d freq")
      val exp = math.round(math.log10(1 + 1.0 / d) * 1000000)
      assert(r.getAs[Long]("expected_ppm") == exp, s"digit $d expected")
      math.abs(freq - exp)
    }
    val mad = devs.sum / 9
    got.foreach { r =>
      assert(r.getAs[Long]("mad_ppm") == mad)
      assert(r.getAs[Boolean]("conforms") == (mad < BehaviorQueries.BenfordMadPpm))
    }
  }

  test("g25: ladder is a coarsening — classes shrink, min class grows, k eventually holds") {
    val rows = BehaviorQueries.g25KAnonymity(spark, sf).collect()
      .sortBy(_.getAs[Long]("width"))
    assert(rows.map(_.getAs[Long]("width")).toSeq == BehaviorQueries.KAnonWidths)
    val nClasses = rows.map(_.getAs[Long]("n_classes"))
    val minClass = rows.map(_.getAs[Long]("min_class_size"))
    // width w2 = 10×w1 buckets are unions of w1 buckets (x div 100 =
    // (x div 10) div 10), so coarsening is monotone on both metrics
    assert(nClasses.zip(nClasses.tail).forall { case (a, b) => b <= a })
    assert(minClass.zip(minClass.tail).forall { case (a, b) => b >= a })
    rows.foreach { r =>
      assert(r.getAs[Boolean]("achieves_k") ==
        (r.getAs[Long]("min_class_size") >= BehaviorQueries.KAnonK))
    }
  }
}
