package graft

import graft.queries.{BehaviorQueries, ExtendedQueries}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-8 fourth batch (g29 sequential funnel,
  * g30 Mann–Whitney rank-sum, g31 triangle counting, t25 vocabulary
  * growth, a09 LOCF grid resample) — each law rebuilds the operator's
  * contract in plain driver-side Scala over the collected sf0.001
  * corpus, independent of both the Spark plan and the DuckDB oracle. */
class RoundEightBOpsSpec extends SparkSpec {

  private lazy val events: Seq[(Long, Long, String, java.sql.Timestamp, Double)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getDouble(4))).toSeq

  test("g29: funnel counts match a plain-Scala sequential-chain rebuild and are monotone") {
    val got = BehaviorQueries.g29EventFunnel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // driver-side rebuild: per user, walk the ordered steps
    val byUser = events.groupBy(_._2)
    val steps = BehaviorQueries.FunnelSteps
    var counts = Vector.fill(steps.length)(0L)
    byUser.values.foreach { evs =>
      var prev: Option[java.sql.Timestamp] = None
      var alive = true
      steps.zipWithIndex.foreach { case (st, i) =>
        if (alive) {
          val cand = evs.filter(e => e._3 == st &&
            prev.forall(p => !e._4.before(p)))
          if (cand.isEmpty) alive = false
          else {
            prev = Some(cand.map(_._4).min(Ordering[java.sql.Timestamp]))
            counts = counts.updated(i, counts(i) + 1)
          }
        }
      }
    }
    assert(got.map(_._3) == counts, s"got=$got expected=$counts")
    // monotone non-increasing down the funnel
    got.map(_._3).sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(got.map(_._2) == steps)
  }

  test("g30: U statistics match a plain-Scala midrank rebuild; U2a + U2b = 2·nA·nB") {
    val row = BehaviorQueries.g30RankSum(spark, sf).collect().head
    val (nA, nB, u2a, u2b) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(u2a + u2b == 2 * nA * nB, "U partition law")
    // rebuild 2R_A from scratch with midranks over cents
    val cents = events.filter(e =>
        e._3 == BehaviorQueries.RankSumA || e._3 == BehaviorQueries.RankSumB)
      .map(e => (math.round(e._5 * 100), e._3 == BehaviorQueries.RankSumA))
    val sorted = cents.sortBy(_._1)
    val groups = sorted.groupBy(_._1).toSeq.sortBy(_._1)
    var less = 0L; var r2aExp = 0L
    groups.foreach { case (_, g) =>
      val t = g.size.toLong
      val rank2 = 2 * less + t + 1
      r2aExp += rank2 * g.count(_._2)
      less += t
    }
    val nAExp = cents.count(_._2).toLong
    val u2aExp = r2aExp - nAExp * (nAExp + 1)
    assert(nA == nAExp && u2a == u2aExp, s"u2a=$u2a expected=$u2aExp")
  }

  test("g31: triangle count matches brute-force closure over the edge set") {
    val row = BehaviorQueries.g31Triangles(spark, sf).collect().head
    // pull the edge set through the same extraction g22 uses, then
    // brute-force the triangle closure driver-side
    val ev = Tables.events(spark, sf).select(
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("page"),
      col("ts"), col("event_id"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val es = ev.withColumn("src", lag(col("page"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("page"))
      .select(least(col("src"), col("page")), greatest(col("src"), col("page")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: Long, b: Long) =
      es.contains((math.min(a, b), math.max(a, b)))
    var tri = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if adj(nodes(i), nodes(j))
      k <- (j + 1) until nodes.size
      if adj(nodes(i), nodes(k)) && adj(nodes(j), nodes(k))
    } tri += 1
    assert(row.getAs[Long]("n_triangles") == tri,
      s"got ${row.getAs[Long]("n_triangles")} expected $tri")
    assert(row.getAs[Long]("n_edges") == es.size.toLong)
    assert(row.getAs[Long]("n_nodes") == nodes.size.toLong)
    val wedges = nodes.map(n => es.count(e => e._1 == n || e._2 == n).toLong)
      .map(d => d * (d - 1) / 2).sum
    assert(row.getAs[Long]("n_wedges") == wedges)
  }

  test("t25: final rung equals the full vocabulary; new_terms telescope to it; growth is monotone") {
    val got = TextAnalysis.t25VocabGrowth(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val fullVocab = toks.select(col("term")).distinct().count()
    val fullTokens = toks.count()
    assert(got.last.getAs[Long]("vocab") == fullVocab)
    assert(got.last.getAs[Long]("n_tokens") == fullTokens)
    assert(got.map(_.getAs[Long]("new_terms")).sum == fullVocab,
      "new_terms must telescope to the final vocabulary")
    got.map(_.getAs[Long]("vocab")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "vocabulary growth is monotone")
      case _ =>
    }
    // Heaps-sanity: TTR falls (or holds) as the corpus grows
    got.map(_.getAs[Long]("ttr_ppm")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "type-token ratio is non-increasing")
      case _ =>
    }
  }

  test("a09: one user's filled series matches a plain-Scala carry-forward rebuild; grid accounting holds") {
    val rows = ExtendedQueries.a09LocfResample(spark, sf).collect()
    val span = {
      val ts = events.map(_._4.getTime)
      val h0 = ts.min / 3600000L; val h1 = ts.max / 3600000L
      h1 - h0 + 1
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hours") == span, "every user gets the full grid")
      assert(r.getAs[Long]("n_bar_hours") <= r.getAs[Long]("n_filled_hours"))
      assert(r.getAs[Long]("n_gap_hours") ==
        r.getAs[Long]("n_filled_hours") - r.getAs[Long]("n_bar_hours"))
    }
    // rebuild the busiest purchaser's accounting from raw events
    val purchases = events.filter(_._3 == "purchase")
    val u = purchases.groupBy(_._2).maxBy(g => (g._2.size, g._1))._1
    val h0 = events.map(_._4.getTime).min / 3600000L
    val h1 = events.map(_._4.getTime).max / 3600000L
    val closes = purchases.filter(_._2 == u)
      .groupBy(_._4.getTime / 3600000L)
      .map { case (h, es) =>
        val best = es.maxBy(e => (e._4.getTime, e._1))
        h -> math.round(best._5 * 100)
      }
    var lastSeen: Option[Long] = None
    var filled = 0L; var sum = 0L
    (h0 to h1).foreach { h =>
      closes.get(h).foreach(c => lastSeen = Some(c))
      lastSeen.foreach { c => filled += 1; sum += c }
    }
    val r = rows.find(_.getAs[Long]("user_id") == u).get
    assert(r.getAs[Long]("n_bar_hours") == closes.size.toLong)
    assert(r.getAs[Long]("n_filled_hours") == filled)
    assert(r.getAs[Long]("sum_filled_cents") == sum)
  }
}
