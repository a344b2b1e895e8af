package graft

import graft.queries.PipelineQueries
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the second batch of round-5 additions: chunking
  * geometry (t13), snapshot-diff category partition (p14), per-source cap
  * dominance (p15), histogram conservation (g05), and the streamed
  * interval join's batch equivalence (st08). Plan shapes live in
  * [[PlanSpec]]. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("t13: chunk count, sizes, and first-chunk fingerprint follow from the geometry") {
    val C = TextAnalysis.ChunkSize
    val S = TextAnalysis.ChunkStride
    val chunks = TextAnalysis.t13Chunk(spark, sf).collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rows) =>
      val n = math.max(rows.head.getAs[Int]("n_tokens"), 1)
      // starts are 1, 1+S, … ≤ n  →  floor((n−1)/S)+1 chunks
      assert(rows.length == (n - 1) / S + 1, rows.head.toString)
      rows.foreach { r =>
        val start = r.getAs[Long]("chunk_idx").toInt * S + 1
        val want = math.min(C, n - start + 1)
        assert(r.getAs[Int]("n_chunk_tokens") == want, r.toString)
      }
    }
    // first chunk's fingerprint = md5 of the first min(C, n) tokens,
    // derived independently of the generator pipeline
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, C))).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    byDoc.foreach { case (id, rows) =>
      val first = rows.minBy(_.getAs[Long]("chunk_idx"))
      assert(first.getAs[String]("chunk_fp") == direct(id), s"doc $id")
    }
  }

  test("t13: overlapping chunks agree on the shared tokens (stride < size)") {
    // stride 48 < size 64 ⇒ chunk i's last 16 tokens = chunk i+1's first 16
    // (when both are full); verified on one long synthetic doc through
    // the PRODUCTION chunk expression (TextAnalysis.chunkArrays), so a
    // regression in t13's construction fails here, not just its copy
    val doc = Seq((1L, (1 to 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val S = TextAnalysis.ChunkStride
    val C = TextAnalysis.ChunkSize
    val rows = doc.select(
        posexplode(TextAnalysis.chunkArrays(TextAnalysis.tokens(col("text"))))
          .as(Seq("i", "chunk")))
      .collect().sortBy(_.getAs[Int]("i"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val ca = a.getSeq[String](1)
        val cb = b.getSeq[String](1)
        if (ca.length == C) assert(ca.drop(S) == cb.take(C - S))
      case _ => ()
    }
  }

  test("p14: categories partition the key space exactly as planted") {
    val got = PipelineQueries.p14SnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("category") -> r.getAs[Long]("n_rows")).toMap
    val keys = Tables.orders(spark, sf).select(col("o_orderkey")).as[Long].collect()
    val added = keys.count(k => k % 10 == PipelineQueries.DiffAddedMod)
    val removed = keys.count(k => k % 10 == PipelineQueries.DiffRemovedMod)
    val changed = keys.count(k => k % 5 == 0 &&
      k % 10 != PipelineQueries.DiffAddedMod && k % 10 != PipelineQueries.DiffRemovedMod)
    assert(got("added") == added)
    assert(got("removed") == removed)
    assert(got("changed") == changed)
    assert(got.values.sum == keys.length)
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
  }

  test("p15: per-source caps hold and kept docs dominate dropped ones") {
    val kept = PipelineQueries.p15SourceCap(spark, sf).collect()
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
    val bySource = all.groupBy(_.getAs[String]("source"))
    val K = PipelineQueries.SourceCapK
    kept.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.length == math.min(K, bySource(src).length), src)
      // the kept set is exactly the top-K under (n_chars desc, doc_id asc)
      val want = bySource(src)
        .map(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
        .sorted.take(K).map(_._2).toSet
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == want, src)
    }
  }

  test("g05: histogram conserves rows, bins stay in range, edges are ordered") {
    val rows = PipelineQueries.g05Histogram(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    val B = PipelineQueries.HistBins
    rows.groupBy(_.getAs[String]("col_name")).foreach { case (c, bins) =>
      assert(bins.map(_.getAs[Long]("n")).sum == n, c)
      bins.foreach { b =>
        val i = b.getAs[Long]("bin")
        assert(i >= 0 && i < B, b.toString)
        assert(b.getAs[Double]("v_min") <= b.getAs[Double]("v_max"), b.toString)
      }
      bins.sortBy(_.getAs[Long]("bin")).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("v_max") <= b.getAs[Double]("v_min"), c)
        case _ => ()
      }
    }
  }

  test("g06: anomalies require |z| > 3; warm-up hours never flag") {
    val rows = PipelineQueries.g06Anomaly(spark, sf).collect()
    // densified: one row per WALL-CLOCK hour in [min, max], not per
    // observed hour (sf0.001 has empty hours, which must appear as n=0)
    val span = Tables.events(spark, sf)
      .select((unix_timestamp(date_trunc("hour", max(col("ts")))) -
        unix_timestamp(date_trunc("hour", min(col("ts"))))) / 3600 + 1)
      .as[Double].head().toLong
    assert(rows.length == span)
    val observed = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(rows.count(_.getAs[Long]("n") > 0) == observed)
    // the very first hour has an empty trailing window → null z, no flag
    assert(rows.head.isNullAt(rows.head.fieldIndex("z")))
    assert(!rows.head.getAs[Boolean]("is_anomaly"))
    rows.foreach { r =>
      if (r.getAs[Boolean]("is_anomaly"))
        assert(math.abs(r.getAs[Double]("z")) > PipelineQueries.AnomalyZMax, r.toString)
      if (!r.isNullAt(r.fieldIndex("z")) &&
          math.abs(r.getAs[Double]("z")) > PipelineQueries.AnomalyZMax)
        assert(r.getAs[Boolean]("is_anomaly"), r.toString)
    }
  }

  test("g06: a silent hour appears as n=0 and flags against a healthy baseline") {
    // 30 hours of steady traffic with hour 27 missing entirely — the
    // densified series must materialize it (n = 0) and score it as a
    // large NEGATIVE z; an observation-count frame would silently skip it
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = for {
      h <- 0 until 30 if h != 27
      i <- 0 until (10 + (h % 2) * 2) // 10/12 alternating: std > 0
    } yield new java.sql.Timestamp(ts0 + h * 3600000L + i * 1000L)
    val events = rows.toDF("ts")
    val out = PipelineQueries.anomalyMonitor(events).collect()
    assert(out.length == 30) // every wall-clock hour, including the gap
    val gap = out(27)
    assert(gap.getAs[Long]("n") == 0L)
    assert(gap.getAs[Double]("z") < -PipelineQueries.AnomalyZMax)
    assert(gap.getAs[Boolean]("is_anomaly"))
    // surrounding healthy hours stay quiet... except the gap pollutes the
    // NEXT hour's baseline only mildly (1 of 24 observations)
    assert(!out(26).getAs[Boolean]("is_anomaly"))
  }

  test("st09: the metrics journal accounts for every row and one clean termination") {
    val got = graft.streaming.StreamReplay.st09MetricsReplay(spark, sf).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("total")).toMap
    val n = Tables.events(spark, sf)
      .filter(col("ts") < lit(graft.streaming.StreamReplay.DlqFeedEnd).cast("timestamp"))
      .count()
    assert(got == Map("stream" -> 1L, "stream_batch" -> n), got.toString)
  }

  test("x01: processed and quarantined exactly complement the corpus; invalid types never land") {
    import graft.queries.ControlPlaneQueries
    val rows = ControlPlaneQueries.x01PipelineE2e(spark, sf).collect()
    val feedEnd = lit(ControlPlaneQueries.E2eFeedEnd).cast("timestamp")
    val byType = Tables.events(spark, sf).filter(col("ts") < feedEnd)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_processed") + r.getAs[Long]("n_quarantined") == byType(t), t)
      // the known_type rule quarantines every 'error' row
      if (t == "error") assert(r.getAs[Long]("n_processed") == 0L, r.toString)
      else assert(r.getAs[Long]("n_processed") > 0L, r.toString)
    }
  }

  test("x02: SQL over the registered catalog table equals the direct aggregation") {
    import graft.queries.ControlPlaneQueries
    val got = ControlPlaneQueries.x02CatalogSql(spark, sf).collect()
    val feedEnd = lit(ControlPlaneQueries.E2eFeedEnd).cast("timestamp")
    val direct = Tables.events(spark, sf)
      .filter(col("ts") < feedEnd && dayofmonth(col("ts")) <= 2)
      .groupBy(year(col("ts")).as("year"), month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("year"), col("month"), col("day"), col("hour"))
      .collect()
    assert(got.length == direct.length && got.length > 0)
    got.zip(direct).foreach { case (g, b) => assert(g == b, s"$g != $b") }
  }

  test("st08: streamed interval join equals the batch theta-join") {
    val got = graft.streaming.StreamReplay.st08JoinReplay(spark, sf).collect()
    val feedEnd = lit(graft.streaming.StreamReplay.JoinFeedEnd).cast("timestamp")
    val ev = Tables.events(spark, sf).filter(col("ts") < feedEnd)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") -
            expr(s"INTERVAL ${graft.streaming.StreamReplay.JoinWindow}") &&
          col("c_ts") <= col("p_ts"))
      .groupBy(date_trunc("hour", col("p_ts")).as("hour_bucket"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("p_user")).as("n_users"))
      .orderBy(col("hour_bucket")).collect()
    assert(got.length == batch.length && got.length > 0,
      s"${got.length} vs ${batch.length}")
    got.zip(batch).foreach { case (g, b) => assert(g == b, s"$g != $b") }
  }

  test("p31: datacard internal consistency - shares sum to 1, masses reconcile") {
    import org.apache.spark.sql.Row
    val sf = "/root/testdata/sf0.001"
    val card = graft.queries.PipelineQueries.p31Datacard(spark, sf).collect()
      .map { case Row(s: String, i: String, n, v) =>
        (s, i) -> (Option(n).map(_.asInstanceOf[Long]),
                   Option(v).map(_.asInstanceOf[Double])) }.toMap
    val nDocs = card(("corpus", "docs"))._1.get
    assert(nDocs == Tables.documents(spark, sf).count())
    // composition shares each sum to 1 within rounding
    Seq("lang", "source").foreach { sec =>
      val shares = card.collect { case ((`sec`, _), (_, Some(v))) => v }
      val mass = card.collect { case ((`sec`, _), (Some(n), _)) => n }
      assert(math.abs(shares.sum - 1.0) < 1e-4, s"$sec shares")
      assert(mass.sum == nDocs, s"$sec masses must cover the corpus")
    }
    // duplication reconciles: unique + dup_docs = docs
    assert(card(("dedup", "unique"))._1.get +
      card(("dedup", "dup_docs"))._1.get == nDocs)
    // quantiles are ordered and in [0, 1]
    val Seq(p25, p50, p75) = Seq("p25", "p50", "p75")
      .map(p => card(("quality", p))._2.get)
    assert(p25 <= p50 && p50 <= p75 && p25 >= 0.0 && p75 <= 1.0)
    // token mean is total / docs
    assert(math.abs(card(("tokens", "mean"))._2.get -
      card(("tokens", "total"))._1.get.toDouble / nDocs) < 1e-4)
  }
}
