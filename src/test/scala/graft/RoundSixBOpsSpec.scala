package graft

import graft.dedup.Dedup
import graft.queries.PipelineQueries
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Semantic laws for the later round-6 additions: the duplication-structure
  * panel (g10), concat-and-cut sequence packing (p21), and SQ8
  * scalar-quantized ANN (s08). Same discipline as RoundSixOpsSpec: every
  * law re-derives the expectation through an INDEPENDENT path (the
  * upstream operators' own outputs, driver-side arithmetic) so a
  * production-path regression cannot cancel out in the check. */
class RoundSixBOpsSpec extends SparkSpec {
  import spark.implicits._

  test("g10: sizes partition the corpus; distribution matches a driver rebuild from d07") {
    val got = Dedup.g10ClusterSizes(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))).toMap
    assert(got.nonEmpty)
    // conservation: every document lands in exactly one size bucket
    val total = Tables.documents(spark, sf).count()
    assert(got.values.map(_._2).sum == total)
    got.foreach { case (size, (nc, nd)) =>
      assert(nd == size * nc, s"size $size: n_docs $nd != $size * $nc")
    }
    // independent rebuild of the >= 2 buckets from d07's own output
    val byCluster = Dedup.d07DupClusters(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster_id")).map(_._2.length.toLong)
    val want = byCluster.groupBy(identity).map { case (sz, o) => sz -> o.size.toLong }
    want.foreach { case (sz, nc) =>
      assert(got(sz)._1 == nc, s"size $sz: n_clusters ${got(sz)._1} != $nc")
    }
    assert(got(1L)._1 == total - byCluster.sum)
  }

  test("p21: sequences are exactly full except each source's last; spans match a driver rebuild") {
    val got = PipelineQueries.p21PackSequences(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got.nonEmpty)
    val L = PipelineQueries.PackSeqLen
    // driver rebuild: concatenate per source in doc_id order, cut at L
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
      .filter(_._3 > 0).groupBy(_._1)
    val want = docs.flatMap { case (src, rows) =>
      var off = 0L
      val spans = rows.sortBy(_._2).flatMap { case (_, _, nt) =>
        val fin = off + nt
        val seqs = (off / L) to ((fin - 1) / L)
        val out = seqs.map(q =>
          (src, q) -> (math.min(fin, (q + 1) * L) - math.max(off, q * L)))
        off = fin
        out
      }
      spans.groupBy(_._1).map { case (k, o) =>
        k -> (o.length.toLong, o.map(_._2).sum)
      }
    }
    assert(got == want.toMap)
    // layout audit: within a source every sequence but the last is full
    got.keys.groupBy(_._1).foreach { case (src, ks) =>
      val last = ks.map(_._2).max
      ks.filter(_._2 < last).foreach { k =>
        assert(got(k)._2 == L, s"$k not full: ${got(k)._2}")
      }
    }
  }

  test("p22: apply(old, patch) reconstructs new exactly; patch sizes match the diff") {
    val row = PipelineQueries.p22SnapshotApply(spark, sf).collect() match {
      case Array(r) => r
      case other => fail(s"expected one audit row, got ${other.length}")
    }
    assert(row.getAs[Long]("n_mismatch") == 0L, row.toString)
    // independent sizes from p14's categorized diff
    val cats = PipelineQueries.p14SnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("category") -> r.getAs[Long]("n_rows")).toMap
    assert(row.getAs[Long]("n_upserts") ==
      cats.getOrElse("added", 0L) + cats.getOrElse("changed", 0L))
    assert(row.getAs[Long]("n_deletes") == cats.getOrElse("removed", 0L))
    val newCount = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 =!= PipelineQueries.DiffRemovedMod).count()
    assert(row.getAs[Long]("n_applied") == newCount)
    assert(row.getAs[Long]("n_match") == newCount)
  }

  test("a03: forward as-of picks the first at-or-after right row (driver rebuild)") {
    import graft.queries.ExtendedQueries
    val got = ExtendedQueries.a03AsOfForward(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong)).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val purchases = ev.filter(_._3 == "purchase").groupBy(_._2)
    ev.filter(_._3 == "view").foreach { case (id, uid, _, us) =>
      val want = purchases.getOrElse(uid, Array.empty[(Long, Long, String, Long)])
        .filter(_._4 >= us)
        .sortBy(p => (p._4, p._1)).headOption.map(_._1)
      assert(got(id) == want, s"view $id: got ${got(id)} want $want")
    }
  }

  test("g13: the confusion matrix partitions the corpus and matches a driver NCM rebuild") {
    val got = Dedup.g13LabelPurity(spark, sf).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("assigned")) ->
        r.getAs[Long]("n_vecs")).toMap
    assert(got.values.sum == Tables.embeddings(spark, sf).count())
    // plain-Scala nearest-class-mean rebuild with the same rounding
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val cents = Dedup.labelCodebook(spark, sf)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = vecs.map { case (_, lab, v) =>
      val assigned = cents.map { case (cl, c) => (r6(cos(v, c)), cl) }.max._2
      (lab, assigned)
    }.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    assert(got == want)
  }

  test("d15: containment pairs match a plain-Scala set rebuild; asymmetry is visible") {
    val got = Dedup.d15Containment(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("host_id")) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Double]("containment"))).toMap
    assert(got.nonEmpty)
    // exact shingle STRINGS, plain Scala sets — no hashes, no joins
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingles(graft.text.TextAnalysis.tokens(col("text"))).as("sh"))
      .as[(Long, Seq[String])].collect().map { case (id, sh) => id -> sh.toSet }
    val want = (for {
      (a, sa) <- sets if sa.size >= Dedup.ContainMinShingles
      (b, sb) <- sets if a != b
      c = (sa intersect sb).size
      if c * 1.0 / sa.size >= Dedup.ContainThreshold
    } yield (a, b) -> sa.size.toLong).toMap
    assert(got.keySet == want.keySet,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    got.foreach { case (k, (n, cont)) =>
      assert(n == want(k), s"$k")
      assert(cont >= Dedup.ContainThreshold && cont <= 1.0, s"$k: $cont")
    }
    // the reason d15 exists: at least one contained doc must NOT be a
    // symmetric near-dup of its host on this corpus (J < containment)
    val asym = Dedup.d15Containment(spark, sf)
      .filter(col("jaccard") < col("containment")).count()
    assert(asym > 0, "no asymmetric containment pairs — corpus too clean to prove the gap")
  }

  test("p24: leakage buckets partition the corpus; spans match a driver rebuild") {
    val got = PipelineQueries.p24SplitLeakage(spark, sf).collect()
      .map(r => r.getAs[Long]("n_splits") ->
        (r.getAs[Long]("n_fps"), r.getAs[Long]("n_docs"))).toMap
    assert(got.nonEmpty)
    assert(got.values.map(_._2).sum == Tables.documents(spark, sf).count())
    // independent rebuild from t04's fingerprints and p12's split column
    val fps = graft.text.TextAnalysis.t04Fingerprint(spark, sf)
      .select(col("doc_id"), col("fp")).as[(Long, String)].collect().toMap
    val splits = PipelineQueries.p12TrainSplit(spark, sf)
      .as[(Long, String)].collect().toMap
    val byFp = fps.groupBy(_._2).toSeq.map { case (_, docs) =>
      (docs.keys.map(splits).toSet.size.toLong, docs.size.toLong)
    }
    val want = byFp.groupBy(_._1)
      .map { case (k, o) => k -> (o.size.toLong, o.map(_._2).sum) }
    assert(got == want)
  }

  test("g12: centroid norm is bounded by the mean norm (Jensen) and matches a rebuild") {
    val got = Similarity.g12LabelCentroids(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("centroid_norm") <= r.getAs[Double]("mean_norm") + 1e-9,
        r.toString)
    }
    // driver rebuild for every label
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getAs[Int]("label") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val byLabel = vecs.groupBy(_._1)
    got.foreach { r =>
      val vs = byLabel(r.getAs[Int]("label")).map(_._2)
      val n = vs.length
      assert(r.getAs[Long]("n_vecs") == n.toLong)
      val mean = vs.transpose.map(_.sum / n)
      val cn = math.sqrt(mean.map(x => x * x).sum)
      assert(math.abs(r.getAs[Double]("centroid_norm") - cn) < 1e-5, r.toString)
      val mn = vs.map(v => math.sqrt(v.map(x => x * x).sum)).sum / n
      assert(math.abs(r.getAs[Double]("mean_norm") - mn) < 1e-5, r.toString)
    }
  }

  test("k01: the CSV and ORC round-trips agree with each other and with parquet") {
    val rows = graft.queries.ControlPlaneQueries.k01FormatRoundtrip(spark, sf).collect()
    val byFormat = rows.groupBy(_.getAs[String]("format"))
    assert(byFormat.keySet == Set("csv", "orc"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"), r.getAs[Long]("n_hours"))
    assert(byFormat("csv").map(key).toSet == byFormat("orc").map(key).toSet)
    // and both equal the parquet-derived truth
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 1000000).cast("long")) * lit(1.0) /
          lit(1000000.0), 6).as("v"))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("v"))).toSet
    assert(byFormat("csv").map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet == want)
  }

  test("t19: char entropy matches a plain-Scala −Σ p·ln p recomputation") {
    val got = graft.text.TextAnalysis.t19CharEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("char_entropy"))).toMap
    assert(got.nonEmpty)
    // independent path: plain-Scala char counts and the DIRECT −Σ p ln p
    // formula (production uses the ln n − Σ c ln c / n identity)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
      val counts = norm.groupBy(identity).map(_._2.length)
      val n = counts.sum.toDouble
      val h = -counts.map(c => c / n * math.log(c / n)).sum
      val (gn, gk, gh) = got(id)
      assert(gn == n.toLong && gk == counts.size, s"doc $id")
      assert(math.abs(gh - h) < 1e-5, s"doc $id: got $gh want $h")
    }
  }

  test("s07: the MMR greedy path matches a plain-Scala rebuild from rounded inputs") {
    val got = Similarity.s07MmrTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"))).toMap
    assert(got.size == Similarity.NumQueries * Similarity.TopK)
    // independent path: collect embeddings, rebuild candidates + the
    // greedy recursion in plain Scala with the same rounding
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until Similarity.NumQueries).foreach { qid =>
      val qe = embs(qid)
      val cands = embs.toSeq.filter(_._1 != qid)
        .map { case (v, emb) => (v, cos(qe, emb)) }
        .sortBy { case (v, c) => (-c, v) }.take(Similarity.MmrCands)
      var picked = Vector.empty[Long]
      var pool = cands
      (1 to Similarity.TopK).foreach { step =>
        val best = pool.map { case (v, qc) =>
          val score = if (step == 1) qc
            else 0.7 * qc - 0.3 * picked.map(p => cos(embs(v), embs(p))).max
          (v, score)
        }.minBy { case (v, sc) => (-sc, v) }
        val (wantV, wantS) = best
        val (gotV, gotS) = got((qid, step))
        assert(gotV == wantV && math.abs(gotS -
          BigDecimal(wantS).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"q$qid step $step: got ($gotV, $gotS) want ($wantV, $wantS)")
        picked :+= wantV
        pool = pool.filter(_._1 != wantV)
      }
    }
  }

  test("s09: the composed IVF-SQ8 index clears its recall floor; IVF dominates the loss") {
    val exact = Similarity.s01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfsq = Similarity.s09IvfSqTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ivfsq).size.toDouble / exact.size
    assert(recall >= Similarity.IvfSqRecallFloor, f"recall $recall%.2f")
    // SQ8 alone recovers the exact top-k through its refine (s08's own
    // spec); any s09 miss must therefore come from cell-probe pruning —
    // s09's recall may not fall below plain IVF's by more than noise
    val ivf = Similarity.s03IvfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= ivfRecall - 0.1, f"ivf+sq $recall%.2f vs ivf $ivfRecall%.2f")
    // the contract row itself
    val row = Similarity.s09IvfSqRecall(spark, sf)
    assert(row.filter(!col("recall_ok") ||
      col("n_results") =!= Similarity.TopK).isEmpty, row.collect().mkString(" "))
  }

  test("s08: full top-k per query, exact-cosine-sorted, high recall vs brute force") {
    val got = Similarity.s08SqTopK(spark, sf).collect()
    val exact = Similarity.s01BruteForceTopK(spark, sf).collect()
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until Similarity.NumQueries).toSet)
    byQ.values.foreach { rows =>
      assert(rows.length == Similarity.TopK)
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cos not descending")
    }
    // SQ8's per-dim error is tiny relative to the neighbor gaps here;
    // the refine-50 pass should recover essentially the exact top-10
    val g = got.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val x = exact.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (g intersect x).size.toDouble / x.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
