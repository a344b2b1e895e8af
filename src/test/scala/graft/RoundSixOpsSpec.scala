package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-6 additions: boilerplate detection (t14),
  * corpus-unigram LM scoring (t15), and quality-aware canonical selection
  * (d09). Each law re-derives the expected result through an INDEPENDENT
  * path (exact strings instead of hashes, driver-side arithmetic, the
  * upstream operators' own outputs) so a regression in the production
  * pipeline cannot cancel out in the check. */
class RoundSixOpsSpec extends SparkSpec {
  import spark.implicits._

  test("t14: hashed-broadcast counts equal exact string-keyed counts; frac bounded") {
    val got = TextAnalysis.t14Boilerplate(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val f = r.getAs[Long]("n_frequent")
      val frac = r.getAs[Double]("boiler_frac")
      assert(f >= 0 && f <= n, r.toString)
      assert(frac >= 0.0 && frac <= 1.0, r.toString)
    }
    // independent derivation: exact shingle STRINGS (no xxhash64, no
    // broadcast) through a plain groupBy — catches hash-collision
    // assumptions and join-key bugs in the production path
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(Dedup.shingles(TextAnalysis.tokens(col("text")))).as("sg"))
    val floor = TextAnalysis.boilerplateFloor(Tables.documents(spark, sf).count())
    val freq = sh.groupBy(col("sg")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= floor)
      .select(col("sg"))
    val want = sh.join(freq, "sg")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frequent"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_frequent"))
      .toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_frequent") == want.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("t15: per-doc scores match a driver-side recomputation of the unigram LM") {
    val got = TextAnalysis.t15UnigramLm(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("min_logp"))).toMap
    assert(got.nonEmpty)
    // independent path: collect the token stream, build the MLE counts in
    // plain Scala, recompute each doc's mean/min log-prob
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, t) => id -> t.filter(_.nonEmpty) }
    val counts = toks.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.length }
    val total = counts.values.map(_.toLong).sum.toDouble
    toks.filter(_._2.nonEmpty).foreach { case (id, t) =>
      val lps = t.map(w => math.log(counts(w) / total))
      val (n, avg, min) = got(id)
      assert(n == t.length, s"doc $id n_tokens")
      assert(math.abs(avg - lps.sum / lps.length) < 1e-6, s"doc $id avg_logp")
      assert(math.abs(min - lps.min) < 1e-6, s"doc $id min_logp")
    }
  }

  test("d10: hashed span counts equal exact substring counts; fractions bounded") {
    val got = Dedup.d10VerbatimSpans(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0, r.toString)
      assert(r.getAs[Long]("n_dup_positions") <= r.getAs[Long]("n_positions"), r.toString)
    }
    // independent path: exact substring STRINGS (no xxhash64) — catches
    // hash-collision assumptions and generator off-by-ones
    val L = Dedup.SpanLen
    val g = Tables.documents(spark, sf).select(col("doc_id"),
      explode(expr(s"transform(sequence(1, greatest(length(text) - ${L - 1}, 1))," +
        s" i -> substring(text, i, $L))")).as("gram"))
    val dup = g.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gram"))
    val want = g.join(dup, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_dup_positions") == want.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("p16: curation rollup equals recomposing the operator outputs in plain Scala") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.p16CurationE2e(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toMap
    assert(got.nonEmpty && got.values.map(_._1).sum > 0)
    // independent path: collect each upstream operator's own output and
    // re-run the funnel driver-side (md5 via MessageDigest, not Spark)
    val quality = TextAnalysis.t02Quality(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .as[(Long, Long, Double)].collect()
    val boiler = TextAnalysis.t14Boilerplate(spark, sf)
      .select(col("doc_id"), col("boiler_frac"))
      .as[(Long, Double)].collect().toMap
    val fps = TextAnalysis.t04Fingerprint(spark, sf)
      .select(col("doc_id"), col("fp")).as[(Long, String)].collect().toMap
    def md5hex(v: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val kept = quality
      .filter { case (id, _, q) =>
        // shingle-less docs are absent from t14 = zero boilerplate
        q >= PipelineQueries.CurationMinQuality &&
          boiler.getOrElse(id, 0.0) <= PipelineQueries.CurationMaxBoiler }
      .groupBy { case (id, _, _) => fps(id) }
      .map { case (_, members) => members.minBy(_._1) }
    val want = kept.groupBy { case (id, _, _) =>
      val p = md5hex(id.toString).substring(0, 2)
      if (p < "0a") "test" else if (p < "14") "val" else "train"
    }.map { case (s, m) => s -> (m.size.toLong, m.map(_._2).sum) }
    assert(got == want, s"got $got want $want")
  }

  test("p20: decontam funnel equals p16's gate minus bench docs minus contaminated docs") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.p20DecontamFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toMap
    assert(got.nonEmpty && got.values.map(_._1).sum > 0)
    // independent path: the same driver-side funnel as the p16 law, with
    // the bench cut excluded and the contamination operator's OWN output
    // applied as the extra gate — proves p20 is exactly p16 ∘ d08
    val quality = TextAnalysis.t02Quality(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .as[(Long, Long, Double)].collect()
    val boiler = TextAnalysis.t14Boilerplate(spark, sf)
      .select(col("doc_id"), col("boiler_frac"))
      .as[(Long, Double)].collect().toMap
    val fps = TextAnalysis.t04Fingerprint(spark, sf)
      .select(col("doc_id"), col("fp")).as[(Long, String)].collect().toMap
    val docs = Tables.documents(spark, sf)
    val isBench = col("doc_id") % Dedup.ContaminationBenchMod === 0
    val contam = Dedup.contamination(docs.filter(!isBench), docs.filter(isBench))
      .select(col("doc_id"), col("contam_frac"))
      .as[(Long, Double)].collect().toMap
    def md5hex(v: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val kept = quality
      .filter { case (id, _, q) =>
        id % Dedup.ContaminationBenchMod != 0 &&
          q >= PipelineQueries.CurationMinQuality &&
          boiler.getOrElse(id, 0.0) <= PipelineQueries.CurationMaxBoiler &&
          contam.getOrElse(id, 0.0) <= PipelineQueries.CurationMaxContam }
      .groupBy { case (id, _, _) => fps(id) }
      .map { case (_, members) => members.minBy(_._1) }
    val want = kept.groupBy { case (id, _, _) =>
      val p = md5hex(id.toString).substring(0, 2)
      if (p < "0a") "test" else if (p < "14") "val" else "train"
    }.map { case (s, m) => s -> (m.size.toLong, m.map(_._2).sum) }
    assert(got == want, s"got $got want $want")
    // the cap must sit INSIDE the observed contamination range — some
    // non-bench doc exceeds it (the corpus plants full copies at
    // contam_frac = 1.0) and some doc is under it, so the gate is
    // neither vacuous nor absolute
    assert(contam.values.exists(_ > PipelineQueries.CurationMaxContam),
      "no doc over the contamination cap — gate vacuous")
    assert(contam.values.exists(_ <= PipelineQueries.CurationMaxContam),
      "every doc over the contamination cap — gate absolute")
  }

  test("g09: profile matches a plain-Scala rebuild of entropy, head ranks, and slope") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.g09TokenProfile(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("ttr"), r.getAs[Double]("top1_share"),
          r.getAs[Double]("entropy"), r.getAs[Double]("zipf_slope"))).toMap
    assert(got.nonEmpty)
    // independent path: plain-Scala token counts per source, direct
    // -Σ p ln p entropy (not the ln(n) − Σ c ln c / n identity the
    // production pass uses), hand-rolled OLS (not regr_slope)
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), TextAnalysis.tokens(col("text")).as("t"))
      .as[(String, Seq[String])].collect()
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.flatMap(_._2).filter(_.nonEmpty)
          .groupBy(identity).map { case (t, o) => t -> o.length.toLong }
      }
    bySource.foreach { case (src, counts) =>
      val n = counts.values.sum.toDouble
      val entropy = -counts.values.map(c => c / n * math.log(c / n)).sum
      val head = counts.toVector.sortBy { case (t, c) => (-c, t) }
        .take(PipelineQueries.ZipfTopK)
        .zipWithIndex.map { case ((_, c), i) =>
          (math.log(i + 1.0), math.log(c.toDouble)) }
      val (xm, ym) = (head.map(_._1).sum / head.size, head.map(_._2).sum / head.size)
      val slope = head.map { case (x, y) => (x - xm) * (y - ym) }.sum /
        head.map { case (x, _) => (x - xm) * (x - xm) }.sum
      val (nTok, nTyp, ttr, top1, ent, zs) = got(src)
      assert(nTok == n.toLong && nTyp == counts.size, s"$src sizes")
      assert(math.abs(ttr - counts.size / n) < 1e-5, s"$src ttr")
      assert(math.abs(top1 - counts.values.max / n) < 1e-5, s"$src top1")
      assert(math.abs(ent - entropy) < 1e-5, s"$src entropy $ent want $entropy")
      assert(math.abs(zs - slope) < 1e-5, s"$src slope $zs want $slope")
    }
  }

  test("t18: scores match a java-MD5 rebuild of the hashed linear model") {
    val got = TextAnalysis.t18Classifier(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("score"),
          r.getAs[Boolean]("keep"))).toMap
    assert(got.nonEmpty)
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "the 0.5 cut should split the corpus non-trivially")
    def md5pfx(v: String): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString.substring(0, 3), 16)
    val w = (0 until TextAnalysis.DsirBuckets)
      .map(b => b -> (md5pfx(s"clf$b") / TextAnalysis.ClfWeightScale - 1.0)).toMap
    Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
      .foreach { case (id, t) =>
        val bs = t.filter(_.nonEmpty).map(md5pfx)
        if (bs.isEmpty) assert(!got.contains(id), s"doc $id should have no row")
        else {
          val x = bs.map(w).sum / bs.length
          val want = 1.0 / (1.0 + math.exp(-x))
          val (n, score, keep) = got(id)
          assert(n == bs.length, s"doc $id n_tokens")
          assert(math.abs(score - want) < 1e-5, s"doc $id score $score want $want")
          // the keep flag thresholds the ROUNDED score; only assert it
          // away from the 0.5 boundary where rounding can't flip it
          if (math.abs(want - 0.5) > 1e-4)
            assert(keep == (want >= 0.5), s"doc $id keep")
        }
      }
  }

  test("d09: each representative is its cluster's quality arg-max with id tie-break") {
    val reps = Dedup.d09CanonicalSelect(spark, sf).collect()
    assert(reps.nonEmpty)
    // re-derive from the upstream operators' own outputs
    val clusters = Dedup.d07DupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect()
    val quality = TextAnalysis.t02Quality(spark, sf)
      .select(col("doc_id"), col("quality"))
      .as[(Long, Double)].collect().toMap
    val byCluster = clusters.groupBy(_._2)
    assert(reps.length == byCluster.size)
    reps.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val members = byCluster(cid).map(_._1)
      assert(r.getAs[Long]("n_members") == members.length, s"cluster $cid")
      val want = members.map(id => (quality(id), id))
        .sortBy { case (q, id) => (-q, id) }.head
      assert(r.getAs[Long]("rep_doc_id") == want._2, s"cluster $cid rep")
      assert(r.getAs[Double]("rep_quality") == want._1, s"cluster $cid quality")
    }
  }

  test("t16: weights match a driver-side rebuild of both hashed distributions") {
    val got = TextAnalysis.t16DsirWeights(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("logw"),
          r.getAs[Boolean]("selected"))).toMap
    assert(got.nonEmpty)
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "mean threshold should split the corpus non-trivially")
    val mean = BigDecimal(got.values.map(_._2).sum / got.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent path: java MD5 (not Spark's md5), plain-Scala counts
    def bucket(term: String): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5").digest(term.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString.substring(0, 3), 16)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("t"))
      .as[(Long, String, Seq[String])].collect()
      .map { case (id, lang, t) => (id, lang, t.filter(_.nonEmpty).map(bucket)) }
    val raw = docs.flatMap(_._3).groupBy(identity).map { case (b, o) => b -> o.length.toLong }
    val tgt = docs.filter(_._2 == TextAnalysis.DsirTargetLang)
      .flatMap(_._3).groupBy(identity).map { case (b, o) => b -> o.length.toLong }
    val (rawT, tgtT) = (raw.values.sum.toDouble, tgt.values.sum.toDouble)
    val B = TextAnalysis.DsirBuckets
    docs.filter(_._3.nonEmpty).foreach { case (id, _, bs) =>
      val want = bs.map(b => math.log((tgt.getOrElse(b, 0L) + 1) / (tgtT + B))
        - math.log((raw(b) + 1) / (rawT + B))).sum
      val (n, logw, sel) = got(id)
      assert(n == bs.length, s"doc $id n_tokens")
      assert(math.abs(logw - want) < 1e-5, s"doc $id logw $logw want $want")
      // driver-side mean drifts by float-sum order; only assert the flag
      // for docs clearly away from the boundary
      if (math.abs(logw - mean) > 1e-4)
        assert(sel == (logw > mean), s"doc $id selected (logw $logw mean $mean)")
    }
  }

  test("d11: rewrite equals a plain-Scala first-occurrence line dedup") {
    val got = Dedup.d11LineDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_tokens_kept"), r.getAs[String]("kept_fp"))).toMap
    assert(got.nonEmpty)
    // independent path: line STRINGS (no xxhash64), plain-Scala global
    // first-occurrence scan in (doc_id, pos) order, java MD5
    val L = Dedup.LineLen
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
      .map { case (id, tx) =>
        id -> tx.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
          .grouped(L).map(_.mkString(" ")).toVector
      }
    val seen = scala.collection.mutable.Set.empty[String]
    docs.foreach { case (id, ls) =>
      val kept = ls.filter(seen.add) // add returns false on repeats
      val (wLines, wKept) = (ls.length.toLong, kept.length.toLong)
      val joined = kept.mkString(" ")
      val wToks = if (kept.isEmpty) 0L else joined.split(" ", -1).length.toLong
      val wFp = if (kept.isEmpty) null
        else java.security.MessageDigest.getInstance("MD5")
          .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (gl, gk, gt, gf) = got(id)
      assert(gl == wLines && gk == wKept && gt == wToks, s"doc $id counts")
      assert(gf == wFp, s"doc $id fingerprint")
    }
    // the operator must actually bite both ways at test SF
    assert(got.values.exists(_._2 == 0), "an exact-dup doc should lose every line")
    assert(got.values.exists(v => v._2 > 0 && v._2 < v._1),
      "a partially-copied doc should shrink, not die")
  }

  test("p18: copy counts match driver-side BIGINT factor arithmetic per doc") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.p18EpochMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_before"),
          r.getAs[Long]("n_copies"), r.getAs[Long]("tokens_after"))).toMap
    assert(got.nonEmpty)
    // independent path: java MD5 gate + plain-Scala integer arithmetic
    def gate(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map("%02x".format(_))
        .mkString, 16)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .as[(Long, String, Long)].collect()
    val tok = docs.groupBy(_._2).map { case (s0, m) => s0 -> m.map(_._3).sum }
    val tokMax = tok.values.max
    docs.groupBy(_._2).foreach { case (src, members) =>
      val (whole, thr) = (tokMax / tok(src), (tokMax % tok(src)) * 256 / tok(src))
      val copies = members.map { case (id, _, nt) =>
        (nt, whole + (if (gate(id) < thr) 1L else 0L))
      }
      val (nd, tb, nc, ta) = got(src)
      assert(nd == members.length.toLong, s"$src n_docs")
      assert(tb == tok(src), s"$src tokens_before")
      assert(nc == copies.map(_._2).sum, s"$src n_copies")
      assert(ta == copies.map { case (nt, c) => nt * c }.sum, s"$src tokens_after")
    }
    // the largest source is already at target: exactly one copy per doc
    val biggest = tok.maxBy(_._2)._1
    assert(got(biggest)._3 == got(biggest)._1 && got(biggest)._4 == got(biggest)._2,
      s"largest source $biggest must materialize unchanged")
    // and at least one source must actually oversample
    assert(got.exists { case (_, (nd, _, nc, _)) => nc > nd },
      "no source oversampled — factor derivation is broken")
  }

  test("d12: flags are exactly the cross-parity cut of the exact pair list") {
    // d02 is the exact Jaccard pair list (itself oracle-checked); the
    // incremental gate must agree with its odd-vs-even projection —
    // this catches any LSH bucket miss as well as split/tie-break bugs
    val want = Dedup.d02NgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, j) => if (a % 2 == 1) (a, b, j) else (b, a, j) }
      .groupBy(_._1).map { case (id, ms) =>
        val best = ms.maxBy(m => (m._3, -m._2))
        id -> (ms.size.toLong, best._2, best._3)
      }
    val got = Dedup.d12IncrementalNearDup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("best_match_id"),
          r.getAs[Double]("best_jaccard"))).toMap
    assert(got.nonEmpty, "gate found nothing — split or banding is broken")
    assert(got == want, s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}")
  }

  test("p19: budget fill is the p17 law applied to d11's post-rewrite counts") {
    import graft.queries.PipelineQueries
    // recompose driver-side from the two upstream operators' own outputs
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val rw = Dedup.d11LineDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens_kept")))
    val budget = PipelineQueries.SourceTokenBudget
    val want = rw.filter(_._2 >= PipelineQueries.MinKeptTokens)
      .map { case (id, n) => (src(id), id, n) }
      .groupBy(_._1).flatMap { case (_, ms) =>
        val ranked = ms.toVector.sortBy { case (_, id, n) => (-n, id) }
        ranked.scanLeft(0L)(_ + _._3).tail.zip(ranked)
          .takeWhile(_._1 <= budget)
          .map { case (cum, (s1, id, n)) => (s1, id, n, cum) }
      }.toSet
    val got = PipelineQueries.p19DedupBudget(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toSet
    assert(got.nonEmpty)
    assert(got == want, s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}")
  }

  test("g08: matrix matches an exact string-keyed rebuild; count symmetry holds") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.g08SourceOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
          r.getAs[Double]("overlap_frac"))).toMap
    assert(got.nonEmpty)
    // shared-shingle counts are symmetric even though fractions are not
    got.foreach { case ((a, b), (n, na, f)) =>
      assert(got((b, a))._1 == n, s"n_shared asymmetry for ($a,$b)")
      assert(f > 0.0 && f <= 1.0 && n <= na, s"bounds for ($a,$b)")
    }
    // independent path: exact shingle STRINGS (no xxhash64), per-source
    // distinct sets intersected in plain Scala
    val bySource = Tables.documents(spark, sf)
      .select(col("source"),
        explode(Dedup.shingles(TextAnalysis.tokens(col("text")))).as("sg"))
      .as[(String, String)].collect()
      .groupBy(_._1).map { case (src, rows) => src -> rows.map(_._2).toSet }
    for (a <- bySource.keys; b <- bySource.keys if a != b) {
      val shared = (bySource(a) & bySource(b)).size.toLong
      got.get((a, b)) match {
        case Some((n, na, f)) =>
          assert(n == shared, s"($a,$b) shared $n want $shared")
          assert(na == bySource(a).size.toLong, s"($a,$b) n_a")
          val wf = BigDecimal(shared.toDouble / bySource(a).size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(f == wf, s"($a,$b) frac $f want $wf")
        case None => assert(shared == 0L, s"($a,$b) missing but shares $shared")
      }
    }
  }

  test("p17: kept set is exactly each source's maximal affordable ranked prefix") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.p17TokenBudget(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    assert(got.nonEmpty)
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, String, Long, Long)].collect()
    val budget = PipelineQueries.SourceTokenBudget
    all.groupBy(_._2).foreach { case (src, members) =>
      val ranked = members.sortBy { case (id, _, nc, _) => (-nc, id) }
      val want = ranked.scanLeft(0L)(_ + _._4).tail.zip(ranked)
        .takeWhile { case (cum, _) => cum <= budget }
      val keptHere = got.filter(_._1 == src).sortBy(_._4)
      assert(keptHere.length == want.length, s"source $src size")
      keptHere.zip(want).foreach { case ((_, id, n, cum), (wCum, (wId, _, _, wN))) =>
        assert(id == wId && n == wN && cum == wCum, s"source $src doc $id")
      }
      // maximality: the next ranked doc (if any) must not fit
      if (want.length < ranked.length)
        assert(want.lastOption.map(_._1).getOrElse(0L) + ranked(want.length)._4 > budget,
          s"source $src prefix not maximal")
    }
  }

  test("t17: rule battery recomputes in plain Scala; keep is the conjunction") {
    val got = TextAnalysis.t17GopherRules(spark, sf).collect()
    assert(got.nonEmpty)
    // the battery must discriminate on this corpus, not rubber-stamp
    assert(got.exists(_.getAs[Boolean]("keep")) &&
      got.exists(!_.getAs[Boolean]("keep")), "keep verdict is constant")
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // independent derivation: JVM-string tokenization, no Spark exprs
      val toks = texts(id).trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      assert(r.getAs[Long]("n_words") == toks.length, s"doc $id n_words")
      val mwl = toks.map(_.length).sum.toDouble / toks.length
      assert(math.abs(r.getAs[Double]("mean_word_len") - mwl) < 1e-6, s"doc $id mwl")
      val nStop = toks.filter(TextAnalysis.Stopwords.contains).distinct.length
      assert(r.getAs[Long]("n_stopwords") == nStop, s"doc $id n_stopwords")
      // per-rule booleans must agree with the row's own metrics...
      assert(r.getAs[Boolean]("r_words") ==
        (toks.length >= TextAnalysis.GopherMinWords &&
          toks.length <= TextAnalysis.GopherMaxWords), s"doc $id r_words")
      assert(r.getAs[Boolean]("r_stop") ==
        (nStop >= TextAnalysis.GopherMinStopwords), s"doc $id r_stop")
      assert(r.getAs[Boolean]("r_mean_len") ==
        (r.getAs[Double]("mean_word_len") >= 3.0 &&
          r.getAs[Double]("mean_word_len") <= 10.0), s"doc $id r_mean_len")
      assert(r.getAs[Boolean]("r_alpha") == (r.getAs[Double]("alpha_frac") >= 0.8))
      assert(r.getAs[Boolean]("r_symbol") == (r.getAs[Double]("symbol_ratio") <= 0.1))
      assert(r.getAs[Boolean]("r_bullet") == (r.getAs[Double]("bullet_frac") <= 0.9))
      assert(r.getAs[Boolean]("r_ellipsis") == (r.getAs[Double]("ellipsis_frac") <= 0.3))
      // ...and keep must be exactly their conjunction
      val conj = Seq("r_words", "r_mean_len", "r_alpha", "r_symbol",
        "r_bullet", "r_ellipsis", "r_stop").forall(n => r.getAs[Boolean](n))
      assert(r.getAs[Boolean]("keep") == conj, s"doc $id keep")
    }
  }

  test("d13: drop decisions equal a plain-Scala ranked screening within clusters") {
    val got = Dedup.d13SemDedup(spark, sf).collect()
    assert(got.nonEmpty)
    // bite both ways: real duplicates dropped, the bulk kept
    assert(got.exists(!_.getAs[Boolean]("kept")), "nothing dropped")
    assert(got.count(_.getAs[Boolean]("kept")) > got.length / 2, "over-dropping")
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    // sequential double accumulation in float-read order — the exact
    // arithmetic CosineSimilarity.eval performs, so the rounded-threshold
    // comparison reproduces the production decision bit-for-bit
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def round4(x: Double): Double =
      BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byCluster = got.groupBy(_.getAs[Int]("cluster"))
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val cc = r.getAs[Double]("ccos")
      // a vector is dropped iff a PRECEDING same-cluster vector (lower
      // rounded centroid-cos, id tie-break) sits within the threshold
      val preceding = byCluster(r.getAs[Int]("cluster")).filter { y =>
        val yc = y.getAs[Double]("ccos"); val yid = y.getAs[Long]("vec_id")
        (yc < cc || (yc == cc && yid < id)) &&
          round4(cos(embs(id), embs(yid))) >= Dedup.SemDupTau
      }
      assert(r.getAs[Long]("n_dup_above") == preceding.length, s"vec $id count")
      assert(r.getAs[Boolean]("kept") == preceding.isEmpty, s"vec $id kept")
    }
  }

  test("s06: BM25 top-k matches a plain-Scala recomputation of the ranking") {
    import graft.similarity.Similarity
    val got = Similarity.s06Bm25TopK(spark, sf).collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.nonEmpty)
    // independent rebuild: JVM tokenization + the BM25 formula in plain
    // doubles (same literals, same association order)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase
          .replaceAll("\\s+", " ").split(" ", -1).toSeq)
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val dfm = Similarity.Bm25Queries.flatMap(_._2).distinct
      .map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def score(qTerms: Seq[String], toks: Seq[String]): Double = {
      val dl = toks.length.toLong
      val contribs = qTerms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val df = dfm(t)
          Some(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        }
      }
      if (contribs.isEmpty) Double.NaN
      else BigDecimal.valueOf(contribs.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Similarity.Bm25Queries.foreach { case (qid, terms) =>
      val want = docs
        .map { case (id, toks) => (id, score(terms, toks)) }
        .filter(!_._2.isNaN)
        .sortBy { case (id, sc) => (-sc, id) }
        .take(Similarity.TopK)
      val here = got.filter(_._1 == qid).sortBy(_._2)
      assert(here.length == want.length, s"query $qid size")
      here.zip(want).zipWithIndex.foreach { case (((_, rk, id, sc), (wId, wSc)), i) =>
        assert(rk == i + 1, s"query $qid rank $rk")
        assert(id == wId && math.abs(sc - wSc) < 1e-9, s"query $qid pos $i")
      }
    }
  }
}
