package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Semantic laws for the round-11 batch: s21's IVF-cell kNN vote
  * (bounded panel, exact-vote accuracy rebuilt brute-force in plain
  * Scala) and the bounded-scale invariants the round introduced (d14's
  * fixed-size bench suite, d16's witness cap — the caps themselves are
  * pinned in DedupSimilaritySpec/RoundSevenOpsSpec; here we pin the
  * SIZE laws that make the 100 TB story true). */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("s21: panel census + exact-vote accuracy match a plain-Scala rebuild; agreement contract holds") {
    val got = Similarity.s21IvfKnnVote(spark, sf).collect()
      .map(r => r.getAs[Long]("true_label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_exact_correct"),
         r.getAs[Boolean]("agree_ok"))).toMap
    assert(got.nonEmpty)

    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Long)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val holdout = vecs.filter(_._1 % 5 == 0)
    val panel = holdout.sortBy(v => md5hex(v._1.toString))
      .take(Similarity.KnnPanelN)
    val labeled = vecs.filter(_._1 % 5 != 0)
    // the exact vote, brute force: rank all labeled by (round6 cos DESC,
    // nb_id), top KnnVoteK, argmax by (count DESC, label ASC)
    val preds = panel.map { case (qid, qe, trueLabel) =>
      val top = labeled
        .map { case (nid, ne, nl) => (rnd6(cos(qe, ne)), nid, nl) }
        .sortBy { case (c, nid, _) => (-c, nid) }
        .take(Similarity.KnnVoteK)
      val pred = top.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (trueLabel, pred == trueLabel)
    }
    val expect = preds.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.count(_._2).toLong)
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (l, (n, nc)) =>
      val (gn, gnc, _) = got(l)
      assert(gn == n && gnc == nc, s"label $l: got ($gn,$gnc) expect ($n,$nc)")
    }
    // the panel is fixed-size (or the whole holdout when smaller)
    assert(got.values.map(_._1).sum ==
      math.min(Similarity.KnnPanelN, holdout.length).toLong)
    // the agreement boolean is a PANEL-level fact: identical on every row
    assert(got.values.map(_._3).toSet.size == 1)
    assert(got.values.head._3, "IVF vote agreement fell below the floor")
  }

  test("s23: the hybrid pipeline matches a plain-Scala rebuild; fused ranks respect leg dominance") {
    val got = Similarity.s23HybridRerank(spark, sf).collect()
    assert(got.length == Similarity.Bm25Queries.size * Similarity.TopK)
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("cos_prf"))),
      "a null PRF centroid leaked into the rerank")

    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

    // rebuild all four stages in plain Scala over the embedded slice
    // (tokenization itself is the t01/t05 oracles' problem — reuse the
    // engine's tokens column as the rebuild input)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val toksById = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")))
      .as[(Long, Seq[String])].collect()
      .filter { case (id, _) => emb.contains(id) }
    val dl = toksById.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val nDocs = dl.size
    val avgdl = dl.values.sum.toDouble / nDocs
    val vocab = Similarity.Bm25Queries.flatMap(_._2).distinct.toSet
    val tf: Map[(Long, String), Long] = toksById
      .flatMap { case (id, ts) => ts.filter(vocab).map(t => (id, t)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }

    val expect = Similarity.Bm25Queries.flatMap { case (qid, terms) =>
      val scored = toksById.map(_._1).flatMap { id =>
        val contribs = terms.flatMap { t =>
          tf.get((id, t)).map { n =>
            math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
              (n * 2.2) /
              (n + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          }
        }
        if (contribs.isEmpty) None
        else Some(id -> rnd(contribs.sum, 6))
      }
      val cands = scored.sortBy { case (id, sc) => (-sc, id) }
        .take(Similarity.HybridCands).zipWithIndex
        .map { case ((id, sc), i) => (id, sc, i + 1) } // (doc, bm25, rank_lex)
      val Seq(v1, v2, v3) = cands.take(Similarity.HybridPrf)
        .map(c => emb(c._1)).toSeq
      val centroid = v1.indices.map(i => rnd(
        (v1(i).toDouble + v2(i).toDouble + v3(i).toDouble) /
          Similarity.HybridPrf.toDouble, 6))
      def cos(c: Seq[Double], b: Seq[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < math.min(c.size, b.size)) {
          val x = c(i); val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val dense = cands.map { case (id, sc, rl) =>
        (id, sc, rl, rnd(cos(centroid, emb(id)), 6))
      }.sortBy { case (id, _, _, c) => (-c, id) }.zipWithIndex
        .map { case ((id, sc, rl, c), i) => (id, sc, rl, c, i + 1) }
      dense.map { case (id, sc, rl, c, rd) =>
        (qid.toLong, id, rl, rd, sc, c,
          rnd(1.0 / (Similarity.RrfK + rl) + 1.0 / (Similarity.RrfK + rd), 9))
      }.sortBy { case (_, id, _, _, _, _, rrf) => (-rrf, id) }
        .take(Similarity.TopK).zipWithIndex
        .map { case (row, i) => (row, i + 1) }
    }.map { case ((qid, id, rl, rd, sc, c, rrf), rank) =>
      (qid, rank) -> ((id, rl, rd, sc, c, rrf))
    }.toMap

    got.foreach { r =>
      val key = (r.getAs[Int]("query_id").toLong, r.getAs[Int]("rank"))
      val (id, rl, rd, sc, c, rrf) = expect(key)
      assert(r.getAs[Long]("doc_id") == id, s"$key doc")
      assert(r.getAs[Int]("rank_lex") == rl && r.getAs[Int]("rank_dense") == rd,
        s"$key leg ranks")
      assert(r.getAs[Double]("bm25") == sc && r.getAs[Double]("cos_prf") == c &&
        r.getAs[Double]("rrf") == rrf, s"$key scores")
    }

    // RRF Pareto law: a doc that beats another on BOTH legs must beat it
    // in the fusion — on every returned frame
    got.groupBy(_.getAs[Int]("query_id")).values.foreach { rows =>
      for (a <- rows; b <- rows)
        if (a.getAs[Int]("rank_lex") < b.getAs[Int]("rank_lex") &&
            a.getAs[Int]("rank_dense") < b.getAs[Int]("rank_dense"))
          assert(a.getAs[Int]("rank") < b.getAs[Int]("rank"),
            s"dominated doc outranked its dominator in query ${a.get(0)}")
    }
  }

  test("g37: pair MMD + bias correction match a plain-Scala integer rebuild; the correction kills the small-n artifact") {
    val got = Similarity.g37SourceMmd(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("mmd2_u12"), r.getAs[Long]("adj_u12"),
          r.getAs[Boolean]("is_shifted"))).toMap
    assert(got.nonEmpty)

    def rnd0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val srcById = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .flatMap { case (id, e) => srcById.get(id).map(s => (s, e)) }
    val bySrc = vecs.groupBy(_._1)
    val mus = bySrc.map { case (s, xs) =>
      val es = xs.map(_._2)
      s -> es.head.indices.map { i =>
        rnd0(es.map(_(i).toDouble).sum / es.length * 1000000L)
      }.toArray
    }
    val corr = bySrc.map { case (s, xs) =>
      val es = xs.map(_._2)
      val q2u = rnd0(es.map(e => e.map(v => v.toDouble * v.toDouble).sum)
        .sum / es.length * 1000000L)
      val musq = mus(s).map(u => u * u).sum
      s -> (q2u * 1000000L - musq) / es.length
    }
    val sources = mus.keys.toSeq.sorted
    for (a <- sources; b <- sources if a < b) {
      val (ma, mb) = (mus(a), mus(b))
      val mmd = ma.indices.map { i => val dlt = ma(i) - mb(i); dlt * dlt }.sum
      val adj = mmd - corr(a) - corr(b)
      val (na, nb, gm, ga, shifted) = got((a, b))
      assert(na == bySrc(a).length.toLong && nb == bySrc(b).length.toLong)
      assert(gm == mmd, s"($a,$b): raw got $gm expect $mmd")
      assert(ga == adj, s"($a,$b): adj got $ga expect $adj")
      assert(shifted == (adj > Similarity.MmdShiftMinU12))
    }
    assert(got.size == sources.size * (sources.size - 1) / 2)
    // the measured lesson the scaladoc records: on this iid corpus at
    // sf0.001's ~25 vectors/source the RAW statistic crosses the floor
    // on most pairs (pure 1/n bias), the corrected one on none
    val rawFires = got.values.count(_._3 > Similarity.MmdShiftMinU12)
    val adjFires = got.values.count(_._5)
    assert(rawFires > got.size / 2, s"raw artifact expected to fire, got $rawFires")
    assert(adjFires == 0, s"corrected statistic fired on iid sources: $adjFires")
  }

  test("q46: trailing-interval frames match a plain-Scala replay; the burst flag bites") {
    import graft.queries.RelationalQueries
    val got = RelationalQueries.q46TrailingWindow(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("peak_1h"),
          r.getAs[Long]("peak_10m"), r.getAs[Long]("n_bursty"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long)].collect()
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      val ts = xs.map(_._2).sorted
      val n1h = ts.map(t => ts.count(x => x >= t - 3600000000L && x <= t))
      val n10 = ts.map(t => ts.count(x => x >= t - 600000000L && x <= t))
      u -> (ts.length.toLong, n1h.max.toLong, n10.max.toLong,
        n1h.count(_ >= RelationalQueries.BurstMin).toLong)
    }
    assert(got == expect)
    // the burst flag is non-vacuous on this corpus
    assert(got.values.map(_._4).sum > 0, "BurstMin never bit")
  }

  test("q47: running-distinct window matches a plain-Scala replay; coverage precedes the last event somewhere") {
    import graft.queries.RelationalQueries
    val got = RelationalQueries.q47WindowDistinct(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Long]("cover_rn"), r.getAs[Long]("cover_tus"),
          r.getAs[Long]("max_d_sofar"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Long, Long)].collect()
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      // time order with the event_id tie-break — the replayed stream
      val ordered = xs.sortBy(x => (x._4, x._3))
      val seen = scala.collection.mutable.Set[String]()
      var coverRn = 0L; var coverTus = 0L; var rn = 0L
      ordered.foreach { x =>
        rn += 1
        if (seen.add(x._2)) { coverRn = rn; coverTus = x._4 }
      }
      u -> (ordered.length.toLong, seen.size.toLong, coverRn, coverTus,
        seen.size.toLong)
    }
    assert(got == expect)
    // non-vacuous: some user keeps producing events after covering its
    // full type set (cover_rn < n_events), and some user has > 1 type
    assert(got.values.exists(v => v._3 < v._1), "coverage never precedes the last event")
    assert(got.values.exists(_._2 > 1L), "every user is single-typed")
  }

  test("d20: prefix-filter census equals brute force; candidates are complete AND strictly pruned") {
    // plain-Scala exact τ=0.5 census: the same norm/tokenize/3-gram
    // pipeline rebuilt independently of Catalyst
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def shingleSet(text: String): Set[String] =
      text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val ids = sets.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if uni > 0 && inter.toDouble / uni >= Dedup.PrefixTau
    } yield (a, b)).toSet

    val got = Dedup.d20PrefixJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "τ=0.5 census empty — the law is vacuous")

    // completeness: every true pair is a prefix-collision candidate
    val cands = Dedup.d20Candidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(expect.subsetOf(cands),
      s"prefix filter lost true pairs: ${(expect -- cands).take(3)}")

    // efficiency: prefix candidates are STRICTLY fewer than the full
    // inverted-index meet census (the Σ df² head never joins)
    val fullMeets = docs.length.toLong * (docs.length - 1) / 2 min {
      val invPairs = (for {
        i <- ids.indices.iterator; j <- (i + 1) until ids.length
        if (sets(ids(i)) & sets(ids(j))).nonEmpty
      } yield 1L).sum
      invPairs
    }
    assert(cands.size < fullMeets,
      s"prefix filter pruned nothing: ${cands.size} vs $fullMeets meets")
  }

  test("g38: calibration bins match a plain-Scala sigmoid rebuild; ECE row is the sum of per-bin gaps") {
    import graft.text.TextAnalysis
    val got = TextAnalysis.g38Calibration(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("sum_score_micros"), r.getAs[Long]("gap_micros"))).toMap
    assert(got.contains(-1L))

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    def weight(term: String): Double =
      Integer.parseInt(md5hex("clf" +
        Integer.parseInt(md5hex(term).take(3), 16) % TextAnalysis.DsirBuckets)
        .take(3), 16) / TextAnalysis.ClfWeightScale - 1.0
    val rebuilt = docs.flatMap { case (_, text, lang) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ")
        .split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None else {
        val mean = toks.map(weight).sum / toks.length
        val score = BigDecimal(1.0 / (1.0 + math.exp(-mean)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val bin = math.min(math.floor(score * 10).toLong, 9L)
        Some((bin, math.round(score * 1000000), if (lang == "en") 1L else 0L))
      }
    }
    val bins = rebuilt.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).sum,
        math.abs(xs.map(_._2).sum - xs.map(_._3).sum * 1000000L))
    }
    val totalGap = bins.values.map(_._4).sum
    val expect = bins + (-1L -> (rebuilt.length.toLong,
      rebuilt.map(_._3).sum, rebuilt.map(_._2).sum, totalGap))
    assert(got == expect)
    // the rollup gap is the SUM of per-bin gaps (ECE·N·1e6), not the
    // gap of the sums — miscalibration in opposite directions must not
    // cancel
    assert(got(-1L)._4 == got.filter(_._1 >= 0).values.map(_._4).sum)
  }

  test("p34: skyline matches a brute-force dominance census; the sample prune bites and stays sound") {
    import graft.queries.PipelineQueries
    val metrics = PipelineQueries.p34Metrics(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("div_micros"), r.getAs[Long]("nsw_micros")))
    def dom(y: (Long, Long, Long, Long), x: (Long, Long, Long, Long)): Boolean =
      y._2 >= x._2 && y._3 >= x._3 && y._4 >= x._4 &&
        (y._2 > x._2 || y._3 > x._3 || y._4 > x._4)
    val expect = metrics.filter(x => !metrics.exists(y => dom(y, x)))
      .map(_._1).toSet

    val got = PipelineQueries.p34Skyline(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expect)
    assert(got.size >= 2 && got.size < metrics.length,
      s"degenerate frontier: ${got.size} of ${metrics.length}")

    // the prune is effective (survivors ≪ corpus) and sound
    // (survivors ⊇ frontier — soundness is also implied by equality)
    val surv = PipelineQueries.p34Survivors(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(expect.subsetOf(surv))
    assert(surv.size < metrics.length / 2,
      s"sample prune barely bit: ${surv.size} of ${metrics.length}")
  }

  test("p35: prototype prune matches a plain-Scala rebuild; every cluster drops exactly ceil(frac*n)") {
    val got = Dedup.p35PrototypePrune(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Long]("rank"),
          r.getAs[Long]("n_cluster"), r.getAs[Boolean]("kept"))).toMap
    assert(got.nonEmpty)

    // plain-Scala rebuild: label-mean codebook, rounded-cosine argmax
    // (ties to the larger label), prototypicality rank, ceil prune
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    val dims = vecs.head._2.length
    val cents = vecs.groupBy(_._3).map { case (lab, xs) =>
      lab -> (0 until dims).map(i =>
        BigDecimal(xs.map(_._2(i).toDouble).sum / xs.length)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val assigned = vecs.map { case (id, em, _) =>
      val emd = em.map(_.toDouble).toSeq
      val (lab, cc) = cents.map { case (l, c) =>
        l -> BigDecimal(cos(emd, c.toSeq))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.maxBy { case (l, c) => (c, l) }
      (id, lab, cc)
    }
    val expect = assigned.groupBy(_._2).iterator.flatMap { case (_, xs) =>
      val ranked = xs.sortBy(x => (-x._3, x._1)).zipWithIndex
      val cut = math.ceil(xs.length * Dedup.PrototypePruneFrac).toLong
      ranked.map { case ((id, lab, _), i) =>
        id -> (lab, i + 1L, xs.length.toLong, (i + 1L) > cut)
      }
    }.toMap
    assert(got == expect)
    // the prune bites in every cluster, and keeps the hard remainder
    val byCluster = got.values.groupBy(_._1)
    byCluster.foreach { case (c, xs) =>
      val n = xs.head._3
      val kept = xs.count(_._4)
      assert(kept == n - math.ceil(n * Dedup.PrototypePruneFrac).toLong,
        s"cluster $c kept $kept of $n")
    }
  }

  test("g39: kappa cells match the raters' own row outputs; the rational identity holds") {
    import graft.text.TextAnalysis
    val r = TextAnalysis.g39Kappa(spark, sf).collect().head
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d"))
    val n = r.getAs[Long]("n")
    // all four cells populated — κ is measuring real disagreement, not
    // a degenerate rater
    assert(a > 0 && b > 0 && c > 0 && d > 0, s"degenerate cells: $a $b $c $d")
    assert(n == a + b + c + d)
    // rebuild the contingency table from the two raters' OWN driver
    // rows — the cells must be their join, not an independent formula
    val ka = TextAnalysis.t18Classifier(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    val kb = TextAnalysis.t02Quality(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("quality") >= TextAnalysis.KappaQualityTau)).toMap
    val cells = ka.keySet.intersect(kb.keySet).toSeq
      .map(id => (ka(id), kb(id)))
    assert(a == cells.count(x => x._1 && x._2))
    assert(b == cells.count(x => x._1 && !x._2))
    assert(c == cells.count(x => !x._1 && x._2))
    assert(d == cells.count(x => !x._1 && !x._2))
    // the rational identity: kappa_num/den restate (po-pe)/(1-pe)
    val peNum = (a + b) * (a + c) + (c + d) * (b + d)
    assert(r.getAs[Long]("kappa_num") == n * (a + d) - peNum)
    assert(r.getAs[Long]("kappa_den") == n * n - peNum)
    assert(r.getAs[Long]("kappa_micros") ==
      math.round((n * (a + d) - peNum).toDouble / (n * n - peNum) * 1000000))
  }

  test("st19: the streamed distinct tracker's final state equals q47's batch rollup") {
    val streamed = graft.streaming.StreamReplay.st19DistinctReplay(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.RelationalQueries.q47WindowDistinct(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("k06: the write-layout law holds physically — no file exceeds the cap, counts match the ceil law") {
    import graft.queries.ControlPlaneQueries
    val out = ControlPlaneQueries.k06FileLayout(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("law_ok"),
        s"${r.getAs[String]("event_type")}: ${r.getAs[Long]("n_files")} files " +
          s"vs law ${r.getAs[Long]("law_files")}")
    }
    // the law must BITE somewhere: if NO key split, a writer that ignored
    // the cap would also pass. Corpus-level (not per-key) so a future rare
    // event type with < cap rows doesn't fail the spec (ADVICE r11).
    assert(out.exists(_.getAs[Long]("n_files") >= 2L),
      "cap never split any event_type — the ceil law check is vacuous")
    // physical per-file bound: re-write and count rows inside each file
    val tmp = java.nio.file.Files.createTempDirectory("graft-k06-spec-").toString
    try {
      Tables.events(spark, sf)
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(col("event_type"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", ControlPlaneQueries.LayoutMaxRecords)
        .partitionBy("event_type")
        .parquet(s"$tmp/lake")
      val perFile = spark.read.parquet(s"$tmp/lake")
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("n"))
        .collect()
      assert(perFile.forall(_.getAs[Long]("n") <=
        ControlPlaneQueries.LayoutMaxRecords))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("st18: the streamed admission gate lands exactly d12's batch decisions") {
    val streamed = graft.streaming.StreamReplay.st18NearDupReplay(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Dedup.d12IncrementalNearDup(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "the gate flagged nothing — vacuous replay")
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("d14: the bench suite is fixed-size and md5-deterministic (O(1) broadcast law)") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id")).as[Long].collect()
    val benchIds = vecs.sortBy(v => md5hex(v.toString))
      .take(Dedup.SemContamBenchN).toSet
    val out = Dedup.d14SemanticDecontam(spark, sf)
      .select(col("vec_id")).as[Long].collect().toSet
    // training side = exact complement of the fixed suite
    assert(out == (vecs.toSet -- benchIds))
    assert(benchIds.size == Dedup.SemContamBenchN)
  }
}
