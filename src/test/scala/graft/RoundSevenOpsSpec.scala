package graft

import graft.dedup.Dedup
import graft.queries.{ControlPlaneQueries, PipelineQueries}
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-7 additions (s10 filtered retrieval, p25
  * pseudonymization, t20 readability, k02 bucketed join). Same discipline
  * as the round-6 specs: every law re-derives the expectation through an
  * INDEPENDENT path (driver-side arithmetic, upstream operators' own
  * outputs) so a production-path regression cannot cancel out. */
class RoundSevenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("s10: every result shares the query's label, and ranking is s01 restricted") {
    val got = Similarity.s10FilteredTopK(spark, sf).collect()
    assert(got.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    // label-match law: the filter held for every emitted row
    got.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(labels(n) == labels(q), s"query $q neighbor $n crossed labels")
    }
    // restriction law: s10's ranking == s01's unfiltered ranking with
    // cross-label rows deleted and ranks recompacted
    val unfiltered = Similarity.s01BruteForceTopK(spark, sf)
    // s01 only emits top-10; rebuild the full filtered ranking from raw
    // cosines instead, reusing the spark-side cosine for bit-parity
    import graft.functions.VectorFunctions.cosine
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"), col("label"))
    val q = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("label").as("qlabel"))
    val full = e.join(broadcast(q), col("vec_id") =!= col("query_id") && col("label") === col("qlabel"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qe"), col("embedding")), 6).as("cos"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (-t._3, t._2)).take(Similarity.TopK)).toMap
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      val expect = full(qid).map(_._2).toSeq
      val actual = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      assert(actual == expect, s"query $qid ranking")
    }
    assert(unfiltered.count() > 0)
  }

  test("s12: filtered-IVF respects the filter, and recall vs the exact filtered baseline clears the floor") {
    val approx = Similarity.s12FilteredIvfTopK(spark, sf).collect()
    assert(approx.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    // the predicate held inside the index scan: no emitted row crosses labels
    approx.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(labels(n) == labels(q), s"query $q neighbor $n crossed labels")
    }
    // per-query ranking is cos-descending with compact ranks from 1
    approx.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
        s"query $qid ranks not compact")
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse, s"query $qid cos not descending")
    }
    // measured recall vs s10 (the exact filtered baseline) clears the
    // floor on the WORST query — the contract row's own claim, re-derived
    val exact = Similarity.s10FilteredTopK(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val a = approx.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val worst = exact.groupBy(_._1).values.map { es =>
      (es & a).size.toDouble / es.size
    }.min
    info(f"s12 worst-query recall vs s10: $worst%.2f")
    assert(worst >= Similarity.FilteredIvfRecallFloor, f"worst recall $worst%.2f")
    // and the registered contract row delivers all-green booleans
    Similarity.s12FilteredIvfRecall(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"), r.toString)
    }
  }

  test("p25: pseudonyms are injective, deterministic, and match java MD-free sha256") {
    val rows = PipelineQueries.p25Pseudonymize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("injective_ok"), r.toString)
      assert(r.getAs[Long]("n_uids") == r.getAs[Long]("n_docs"))
    }
    // independent rebuild of pid_first via java.security sha256
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def pid(src: String, id: Long): String =
      md.digest(s"graft-pepper-v1|$src:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val firstByDoc = docs.groupBy(_._2).map { case (src, ds) =>
      val minDoc = ds.minBy(_._1)._1
      src -> pid(src, minDoc)
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[String]("pid_first") == firstByDoc(src), s"source $src")
    }
  }

  test("t20: flesch matches a plain-Scala recomputation per document") {
    val got = TextAnalysis.t20Readability(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_sylls"),
         r.getAs[Long]("n_sents"), r.getAs[Double]("flesch"))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val vowel = "[aeiouy]+".r
    val sentRe = "[.!?]".r
    docs.foreach { case (id, text) =>
      val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
      val words = norm.split(" ", -1).toSeq // split keeps empties like Spark's
      val nWords = words.size.toLong
      val nSylls = words.map(w => math.max(1L, vowel.findAllIn(w).size.toLong)).sum
      val nSents = math.max(1L, sentRe.findAllIn(text).size.toLong)
      val flesch = BigDecimal(
        206.835 - 1.015 * (nWords.toDouble / nSents) - 84.6 * (nSylls.toDouble / nWords)
      ).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gw, gs, gn, gf) = got(id)
      assert(gw == nWords && gs == nSylls && gn == nSents, s"doc $id counts")
      assert(math.abs(gf - flesch) < 1e-9, s"doc $id flesch $gf vs $flesch")
    }
  }

  test("s11: knn graph matches a plain-Scala label-blocked rebuild") {
    val got = Similarity.s11KnnGraph(spark, sf).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("nb_id"), r.getAs[Double]("cos"))).toSeq).toMap
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = vecs.groupBy(_._3)
    vecs.foreach { case (id, emb, lab) =>
      val expect = byLabel(lab).filter(_._1 != id)
        .map { case (nid, ne, _) =>
          (nid, BigDecimal(cos(emb, ne)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy(t => (-t._2, t._1)).take(Similarity.KnnK).toSeq
      assert(got.getOrElse(id, Seq.empty) == expect, s"vec $id")
    }
    // degree law: every vector with >= KnnK same-label peers has exactly KnnK edges
    vecs.foreach { case (id, _, lab) =>
      val peers = byLabel(lab).length - 1
      assert(got.getOrElse(id, Seq.empty).size == math.min(peers, Similarity.KnnK))
    }
  }

  test("g11: tightness panel is s11's rank-1 edges rolled up, conserving vectors") {
    val panel = Similarity.g11ClassTightness(spark, sf).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("min_c1"),
         r.getAs[Double]("max_c1"), r.getAs[Double]("mean_c1"))).toMap
    assert(panel.nonEmpty)
    val rank1 = Similarity.s11KnnGraph(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Double]("cos")))
    // conservation: every vector with at least one same-label peer has a
    // rank-1 edge, and the panel counts exactly those
    assert(panel.values.map(_._1).sum == rank1.length)
    rank1.groupBy(_._1).foreach { case (lab, rows) =>
      val cs = rows.map(_._2)
      val (n, mn, mx, mean) = panel(lab)
      assert(n == cs.length && mn == cs.min && mx == cs.max)
      val expectMean = BigDecimal(
        cs.map(c => math.round(c * 1000000)).sum.toDouble / (1000000.0 * cs.length)
      ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - expectMean) < 1e-12, s"label $lab mean")
    }
  }

  test("d14: semantic decontamination matches a brute-force bench probe") {
    val got = Dedup.d14SemanticDecontam(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_bench_hits"), r.getAs[Double]("best_cos"),
         r.getAs[Boolean]("contaminated"))).toMap
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the engine's fixed-size md5-gated bench suite, restated in plain
    // Scala: the SemContamBenchN smallest md5(vec_id) hex strings
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bench = vecs.sortBy(v => md5hex(v._1.toString))
      .take(Dedup.SemContamBenchN)
    val benchIds = bench.map(_._1).toSet
    val train = vecs.filterNot(v => benchIds(v._1))
    assert(bench.length == Dedup.SemContamBenchN && got.size == train.length)
    train.foreach { case (id, emb) =>
      val cs = bench.map { case (_, be) => rnd(cos(emb, be), 6) }
      val hits = cs.count(c => rnd(c, 4) >= Dedup.SemContamTau).toLong
      val (gh, gb, gc) = got(id)
      assert(gh == hits && gc == (hits > 0), s"vec $id hits")
      assert(math.abs(gb - cs.max) < 1e-9, s"vec $id best")
    }
    // the row is non-vacuous on this corpus: some vector is contaminated
    assert(got.values.exists(_._3), "expected at least one semantic leak")
  }

  test("t21: bigram LM scores match a plain-Scala rebuild of the count tables") {
    val got = TextAnalysis.t21BigramLm(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"),
         r.getAs[Double]("min_logp"))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, tx) =>
        id -> tx.trim.toLowerCase.replaceAll("\\s+", " ")
          .split(" ", -1).toSeq.filter(_.nonEmpty) }
    val uni = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val bgAll = docs.flatMap { case (_, tk) => tk.sliding(2).filter(_.size == 2) }
      .map(p => (p(0), p(0) + " " + p(1)))
    val bgc = bgAll.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    docs.foreach { case (id, tk) =>
      if (tk.size >= 2) {
        val lps = tk.sliding(2).filter(_.size == 2).map { p =>
          val bg = p(0) + " " + p(1)
          math.log((bgc(bg) + 1).toDouble / (uni(p(0)) + v))
        }.toSeq
        val (n, avg, mn) = got(id)
        assert(n == lps.size, s"doc $id n")
        def rnd6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(avg - rnd6(lps.sum / lps.size)) < 2e-6, s"doc $id avg")
        assert(math.abs(mn - rnd6(lps.min)) < 1e-9, s"doc $id min")
      } else assert(!got.contains(id))
    }
  }

  test("k02: bucketed join rollup equals the direct parquet join, zero exchange") {
    val got = ControlPlaneQueries.k02BucketedJoin(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Boolean]("join_zero_exchange"), r.toString))
    val direct = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("cents")) * lit(1.0) / lit(100.0), 2).as("revenue"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_items"), r.getAs[Double]("revenue"))).toMap
    got.foreach { r =>
      val (n, rev) = direct(r.getAs[String]("o_orderpriority"))
      assert(r.getAs[Long]("n_items") == n && r.getAs[Double]("revenue") == rev, r.toString)
    }
  }

  test("t22: masking removes every match, and counts/fingerprints match a java.util.regex rebuild") {
    val got = TextAnalysis.t22PiiScan(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .as[(Long, Long, String, String)].collect()
    val eRe = TextAnalysis.PiiEmailRe.r
    val pRe = TextAnalysis.PiiPhoneRe.r
    val iRe = TextAnalysis.PiiIpRe.r
    val md = java.security.MessageDigest.getInstance("MD5")
    case class Acc(var n: Long = 0, var ne: Long = 0, var np: Long = 0,
                   var ni: Long = 0, var maskSum: Long = 0, var len: Long = 0,
                   val distinct: scala.collection.mutable.Set[String] =
                     scala.collection.mutable.Set())
    val accs = scala.collection.mutable.Map[String, Acc]()
    ev.foreach { case (eid, uid, et, props) =>
      val line = s"uid=$uid mail=u$uid@ex${uid % 7}.example phone=+1-555-" +
        f"${eid % 10000}%04d ip=10.${uid % 256}.${eid % 256}.7 props=$props"
      val masked = iRe.replaceAllIn(
        pRe.replaceAllIn(
          eRe.replaceAllIn(line, "<email>"), "<phone>"), "<ip>")
      // the masked text must carry no residual matches of ANY detector
      assert(eRe.findFirstIn(masked).isEmpty && pRe.findFirstIn(masked).isEmpty
        && iRe.findFirstIn(masked).isEmpty, s"residual PII in: $masked")
      // mask-token collision guard: the engine reads counts off the
      // replace outputs, which is only ≡ raw-line match counts if the raw
      // line never carries a literal mask token
      assert(!line.contains("<email>") && !line.contains("<phone>") &&
        !line.contains("<ip>"), s"mask literal in feed: $line")
      val a = accs.getOrElseUpdate(et, Acc())
      a.n += 1
      a.ne += eRe.findAllIn(line).size
      a.np += pRe.findAllIn(line).size
      a.ni += iRe.findAllIn(line).size
      val hex = md.digest(masked.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      a.maskSum += java.lang.Long.parseLong(hex, 16)
      a.len += masked.length
      a.distinct += masked
    }
    assert(got.keySet == accs.keySet)
    accs.foreach { case (et, a) =>
      val r = got(et)
      assert(r.getAs[Long]("n_events") == a.n, s"$et n")
      assert(r.getAs[Long]("n_emails") == a.ne, s"$et emails")
      assert(r.getAs[Long]("n_phones") == a.np, s"$et phones")
      assert(r.getAs[Long]("n_ips") == a.ni, s"$et ips")
      assert(r.getAs[Long]("n_masked_distinct") == a.distinct.size, s"$et distinct")
      assert(r.getAs[Long]("mask_sum") == a.maskSum, s"$et mask_sum")
      assert(r.getAs[Long]("masked_len") == a.len, s"$et len")
    }
  }

  test("p26: regions are quadtree cells, conservation holds, and both dims prune (a 1-D sort cannot)") {
    val regions = PipelineQueries.p26ZorderLayout(spark, sf).collect()
    assert(regions.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(regions.map(_.getAs[Long]("n_rows")).sum == total, "conservation")
    val grid = 1 << PipelineQueries.ZBits
    val cellBits = PipelineQueries.ZRegionBits / 2   // 3 bits per dim
    val cell = grid >> cellBits                      // 256-wide cells
    // quadtree law: every region's bounding box sits inside the cell its
    // id encodes — region bits are the interleaved top-3 bits of each dim
    regions.foreach { r =>
      val reg = r.getAs[Long]("region")
      // zval bit 2i carries ux bit i, 2i+1 carries hx bit i; the region
      // keeps zval bits 16..21 → (u8,h8,u9,h9,u10,h10)
      var ucell = 0L; var hcell = 0L
      (0 until cellBits).foreach { i =>
        ucell |= ((reg >> (2 * i)) & 1L) << i
        hcell |= ((reg >> (2 * i + 1)) & 1L) << i
      }
      assert(r.getAs[Long]("u_min") >= ucell * cell &&
        r.getAs[Long]("u_max") < (ucell + 1) * cell, s"region $reg u box")
      assert(r.getAs[Long]("h_min") >= hcell * cell &&
        r.getAs[Long]("h_max") < (hcell + 1) * cell, s"region $reg h box")
    }
    // pruning law: a one-cell predicate on EITHER dimension eliminates
    // (by bounding-box intersection) at least half the regions
    val uHit = regions.count(r => r.getAs[Long]("u_min") < cell)
    val hHit = regions.count(r => r.getAs[Long]("h_min") < cell)
    assert(uHit <= regions.length / 2, s"u-predicate pruned nothing: $uHit")
    assert(hHit <= regions.length / 2, s"h-predicate pruned nothing: $hHit")
    // the 1-D contrast: bucket the same rows by an hx-only sort into as
    // many buckets; every bucket's u-span covers ~the full u range, so a
    // u-predicate prunes NOTHING in an hx-sorted layout
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hx0"))
      .as[(Long, Long)].collect()
    val u0 = ev.map(_._1).min; val u1 = ev.map(_._1).max
    val h0 = ev.map(_._2).min; val h1 = ev.map(_._2).max
    def norm(x: Long, lo: Long, hi: Long) = (x - lo) * grid / (hi - lo + 1)
    val sorted = ev.map { case (u, h) =>
      (norm(u, u0, u1), norm(h, h0, h1)) }.sortBy(t => (t._2, t._1))
    val bSize = math.max(1, sorted.length / regions.length)
    val oneD = sorted.grouped(bSize).toArray
    val oneDUHit = oneD.count(b => b.map(_._1).min < cell)
    assert(oneDUHit >= oneD.length * 9 / 10,
      s"hx-sorted layout unexpectedly pruned u: $oneDUHit of ${oneD.length}")
  }

  test("st12: four-epoch streaming summary maintenance lands exactly p27's merged summary") {
    val streamed = graft.streaming.StreamReplay.st12SummaryReplay(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
         r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toMap
    assert(streamed.nonEmpty)
    // independent path: the BATCH two-partial merge (p27), itself pinned
    // to the one-pass rebuild by its own spec/oracle
    val batch = PipelineQueries.p27MergeSummaries(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
         r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toMap
    assert(streamed == batch, "streamed incremental summary != batch merge")
  }

  test("g14: CMS estimates dominate true counts for EVERY term, and the top set is exact") {
    val got = TextAnalysis.g14HeavyHitters(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("overcount_ok"), r.toString)
      assert(r.getAs[Boolean]("bound_ok"), r.toString)
    }
    // plain-Scala token counting over the same normalization
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val counts = docs.flatMap(_._2.toLowerCase.trim
        .replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expectTop = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextAnalysis.HeavyK)
    val actualTop = got.map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("true_n"))).toSeq
    assert(actualTop == expectTop, "exact top-k ranking mismatch")
    // the sketch's overcount law must hold on the FULL vocabulary, not
    // just the reported head — rebuild the sketch and sweep every term
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")).as("term"))
      .filter(col("term") =!= "")
    val sk = toks.stat.countMinSketch("term",
      TextAnalysis.CmsEps, TextAnalysis.CmsConfidence, TextAnalysis.CmsSeed)
    counts.foreach { case (t, n) =>
      assert(sk.estimateCount(t) >= n, s"undercount on $t")
    }
  }

  test("st13: streamed candidates + argmax compaction equal the batch as-of operator") {
    val streamed = graft.streaming.StreamReplay.st13AsofReplay(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour_bucket").toString ->
        (r.getAs[Long]("n_matched"), r.getAs[Long]("gap_us"),
         r.getAs[Long]("n_users"))).toMap
    assert(streamed.nonEmpty)
    // independent path: graft.operators.Joins.asOf with the same
    // tolerance horizon, filtered to matched purchases, same rollup
    val ev = Tables.events(spark, sf)
      .filter(col("ts") < lit(graft.streaming.StreamReplay.JoinFeedEnd).cast("timestamp"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val asof = graft.operators.Joins.asOf(
      p, c, key = "user_id",
      leftTs = col("p_ts"), rightTs = col("c_ts"),
      payload = Seq(col("c_ts")), tieBreak = col("c_ts"),
      within = Some(expr("INTERVAL '1' DAY")))
    val batch = asof.filter(col("c_ts").isNotNull)
      // the stream emits one candidate row per (purchase, click) pair, so
      // duplicate (user, p_ts) purchases collapse in its groupBy — mirror
      .dropDuplicates("user_id", "p_ts")
      .groupBy(date_trunc("hour", col("p_ts")).as("hour_bucket"))
      .agg(count(lit(1)).as("n_matched"),
        sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"),
        countDistinct(col("user_id")).as("n_users"))
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour_bucket").toString ->
        (r.getAs[Long]("n_matched"), r.getAs[Long]("gap_us"),
         r.getAs[Long]("n_users"))).toMap
    assert(streamed == batch, "streamed as-of != batch as-of operator")
  }

  test("q42: ordered-set aggregates match a plain-Scala inverse-distribution rebuild") {
    val got = queries.RelationalQueries.q42OrderedSetAgg(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("p25"), r.getAs[Double]("p50"),
         r.getAs[Double]("p75"), r.getAs[Long]("p50_disc"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    def cont(sorted: Array[Long], p: Double): Double = {
      val i = (sorted.length - 1) * p
      val lo = math.floor(i).toInt; val hi = math.ceil(i).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (i - lo)
    }
    def disc(sorted: Array[Long], p: Double): Long =
      sorted(math.max(0, math.ceil(sorted.length * p).toInt - 1))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val sorted = rows.map(_._2).sorted
      val (n, p25, p50, p75, p50d) = got(et)
      assert(n == sorted.length, s"$et n")
      assert(p25 == cont(sorted, 0.25), s"$et p25")
      assert(p50 == cont(sorted, 0.5), s"$et p50")
      assert(p75 == cont(sorted, 0.75), s"$et p75")
      assert(p50d == disc(sorted, 0.5), s"$et p50_disc")
    }
  }

  test("m04: shard manifest matches a plain-Scala greedy byte-packing rebuild") {
    val got = graft.multimodal.MultimodalQueries.m04ShardPack(spark, sf).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("sum_bytes"))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val byKind = docs.map { case (id, text) =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      (kind, id, text.getBytes("UTF-8").length.toLong)
    }.groupBy(_._1)
    val rebuild = byKind.toSeq.flatMap { case (kind, items) =>
      var prior = 0L
      items.sortBy(_._2).toSeq.map { case (_, _, b) =>
        val shard = prior / graft.multimodal.MultimodalQueries.ShardBytes
        prior += b
        ((kind, shard), b)
      }
    }.groupBy(_._1).map { case (k, bs) =>
      k -> ((bs.size.toLong, bs.map(_._2).sum))
    }
    assert(got == rebuild, "manifest != greedy rebuild")
    // conservation: every byte lands in exactly one shard
    assert(got.values.map(_._2).sum ==
      docs.map(_._2.getBytes("UTF-8").length.toLong).sum)
  }

  test("g15: equi-depth bins conserve rows, balance depth, tile the range, and match a rebuild") {
    val bins = PipelineQueries.g15EquidepthHist(spark, sf).collect()
      .sortBy(_.getAs[Int]("bin"))
    assert(bins.length == 8, s"expected 8 bins, got ${bins.length}")
    val cents = Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long")).as[Long].collect()
    // conservation
    assert(bins.map(_.getAs[Long]("n_rows")).sum == cents.length.toLong)
    // depth balance: every bin within 20% of the ideal eighth
    val ideal = cents.length / 8.0
    bins.foreach { b =>
      val n = b.getAs[Long]("n_rows")
      assert(n > ideal * 0.8 && n < ideal * 1.2, s"bin ${b.getAs[Int]("bin")} depth $n")
    }
    // ranges tile without overlap
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
        s"bins ${a.getAs[Int]("bin")}/${b.getAs[Int]("bin")} overlap")
    }
    // plain-Scala rebuild: percentile_disc edges + the same tie rule
    val sorted = cents.sorted
    def edge(p: Double): Long =
      sorted(math.max(0, math.ceil(sorted.length * p).toInt - 1))
    val edges = Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875).map(edge)
    val rebuild = cents.groupBy(c => 1 + edges.count(c > _))
      .view.mapValues(v => (v.length.toLong, v.min, v.max)).toMap
    bins.foreach { b =>
      val (n, lo, hi) = rebuild(b.getAs[Int]("bin"))
      assert(b.getAs[Long]("n_rows") == n && b.getAs[Long]("lo") == lo &&
        b.getAs[Long]("hi") == hi, s"bin ${b.getAs[Int]("bin")} mismatch")
    }
  }

  test("p28: retention tiers partition the day range and match a plain-Scala sweep") {
    val got = PipelineQueries.p28RetentionSweep(spark, sf).collect()
      .map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_rows"),
         r.getAs[java.sql.Date]("oldest_day").toString,
         r.getAs[java.sql.Date]("newest_day").toString)).toMap
    assert(got.nonEmpty)
    val days = Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string")).as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wm = java.time.LocalDate.parse(days.keys.max)
    def tier(day: String): String = {
      val age = java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.parse(day), wm)
      if (age < 1) "analytics_stream_1d"
      else if (age < 7) "stream_7d"
      else if (age < 14) "dlq_14d"
      else if (age < 30) "raw_standard_30d"
      else if (age < 90) "infrequent_access_90d"
      else "glacier"
    }
    val rebuild = days.toSeq.groupBy(kv => tier(kv._1)).map { case (t, ds) =>
      t -> ((ds.size.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max))
    }
    assert(got == rebuild, "sweep != rebuild")
    // conservation + the tiers genuinely split the corpus (the feed spans
    // ~30 days, so all four windows are non-empty at every SF)
    assert(got.values.map(_._2).sum == days.values.sum)
    assert(got.keySet == Set("analytics_stream_1d", "stream_7d", "dlq_14d",
      "raw_standard_30d"))
  }

  test("g16: PSI panel matches a plain-Scala rebuild from t02's own scores") {
    val got = TextAnalysis.g16QualityPsi(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("psi"),
         r.getAs[Boolean]("drifted"))).toMap
    assert(got.nonEmpty)
    // scores from the verified t02 row (an independent production path)
    val scored = TextAnalysis.t02Quality(spark, sf)
      .select(col("doc_id"), col("quality")).as[(Long, Double)].collect().toMap
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val k = TextAnalysis.PsiBins
    def bin(q: Double): Int = math.min(math.floor(q * k).toInt, k - 1)
    val cells = scored.toSeq.groupBy { case (id, q) => (srcOf(id), bin(q)) }
      .view.mapValues(_.size.toLong).toMap
    val sources = srcOf.values.toSet
    val nAll = scored.size.toDouble
    val binTot = (0 until k).map(b =>
      b -> sources.toSeq.map(s => cells.getOrElse((s, b), 0L)).sum).toMap
    sources.foreach { src =>
      val nSrc = srcOf.values.count(_ == src).toDouble
      val psi = (0 until k).map { b =>
        val ps = (cells.getOrElse((src, b), 0L) + 0.5) / (nSrc + 0.5 * k)
        val pc = (binTot(b) + 0.5) / (nAll + 0.5 * k)
        (ps - pc) * math.log(ps / pc)
      }.sum
      val (n, gotPsi, drifted) = got(src)
      assert(n == nSrc.toLong, s"$src n")
      assert(math.abs(gotPsi - psi) < 2e-6, s"$src psi $gotPsi vs $psi")
      assert(drifted == (gotPsi > TextAnalysis.PsiDriftMax), s"$src drifted")
    }
    assert(got.values.map(_._1).sum == scored.size.toLong)
  }

  test("s13: kNN-vote confusion matrix matches a plain-Scala brute-force rebuild") {
    val got = Similarity.s13KnnClassify(spark, sf).collect()
      .map(r => (r.getAs[Int]("true_label"), r.getAs[Int]("pred_label")) ->
        r.getAs[Long]("n_vecs")).toMap
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val hold = vecs.filter(_._1 % 5 == 0)
    val lab = vecs.filter(_._1 % 5 != 0)
    val rebuild = hold.map { case (qid, qe, trueLab) =>
      val top = lab.map { case (nb, e, l) => (nb, l, cos(qe, e)) }
        .sortBy(t => (-t._3, t._1)).take(Similarity.KnnVoteK)
      val pred = top.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (trueLab, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == rebuild, "confusion matrix != brute-force vote rebuild")
    assert(got.values.sum == hold.length.toLong)
  }

  test("a06: the hourly as-of rollup matches a plain-Scala latest-click scan") {
    val got = queries.ExtendedQueries.a06AsOfNative(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour_bucket").toString ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_matched"),
         // sum over an all-unmatched hour is SQL NULL in both engines;
         // normalize to 0 to compare with the scan's empty-sum
         Option(r.get(r.fieldIndex("gap_us"))).fold(0L)(_.asInstanceOf[Long]),
         r.getAs[Long]("n_users"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)].collect()
    // java.sql.Timestamp micro handling: rebuild micros explicitly
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val clicks = ev.filter(_._1 == "click")
      .groupBy(_._2).view.mapValues(_.map(e => micros(e._3)).sorted).toMap
    val purchases = ev.filter(_._1 == "purchase")
    val rebuilt = purchases.map { case (_, uid, pts) =>
      val pUs = micros(pts)
      val m = clicks.getOrElse(uid, Array.empty[Long]).filter(_ <= pUs)
        .maxOption
      (pUs / 3600000000L, uid, m.map(pUs - _))
    }.groupBy(_._1).map { case (hr, rows) =>
      hr -> ((rows.size.toLong, rows.count(_._3.isDefined).toLong,
        rows.flatMap(_._3).sum, rows.map(_._2).distinct.size.toLong))
    }
    val gotByHour = got.map { case (ts, v) =>
      val t = java.sql.Timestamp.valueOf(ts)
      micros(t) / 3600000000L -> v
    }
    assert(gotByHour == rebuilt, "hourly as-of rollup != plain-Scala scan")
  }

  test("p29: erasure is complete (zero residue), conservative, and hits exactly the gated users") {
    val got = PipelineQueries.p29ForgetSweep(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("residue") == 0L, "residual rows for erased users")
      assert(r.getAs[Long]("n_before") ==
        r.getAs[Long]("n_removed") + r.getAs[Long]("n_after"), r.toString)
    }
    // independent gate rebuild: removed mass == rows owned by gated users
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).as[(String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def gated(uid: Long): Boolean = {
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
      hex < PipelineQueries.ForgetGateHex
    }
    val removedByType = ev.filter(e => gated(e._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_removed") == removedByType.getOrElse(et, 0L),
        s"$et removed mass")
    }
    // the gate actually bites at every SF (non-vacuous erasure)
    assert(got.map(_.getAs[Long]("n_removed")).sum > 0)
  }

  test("g17: cohort funnel matches a plain-Scala ordered-stage rebuild") {
    val got = PipelineQueries.g17EventFunnel(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("cohort_day").toString ->
        (r.getAs[Long]("n_viewed"), r.getAs[Long]("n_clicked"),
         r.getAs[Long]("n_purchased"), r.getAs[Long]("click_gap_us"),
         r.getAs[Long]("purchase_gap_us"))).toMap
    assert(got.nonEmpty)
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect()
    val rebuild = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val byType = rows.groupBy(_._2).view.mapValues(_.map(e => us(e._3)).toSeq.sorted).toMap
      byType.get("view").map(_.head).map { v =>
        val c = byType.getOrElse("click", Seq.empty).find(_ >= v)
        val p = c.flatMap(cu => byType.getOrElse("purchase", Seq.empty).find(_ >= cu))
        val day = java.time.Instant.ofEpochSecond(v / 1000000L)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        (day, v, c, p)
      }
    }.groupBy(_._1).map { case (day, us) =>
      day -> ((us.length.toLong,
        us.count(_._3.nonEmpty).toLong,
        us.count(_._4.nonEmpty).toLong,
        us.flatMap(u => u._3.map(_ - u._2)).sum,
        us.flatMap(u => u._4.flatMap(p => u._3.map(p - _))).sum))
    }
    assert(got == rebuild, "funnel != ordered-stage rebuild")
    // funnel monotonicity: each stage can only lose users
    got.values.foreach { case (v, c, p, _, _) =>
      assert(v >= c && c >= p, "stage counts must be monotone")
    }
  }

  test("p30: bookmark crash semantics - replayed slice is idempotent, no-op rerun lands nothing") {
    import graft.state.Bookmark
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm-spec").toString
    val partials = s"$tmp/partials"; val bm = s"$tmp/bookmark"
    val ev = Tables.events(spark, sf)
    val cut = lit("2024-01-05 00:00:00").cast("timestamp")
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    // run 1 over the early slice
    val n1 = Bookmark.runIncremental(ev.filter(col("ts") < cut),
      unix_micros(col("ts")), "r1", partials, bm)(rollup)
    assert(n1 > 0)
    val w1 = Bookmark.read(spark, bm).get
    // crash AFTER landing, BEFORE the advance: wipe the bookmark, replay r1
    val bmPath = new org.apache.hadoop.fs.Path(bm)
    bmPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(bmPath, true)
    val n1b = Bookmark.runIncremental(ev.filter(col("ts") < cut),
      unix_micros(col("ts")), "r1", partials, bm)(rollup)
    assert(n1b == n1, "replayed slice must be the same slice")
    assert(Bookmark.read(spark, bm).contains(w1), "watermark must be restored")
    // the runId-keyed overwrite kept exactly one partial for r1
    val r1 = spark.read.parquet(partials).filter(col("run") === "r1").collect()
    assert(r1.length == 1 && r1.head.getAs[Long]("n") == n1)
    // run 2 processes only the delta; totals accumulate to the full corpus
    val n2 = Bookmark.runIncremental(ev, unix_micros(col("ts")), "r2",
      partials, bm)(rollup)
    assert(n1 + n2 == ev.count())
    // a no-op rerun lands nothing and leaves the watermark untouched
    val w2 = Bookmark.read(spark, bm).get
    assert(Bookmark.runIncremental(ev, unix_micros(col("ts")), "r3",
      partials, bm)(rollup) == 0L)
    assert(Bookmark.read(spark, bm).contains(w2))
    assert(!spark.read.parquet(partials).columns.isEmpty &&
      spark.read.parquet(partials).filter(col("run") === "r3").isEmpty)
  }

  test("p27: history+delta partial merge equals a plain-Scala one-pass rebuild") {
    val got = PipelineQueries.p27MergeSummaries(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
         r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        round(col("value") * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val rebuild = ev.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val cs = rows.map(_._3)
      k -> (cs.length.toLong, cs.sum, cs.min, cs.max)
    }
    assert(got == rebuild, "merge != rebuild")
    // the partials really were disjoint and covering
    assert(got.values.map(_._1).sum == ev.length.toLong)
  }
}
