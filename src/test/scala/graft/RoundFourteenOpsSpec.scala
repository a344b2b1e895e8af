package graft

/** Round-14 laws. First family: the wall-only-inflation lever (VERDICT
  * r13 item 1) — BENCH_r13 shipped `contaminated: false` with
  * g23_cohort_retention at 9.89 s against a 0.27–0.36 s clean-solo range:
  * IO/scheduling pressure stretched WALL without inflating our own JVM's
  * cpu, crossing none of the four existing levers (load1 maxed 9.78 under
  * the 24 bar, PSI 1.66, foreign-cpu clean, cpu_inflated_n 0). Round 14
  * adds (a) a clean-solo wall column to the baseline TSV, (b) heal wave 3
  * retiming rows over 3× that wall at unchanged codegen, (c) PSI **io**
  * sampling at query boundaries as a fifth dirty bar, and (d) the ADVICE
  * per-row acceptance rule: a baseline-keyed retime heals a row only if
  * the NEW reading itself clears the row's baseline check. */
class RoundFourteenOpsSpec extends SparkSpec {

  import BenchRetimer.{Sample, dirty}

  // --- the wall lever: parse ---------------------------------------------

  test("wall baseline: 4-column rows parse, 3-column and -1 rows stay disarmed") {
    val lines = Seq(
      "# comment",
      "q_new\t1.500\t12\t0.750",      // full round-14 row
      "q_old\t2.000\t8",              // pre-round-14 TSV shape
      "q_unknown\t3.000\t4\t-1",      // refresh recorded no wall
      "",
      "q_bad\tx\ty\tz")
    val cpu = BenchSentinel.parseBaseline(lines)
    assert(cpu == Map("q_new" -> (1.5, 12L), "q_old" -> (2.0, 8L),
      "q_unknown" -> (3.0, 4L)))
    val wall = BenchSentinel.parseWallBaseline(lines)
    // only the row with a valid non-negative wall arms the lever
    assert(wall == Map("q_new" -> (0.75, 12L)))
  }

  // --- the wall lever: flagging ------------------------------------------

  test("wall lever: the g23 incident shape flags; calibrated clean jitter never does") {
    val base = Map(
      "g23_cohort_retention" -> (0.27, 10L),
      "g27_acf"              -> (0.22, 10L),
      "d16_edit_refine"      -> (1.45, 20L),
      "big_row"              -> (2.00, 5L))
    // the BENCH_r13 incident readings, codegen unchanged
    val incident = Seq(
      ("g23_cohort_retention", 9.89, 10L),
      ("g27_acf", 5.46, 10L))
    val flagged = BenchSentinel.wallInflatedRows(base, incident)
    assert(flagged.map(_._1).toSet == Set("g23_cohort_retention", "g27_acf"),
      s"incident rows not flagged: $flagged")
    // worst measured clean-vs-clean jitter (four r13 solos): 1.99x on
    // d16 — must stay silent with margin
    assert(BenchSentinel.wallInflatedRows(base,
      Seq(("d16_edit_refine", 1.45 * 1.99, 20L), ("big_row", 2.0 * 2.5, 5L))).isEmpty)
  }

  test("wall lever: the run-wall floor, codegen excuse and missing-baseline cases") {
    val base = Map("tiny" -> (0.10, 5L), "mid" -> (0.27, 5L))
    // a 0.1s row jittering to 0.7s is 7x but under the 1s run-wall
    // floor: never flagged (the floor is on the RUN wall so g23-shaped
    // small baselines are still guarded once the run reading is real)
    assert(BenchSentinel.wallInflatedRows(base, Seq(("tiny", 0.99, 5L))).isEmpty)
    assert(BenchSentinel.wallInflatedRows(base, Seq(("tiny", 1.01, 5L))).nonEmpty)
    // a codegen burst above slack excuses the row (recompiles add wall)
    assert(BenchSentinel.wallInflatedRows(base,
      Seq(("mid", 9.89, 5L + BenchSentinel.CpuCodegenSlack + 1))).isEmpty)
    // ... but an unchanged or lower codegen does not
    assert(BenchSentinel.wallInflatedRows(base, Seq(("mid", 9.89, 5L))).nonEmpty)
    assert(BenchSentinel.wallInflatedRows(base, Seq(("mid", 9.89, -1L))).nonEmpty)
    // rows with no baseline never flag (per-row disarm, loud only via
    // the run-level DISARMED warning when the whole column is missing)
    assert(BenchSentinel.wallInflatedRows(base, Seq(("absent", 99.0, 5L))).isEmpty)
  }

  test("wall lever: separation — the flag ratio sits between clean jitter and the incident") {
    // clean calibration max 1.99x; incident class 15-30x; the 3x bar has
    // >= 1.5x margin both ways and must stay inside (2.0, 15.0)
    assert(BenchSentinel.WallInflateRatio > 1.99 * 1.25,
      "flag ratio too close to measured clean jitter")
    assert(BenchSentinel.WallInflateRatio < 15.0 / 2.0,
      "flag ratio too close to the incident class")
  }

  // --- the io PSI bar ------------------------------------------------------

  test("io bar: io pressure independently marks a boundary dirty; unsampled stays clean") {
    val clean = Sample(load1 = 2.0, psi = 0.5, foreign = 0.05, io = 5.0)
    assert(!dirty(clean))
    assert(dirty(clean.copy(io = BenchRetimer.InRunIoPsiBar + 0.1)))
    // a kernel without /proc/pressure/io samples io = -1: never dirty
    assert(!dirty(clean.copy(io = -1.0)))
    // the bench's own write-heavy profile (measured own-run boundary max
    // io-some avg10 ~12 on this box) must stay clean with margin
    assert(!dirty(clean.copy(io = 12.0 * 2)))
  }

  // --- heal wave bookkeeping ---------------------------------------------

  test("heal: per-row attempts are bounded and cheap relative to the budget") {
    assert(BenchRetimer.MaxRetimeAttempts >= 1 && BenchRetimer.MaxRetimeAttempts <= 3)
  }

  test("heal wave selection is the lever output itself (spec-pinned row selection)") {
    // wave 3 retimes EXACTLY wallInflatedRows' names — the selection is
    // the pure lever, so this pins the doctored-baseline live test's
    // expectation: deflate k rows' wall 5x => exactly those k rows enter
    // the wave
    val base = (1 to 20).map(i => f"q$i%02d" -> (2.0, 5L)).toMap
    val doctored = base.map { case (n, (w, cg)) =>
      n -> (if (n <= "q05") w / 5.0 else w, cg)
    }
    val run = base.toSeq.map { case (n, (w, cg)) => (n, w, cg) }
    val wave = BenchSentinel.wallInflatedRows(doctored, run).map(_._1).sorted
    assert(wave == (1 to 5).map(i => f"q$i%02d"),
      s"expected q01..q05, got $wave")
    // and the per-row acceptance predicate can never clear a doctored
    // baseline: the same reading re-measured still flags
    assert(BenchSentinel.wallInflatedRows(doctored,
      Seq(("q01", 2.0, 5L))).nonEmpty)
  }

  // --- d02: the flagship near-dup row adopts the capped discipline --------
  // d22 proved the df-cap preserves exactness on the hostile corpus; d02 —
  // the row a user actually reaches for — now runs the same candidate
  // discipline on its natural corpus (VERDICT r13 item 4), with the
  // uncapped plan kept as the measurement foil. These laws pin (a) the
  // premise on THIS corpus: every true pair reaches the candidate set
  // through a sub-cap shingle; (b) exactness: capped output ≡ the uncapped
  // census, both directions; (c) the meet accounting the cap bounds.
  test("d02: capped candidates equal the uncapped census on the natural corpus") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions._
    val capped = Dedup.d02NgramJaccard(spark, sf).localCheckpoint(true)
    val uncapped = Dedup.d02UncappedCensus(spark, sf).localCheckpoint(true)
    assert(capped.except(uncapped).isEmpty && uncapped.except(capped).isEmpty,
      "capped d02 != uncapped census")
    assert(capped.count() > 0, "degenerate: no near-dup pairs at all")
    // premise + accounting off the shared inverted index: the natural df
    // head must end under the cap's guard band (measured: max df 32 at
    // sf0.001/sf0.01 vs cap 64; planted hostile boilerplate sits >= 279),
    // so candidate generation drops nothing HERE while the bound protects
    // a drifted corpus
    val inv = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Dedup.shingles(col("toks"))).as("sg"))
      .select(col("doc_id"), xxhash64(col("sg")).as("h"))
    val meets = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(max(col("df")).as("max_df"),
        sum(expr("df * (df - 1) div 2")).as("all"),
        sum(expr(s"CASE WHEN df <= ${Dedup.DfCap} " +
          "THEN df * (df - 1) div 2 ELSE 0 END")).as("capped"))
      .collect()(0)
    assert(meets.getAs[Long]("max_df") <= Dedup.DfCap,
      s"natural df head ${meets.getAs[Long]("max_df")} crossed the cap — " +
        "the corpus drifted into the regime d22 measured; re-verify the premise")
    assert(meets.getAs[Long]("all") == meets.getAs[Long]("capped"),
      "cap dropped meets on the natural corpus yet outputs matched — " +
        "update this law's accounting")
  }

  test("d02: the split-count branch (over-cap postings present) still equals the census") {
    // the hostile corpus plants boilerplate shingles with df >= 279 —
    // d02Over's probe takes the split-count branch there, and the output
    // must STILL equal the cap-free census (every true pair shares a
    // sub-cap shingle by construction, d22's proven premise). This pins
    // the branch the natural corpus's fast path skips.
    import graft.dedup.Dedup
    val docs = Dedup.hostileDocs(spark, sf)
    val capped = Dedup.d02Over(docs).localCheckpoint(true)
    val uncapped = Dedup.d02UncappedCensusOver(
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.text.TextAnalysis.tokens(
          org.apache.spark.sql.functions.col("text")).as("toks"))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          Dedup.shingles(org.apache.spark.sql.functions.col("toks")).as("sh")))
      .localCheckpoint(true)
    assert(capped.count() > 0, "hostile corpus produced no J >= 0.6 pairs")
    assert(capped.except(uncapped).isEmpty && uncapped.except(capped).isEmpty,
      "split-count d02 != uncapped census on the hostile corpus")
  }

  // --- g41: the DECIMAL(38,0) lift past the BIGINT-exact bound ------------
  // r13 shipped a loud require at N <= 2M with the lift documented but not
  // implemented (VERDICT item 6). Now the require is a branch; these laws
  // prove (a) the lifted sums are EXACT (BigInt reference) on a synthetic
  // >2M-point frame whose BIGINT sums would genuinely overflow, (b) sum
  // equality across the lift boundary on a frame valid in both
  // representations, (c) the committed corpora stay on the BIGINT branch.
  test("g41 lift: DECIMAL sums are BigInt-exact on a >2M-point frame that overflows BIGINT") {
    import graft.queries.BehaviorQueries
    import org.apache.spark.sql.functions._
    val cellSeq = for (xb <- 0L until 40L; yb <- 0L until 24L)
      yield (xb, yb, 2000L + (xb * yb * 997L) % 4000L + xb * 31L)
    val n = cellSeq.map(_._3).sum
    assert(n > BehaviorQueries.SpearmanMaxN, s"fixture too small: $n points")
    // BigInt reference: the same marginal-midrank construction, exact
    def marg(sel: ((Long, Long, Long)) => Long): Map[Long, BigInt] = {
      val nm = cellSeq.groupBy(sel).view.mapValues(cs => cs.map(_._3).sum).toMap
      val keys = nm.keys.toSeq.sorted
      val cum = keys.scanLeft(0L)((acc, k) => acc + nm(k))
      keys.zip(cum).map { case (k, cb) =>
        k -> (BigInt(2) * cb + nm(k) - n) // dx2 = 2*cumBefore + nm - N
      }.toMap
    }
    val dx = marg(_._1); val dy = marg(_._2)
    var sxy = BigInt(0); var sxx = BigInt(0); var syy = BigInt(0)
    var zx = BigInt(0); var zy = BigInt(0)
    cellSeq.foreach { case (xb, yb, cn) =>
      val (a, b) = (dx(xb), dy(yb))
      sxy += cn * a * b; sxx += cn * a * a; syy += cn * b * b
      zx += cn * a; zy += cn * b
    }
    // the branch is genuinely needed: the BIGINT form would overflow
    assert(sxx > BigInt(Long.MaxValue), s"fixture sxx $sxx fits in 64 bits")
    val cells = spark.createDataFrame(cellSeq).toDF("xb", "yb", "n")
    val out = BehaviorQueries.spearmanOverCells(cells, lift = true).collect()(0)
    def dec(name: String): BigInt =
      BigInt(out.getAs[java.math.BigDecimal](name).toBigInteger)
    assert(out.getAs[Long]("n_total") == n)
    assert(dec("sxy") == sxy, s"sxy ${dec("sxy")} vs $sxy")
    assert(dec("sxx") == sxx)
    assert(dec("syy") == syy)
    assert(dec("zero_x") == 0 && zx == 0)
    assert(dec("zero_y") == 0 && zy == 0)
    val rho = math.round(
      sxy.toDouble / math.sqrt(sxx.toDouble * syy.toDouble) * 1e6)
    assert(out.getAs[Long]("rho_micros") == rho)
  }

  test("g41 lift: both representations agree exactly across the lift boundary") {
    import graft.queries.BehaviorQueries
    // a frame small enough for BIGINT: run it through BOTH branches
    val cellSeq = for (xb <- 0L until 12L; yb <- 0L until 24L)
      yield (xb, yb, 100L + (xb * yb * 17L) % 300L)
    val cells = spark.createDataFrame(cellSeq).toDF("xb", "yb", "n")
    val bi = BehaviorQueries.spearmanOverCells(cells, lift = false).collect()(0)
    val de = BehaviorQueries.spearmanOverCells(cells, lift = true).collect()(0)
    assert(bi.getAs[Long]("n_total") == de.getAs[Long]("n_total"))
    Seq("sxy", "sxx", "syy", "zero_x", "zero_y").foreach { c =>
      assert(BigInt(bi.getAs[Long](c)) ==
        BigInt(de.getAs[java.math.BigDecimal](c).toBigInteger),
        s"$c diverges across the lift boundary")
    }
    assert(bi.getAs[Long]("rho_micros") == de.getAs[Long]("rho_micros"))
  }

  test("g41 lift: the committed corpus stays on the BIGINT branch (schema pinned)") {
    import graft.queries.BehaviorQueries
    val out = BehaviorQueries.g41SpearmanRho(spark, sf)
    assert(out.schema("sxy").dataType ==
      org.apache.spark.sql.types.LongType,
      "sf0.001 landed on the DECIMAL branch — the oracle's BIGINT schema would mismatch")
  }

  // --- m06 / ImageIoCodec: real image decode (VERDICT r13 item 5) ---------
  // The JDK ships pure-Java PNG readers, so the multimodal decode residue
  // shrinks to what ImageIO lacks (video/audio). These laws pin the codec
  // bit-exact independently of m06's closed-form oracle: a brute-force
  // pixel compare of decode∘encode, the [0,1] trait normalization, the
  // loud-failure contract, and the full Dataset pipeline on real bytes.
  test("ImageIO codec: decode∘encode is the identity on gray samples, loud on garbage") {
    import graft.multimodal.Multimodal
    val (w, h) = (23, 17) // deliberately non-square, non-multiple-of-16
    def pix(i: Int): Int = (i * 97 + 13) % 256
    val png = Multimodal.encodeGrayPng(w, h, pix)
    assert(png.take(4).map(_ & 0xFF).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt),
      "payload is not a real PNG stream")
    val (dw, dh, px) = Multimodal.decodeGrayPng(png)
    assert((dw, dh) == (w, h))
    (0 until w * h).foreach(i => assert(px(i) == pix(i), s"pixel $i"))
    // trait-level decode: [0,1] normalization of the same samples
    val f = Multimodal.ImageIoCodec.decode(png, w, h)
    (0 until w * h).foreach(i => assert(f(i) == pix(i) / 255.0f))
    // an undecodable payload fails loudly (DLQ lane), never zero-fills
    intercept[IllegalArgumentException] {
      Multimodal.decodeGrayPng(Array[Byte](1, 2, 3, 4))
    }
  }

  test("ImageIO codec: the Dataset decode pipeline runs on real PNG payloads") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}
    import spark.implicits._
    val recs = spark.createDataset((0L until 16L).map { id =>
      val w = 16 + (id % 3).toInt * 8
      MediaRecord(id,
        Multimodal.encodeGrayPng(w, w, i => ((id * 7 + i) % 256).toInt),
        MediaMeta("image", w, w, 0, 0L))
    })
    val decoded = Multimodal.decode(recs, Multimodal.ImageIoCodec).collect()
    assert(decoded.length == 16)
    decoded.foreach { d =>
      val w = 16 + (d.media_id % 3).toInt * 8
      assert(d.width == w && d.pixels.length == w * w)
      assert(d.pixels(0) == ((d.media_id * 7) % 256).toInt / 255.0f)
    }
  }

  test("m06: decoded-sample digests match an independent brute force (not the closed form)") {
    import graft.multimodal.MultimodalQueries
    val out = MultimodalQueries.m06ImageDecode(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.nonEmpty && out.keySet.forall(_ % 3 == 0))
    // brute-force reference for a handful of ids: build the raster the
    // generator builds and digest it directly — no PNG, no closed form
    out.keys.toSeq.sorted.take(5).foreach { id =>
      val w = (16 * (1 + id % 4)).toInt
      val px = Array.tabulate(w * w)(i => ((id * 31 + i) % 256).toInt)
      val r = out(id)
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == w)
      assert(r.getAs[Long]("n_px") == w * w)
      assert(r.getAs[Long]("first_px") == px(0))
      assert(r.getAs[Long]("sum_px") == px.map(_.toLong).sum)
      assert(r.getAs[Long]("wsum_px") ==
        px.zipWithIndex.map { case (p, i) => (i + 1).toLong * p }.sum)
    }
  }

  // --- m07 / decodePcmWav: real WAV audio decode (m06's audio sibling) ----
  // javax.sound.sampled ships a pure-Java RIFF/WAVE reader, so the audio
  // decode residue drops too — StubCodec now stands in only for video.
  // These laws pin the codec independently of m07's closed-form oracle:
  // identity on the FULL signed 16-bit range (the corpus ramp only spans
  // -128..127, so the spec covers what the oracle can't), the container's
  // little-endian wire format, and the loud-failure contract.
  test("WAV codec: decode∘encode is the identity across the full 16-bit range, loud on garbage") {
    import graft.multimodal.Multimodal
    // extremes, sign boundaries, and an LCG sweep across the range
    val xs = Array(Short.MinValue.toInt, Short.MaxValue.toInt, -1, 0, 1,
      -256, 255, -32767, 32766) ++
      Array.tabulate(1013)(i => ((i * 40503 + 12345) % 65536) - 32768)
    val wav = Multimodal.encodePcmWav(8000, xs)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "payload is not a real RIFF/WAVE stream")
    val (rate, ys) = Multimodal.decodePcmWav(wav)
    assert(rate == 8000 && ys.length == xs.length)
    xs.indices.foreach(i => assert(ys(i) == xs(i), s"sample $i"))
    // out-of-range samples are rejected at encode (no silent wrap)
    intercept[IllegalArgumentException] {
      Multimodal.encodePcmWav(8000, Array(Short.MaxValue.toInt + 1))
    }
    // an undecodable payload fails loudly (DLQ lane), never zero-fills
    intercept[IllegalArgumentException] {
      Multimodal.decodePcmWav(Array[Byte](1, 2, 3, 4))
    }
  }

  test("m07: decoded-sample digests match an independent brute force (not the closed form)") {
    import graft.multimodal.MultimodalQueries
    val out = MultimodalQueries.m07AudioDecode(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.nonEmpty && out.keySet.forall(_ % 3 == 1))
    out.keys.toSeq.sorted.take(5).foreach { id =>
      val n = (256L * (4 + id % 13)).toInt
      val v = Array.tabulate(n)(i => (((id * 17 + i) % 256) - 128).toLong)
      val r = out(id)
      assert(r.getAs[Long]("sample_rate") == 16000L)
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("first_s") == v(0))
      assert(r.getAs[Long]("sum_s") == v.sum)
      assert(r.getAs[Long]("wsum_s") ==
        v.zipWithIndex.map { case (p, i) => (i + 1).toLong * p }.sum)
    }
  }

  // --- g42: the batch hot-key regime (VERDICT r13 item 3) -----------------
  // The dedup family got its adversarial regime in rounds 12-13 (d21-d23);
  // the relational family's skew story was q45 (AQE, opportunistic) and
  // st21 (streaming state). g42 plants a Zipf-hot corpus in-query (the
  // hostileDocs pattern — one user owns ~half the events) and lands g23's
  // first-touch-join census through differentiated salting. These laws pin
  // (a) the regime is real; (b) exactness vs the plain unsalted join;
  // (c) the spread: the hot key's max (user_id, salt) group is ~1/HotSalts
  // of its unsalted mass; (d) the plan: a SHUFFLED join keyed on salt.
  test("g42: the planted regime is real and the salted census equals the plain join") {
    import graft.queries.BehaviorQueries
    import org.apache.spark.sql.functions._
    val ev = BehaviorQueries.hotEvents(spark, sf).localCheckpoint(true)
    val total = ev.count()
    val hotN = ev.filter(col("user_id") === BehaviorQueries.HotUserId).count()
    assert(hotN >= (0.4 * total).toLong && hotN <= (0.6 * total).toLong,
      s"regime broken: hot user owns $hotN of $total events")
    // plain unsalted reference census, built independently
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val want = ev.join(first, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        expr("datediff(day, cohort_day) div 7").as("offset_week"))
      .groupBy(col("cohort_week"), col("offset_week"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
    val got = BehaviorQueries.g42HotCohort(spark, sf)
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "salted census != plain join census")
  }

  test("g42: the salt bounds per-group input at ~1/HotSalts of the hot key's mass") {
    import graft.queries.BehaviorQueries
    import org.apache.spark.sql.functions._
    val probe = BehaviorQueries.g42SaltedProbe(spark, sf).localCheckpoint(true)
    val hot = probe.filter(col("user_id") === BehaviorQueries.HotUserId)
      .groupBy(col("salt")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("salt") -> r.getAs[Long]("n")).toMap
    assert(hot.keySet == (0L until BehaviorQueries.HotSalts.toLong).toSet,
      s"hot key missed salts: ${(0L until BehaviorQueries.HotSalts.toLong).toSet -- hot.keySet}")
    val hotN = hot.values.sum
    val ideal = hotN.toDouble / BehaviorQueries.HotSalts
    assert(hot.values.max <= (ideal * 1.5).toLong + 1,
      s"max salted group ${hot.values.max} vs ideal $ideal — salt skewed")
    // the law the row exists for: unsalted, ONE shuffle group ingests
    // hotN rows (~half the corpus); salted, the worst group is bounded
    val worstShare = hot.values.max.toDouble / probe.count()
    assert(worstShare <= 1.5 / BehaviorQueries.HotSalts,
      f"worst per-group share $worstShare%.3f exceeds ~1/HotSalts")
  }

  test("g42: the executed plan joins SHUFFLED on (user_id, salt), not broadcast") {
    import graft.queries.BehaviorQueries
    val plan = BehaviorQueries.g42HotCohort(spark, sf)
      .queryExecution.executedPlan.toString
    val shj = "ShuffledHashJoin \\[user_id#\\d+L?, salt#\\d+L?\\]".r
    assert(shj.findFirstIn(plan).isDefined,
      s"no ShuffledHashJoin on (user_id, salt) in the plan:\n${plan.take(2000)}")
  }

  // --- baseline TSV: the wall column covers the surface --------------------

  test("sentinel: the committed sf0.1 baseline carries a wall value for EVERY SparkEntry query") {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("scripts/bench_cpu_baseline_sf0.1.tsv"))
      .asScala.toSeq
    val wall = BenchSentinel.parseWallBaseline(lines)
    val missing = SparkEntry.queries.keySet.diff(wall.keySet)
    assert(missing.isEmpty,
      s"wall baseline missing ${missing.size} rows " +
        s"(${missing.toSeq.sorted.take(5).mkString(", ")}) — refresh with " +
        "scripts/refresh_cpu_baseline.py from clean solo sf0.1 artifacts")
    wall.foreach { case (n, (w, _)) =>
      assert(w > 0.0 && w < 600.0, s"$n: implausible baseline wall $w")
    }
  }
}
