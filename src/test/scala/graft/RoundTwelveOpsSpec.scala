package graft

/** Round-12 laws. First family: the bench contamination sentinel
  * (VERDICT r11 item 1) — the BENCH_r11 incident was a run whose
  * per-query cpu_sec ran up to 10× the clean baseline at identical
  * codegen counts while load/PSI stayed silent, and it self-reported
  * `contaminated: false`. These specs pin the detector so the OFFICIAL
  * artifact can never ship inflated again: the committed baseline file
  * parses, a clean-run provenance (the second r11 clean artifact, whose
  * worst clean-vs-clean ratio was 2.55×) does NOT flag, and an r11-shaped
  * inflated provenance DOES. */
class RoundTwelveOpsSpec extends SparkSpec {

  private val baselineLines: Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("scripts/bench_cpu_baseline_sf0.1.tsv"))
      .asScala.toSeq
  }

  test("sentinel: the committed sf0.1 cpu baseline parses and covers the heavy rows") {
    val base = BenchSentinel.parseBaseline(baselineLines)
    assert(base.size >= 200, s"baseline rows: ${base.size}")
    // every row Bench would check must have sane values
    base.foreach { case (n, (cpu, cg)) =>
      assert(cpu >= 0.0 && cg >= 0L, s"$n: cpu=$cpu cg=$cg")
    }
    // the r11 heavies the incident inflated must be present and >= floor
    // (else the detector is blind exactly where it matters)
    Seq("d02_ngram_jaccard", "d03_minhash_lsh", "d15_containment")
      .foreach { q =>
        assert(base.get(q).exists(_._1 >= BenchSentinel.CpuInflateFloor),
          s"$q missing or under floor in baseline")
      }
  }

  test("sentinel: a clean run's provenance does not trip the cpu-inflation detector") {
    val base = BenchSentinel.parseBaseline(baselineLines)
    // worst observed clean-vs-clean ratio was 2.55x (r11 artifacts); a
    // clean run = baseline cpu scaled by a 2.5x worst-case jitter on a
    // few rows and 1.2x elsewhere, codegen unchanged
    val run = base.toSeq.zipWithIndex.map { case ((n, (cpu, cg)), i) =>
      val jitter = if (i % 29 == 0) 2.5 else 1.2
      (n, cpu * jitter, cg)
    }
    val rows = BenchSentinel.inflatedRows(base, run)
    assert(rows.isEmpty, s"clean-shaped run flagged: ${rows.take(5)}")
    assert(!BenchSentinel.cpuInflated(rows))
  }

  test("sentinel: an r11-shaped inflated run (10x cpu at identical codegen) trips the detector") {
    val base = BenchSentinel.parseBaseline(baselineLines)
    // the incident inflated the heavy rows ~10x at unchanged codegen;
    // model it on every row with baseline cpu >= 1s
    val run = base.toSeq.map { case (n, (cpu, cg)) =>
      (n, if (cpu >= 1.0) cpu * 10.0 else cpu, cg)
    }
    val rows = BenchSentinel.inflatedRows(base, run)
    assert(BenchSentinel.cpuInflated(rows),
      s"10x-inflated run NOT flagged (only ${rows.size} rows)")
    // and the excuse path: the same inflation WITH a codegen burst above
    // slack is excused per-row (recompiles legitimately add cpu)
    val excused = BenchSentinel.inflatedRows(
      base,
      base.toSeq.map { case (n, (cpu, cg)) =>
        (n, cpu * 10.0, cg + BenchSentinel.CpuCodegenSlack + 1)
      })
    assert(excused.isEmpty)
  }

  test("sentinel: rows under the cpu floor never count, whatever their ratio") {
    val base = Map("tiny" -> (0.2, 5L), "big" -> (2.0, 5L))
    val run = Seq(("tiny", 20.0, 5L), ("big", 2.2, 5L))
    assert(BenchSentinel.inflatedRows(base, run).isEmpty)
  }

  // --- d21: the adversarial-df regime contract ---------------------------
  // d20's prefix filter wins BECAUSE rarity ordering exiles high-df
  // shingles; the natural corpus has a mild df head, so the discipline was
  // never tested where it matters. d21 plants the SSJoin papers' worst
  // case (90 % of docs share a boilerplate block) and this spec asserts
  // the efficiency half the SQL oracle can't: candidate volume stays
  // output-sized while the inverted-index meet count is quadratic.
  test("d21: hostile-df candidates are output-sized; the avoided index join is >=100x larger") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions._
    val cands = Dedup.d21Candidates(spark, sf)
    val nCands = cands.count()
    val out = Dedup.d21PrefixHostile(spark, sf)
    // completeness: every true pair was a candidate (prefix lemma live
    // under the hostile regime, not just on the natural corpus)
    assert(out.select(col("doc_a"), col("doc_b"))
      .except(cands).isEmpty, "a true pair was never a candidate")
    // the quadratic work the filter avoided: sum over shingles of
    // df·(df−1)/2 — what d02's inverted index would pay here
    val meets = Dedup.hostileDocs(spark, sf)
      .select(explode(Dedup.shingles(
        graft.text.TextAnalysis.tokens(col("text")))).as("sg"))
      .groupBy(xxhash64(col("sg")).as("h")).agg(count(lit(1)).as("df"))
      .agg(sum(expr("df * (df - 1) div 2")).cast("long")).first().getLong(0)
    assert(meets >= 100L * math.max(nCands, 1L),
      s"discipline didn't bite: meets=$meets candidates=$nCands")
    // candidate volume under the block stays within a constant factor of
    // the corpus's NATURAL prefix-collision floor (random-soup 3-gram
    // matches that exist with no boilerplate at all — measured 878 at
    // sf0.001 vs 28 true pairs): the block's only admissible effects are
    // its rare boundary shingles and the +10 prefix growth from n
    // increasing, never a df² clique. nDocs covers tiny-corpus noise.
    val nNatural = Dedup.d20Candidates(spark, sf)
      .filter(col("doc_a") < Dedup.HostileSliceN &&
        col("doc_b") < Dedup.HostileSliceN).count()
    val nDocs = Dedup.hostileDocs(spark, sf).count()
    assert(nCands <= 3L * nNatural + nDocs,
      s"hostile candidates $nCands vs natural floor $nNatural over $nDocs docs")
  }

  // --- k07: the compaction law must BITE -------------------------------
  // The row's oracle pins content/layout/isolation; this proves the pass
  // had real work to do (the scoped day WAS fragmented beyond one file
  // per hour dir) and that the swap physically shrank it.
  test("k07: the scoped day is genuinely fragmented before and physically shrinks after") {
    import graft.queries.ControlPlaneQueries._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-k07-spec-").toString
    try {
      val ev = Tables.events(spark, sf)
        .filter(dayofmonth(col("ts")) <= FragDays)
        .select(col("event_id"), col("ts"), col("value"))
      graft.transform.Transform.derivePartitions("ts")(ev)
        .repartition(FragTasks)
        .write.mode("overwrite")
        .partitionBy("year", "month", "day", "hour")
        .parquet(s"$tmp/lake")
      def scopedCensus(): (Long, Long, Long) = {
        val r = spark.read.parquet(s"$tmp/lake")
          .filter(col("day") === CompactDay)
          .select(col("hour"), input_file_name().as("f"))
          .agg(count(lit(1)), countDistinct(col("hour")),
            countDistinct(col("f"))).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (rows0, hours0, files0) = scopedCensus()
      assert(files0 > hours0,
        s"compaction vacuous: $files0 files over $hours0 hour dirs")
      val (before, after) = graft.sink.Sinks.compactPartitioned(
        spark, s"$tmp/lake", Some(col("day") === CompactDay))
      assert(before > after, s"swap did not shrink: $before -> $after")
      val (rows1, hours1, files1) = scopedCensus()
      assert((rows1, hours1) == (rows0, hours0), "content changed")
      assert(files1 == hours1, s"not one file per hour dir: $files1 vs $hours1")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  // --- g40: the prefix-sum Kendall census equals the O(N²) truth --------
  // The row's point is replacing the infeasible all-pairs census with 2-D
  // prefix sums over the bounded grid; this rebuilds the census the slow
  // way (500k pairs at sf0.001) and demands exact integer equality, plus
  // the partition identity C + D + ties(any) = n0.
  test("g40: concordant/discordant/tie census matches a brute-force pair loop exactly") {
    import graft.queries.BehaviorQueries
    import org.apache.spark.sql.functions._
    val out = BehaviorQueries.g40KendallTau(spark, sf).collect()(0)
    val pts = Tables.events(spark, sf)
      .select(expr(s"CAST(round(value * 100) AS BIGINT) div ${BehaviorQueries.KendallXBucket}"),
        hour(col("ts")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var conc = 0L; var disc = 0L; var tieX = 0L; var tieY = 0L; var tieXY = 0L
    var i = 0
    while (i < pts.length) {
      var j = i + 1
      while (j < pts.length) {
        val (x1, y1) = pts(i); val (x2, y2) = pts(j)
        if (x1 == x2 && y1 == y2) tieXY += 1
        else if (x1 == x2) tieX += 1
        else if (y1 == y2) tieY += 1
        else if ((x1 < x2) == (y1 < y2)) conc += 1
        else disc += 1
        j += 1
      }
      i += 1
    }
    val n = pts.length.toLong
    assert(out.getAs[Long]("n_total") == n)
    assert(out.getAs[Long]("conc") == conc, s"conc ${out.getAs[Long]("conc")} vs $conc")
    assert(out.getAs[Long]("disc") == disc, s"disc ${out.getAs[Long]("disc")} vs $disc")
    // marginal tie counts INCLUDE both-tied pairs (the τ-b convention)
    assert(out.getAs[Long]("tie_x") == tieX + tieXY)
    assert(out.getAs[Long]("tie_y") == tieY + tieXY)
    val n0 = n * (n - 1) / 2
    assert(out.getAs[Long]("n0") == n0)
    assert(conc + disc + tieX + tieY + tieXY == n0, "pair partition broken")
    // census must be non-degenerate for the row to mean anything
    assert(conc > 0 && disc > 0 && tieXY > 0)
  }

  // --- st20: the salt actually spreads the hot key ----------------------
  // The row's oracle proves correctness (stream ≡ batch rollup); this
  // proves the POINT of the salt: phase 1 splits the hot key's rows
  // across all SaltBuckets reducers with bounded imbalance, instead of
  // funneling 3/4 of the stream through one task.
  test("st20: phase-1 salting spreads the hot key across all buckets with bounded imbalance") {
    import graft.streaming.StreamReplay
    import org.apache.spark.sql.functions._
    val keyed = StreamReplay.saltKeyed(
      Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"), col("value")))
    val phase1 = keyed
      .withColumn("__salt", pmod(
        spark_partition_id() + monotonically_increasing_id(),
        lit(StreamReplay.SaltBuckets)))
      .groupBy(col("zkey"), col("__salt"))
      .agg(count(lit(1)).as("n"))
    val hot = phase1.filter(col("zkey") === 0L)
      .select(col("__salt"), col("n")).collect()
      .map(r => r.getAs[Int]("__salt") -> r.getAs[Long]("n")).toMap
    assert(hot.keySet.size == StreamReplay.SaltBuckets,
      s"hot key hit only salts ${hot.keySet}")
    val total = hot.values.sum
    val ideal = total.toDouble / StreamReplay.SaltBuckets
    assert(hot.values.max <= ideal * 1.5,
      s"max salted partial ${hot.values.max} vs ideal $ideal — salt skewed")
    // and the skew is real: the hot key carries ~3/4 of all rows
    assert(total.toDouble / keyed.count() > 0.6)
  }

  // --- t28: tokenizer fertility must BITE on script-diverse text --------
  // The driver corpus's lang is a label over identical ASCII soup, so the
  // row's fertility is flat there by corpus construction (the r11 drop).
  // This fixture gives each lang its REAL script (BMP, pre-lowercased):
  // the [a-z]+|[0-9]+|[^a-z0-9 ] subworder emits one token per non-ASCII
  // codepoint, so fertility ~ word length for Cyrillic/Greek/Devanagari
  // and bytes-per-subword ~3 for CJK/Devanagari vs ~5-9 for ASCII words.
  test("t28: fertility spread >= 1.5x across scripts on a multi-script fixture") {
    import spark.implicits._
    val rng = new scala.util.Random(12)
    def word(alpha: IndexedSeq[Char], lo: Int, hi: Int): String =
      Seq.fill(lo + rng.nextInt(hi - lo + 1))(alpha(rng.nextInt(alpha.size)))
        .mkString
    val ascii = ('a' to 'z').toIndexedSeq
    val cyr = (0x0430 to 0x044F).map(_.toChar)
    val cjk = (0x4E00 until 0x4E00 + 512).map(_.toChar)
    val langs: Seq[(String, () => String)] = Seq(
      "en" -> (() => word(ascii, 3, 9)),
      "ru" -> (() => word(cyr, 3, 9)),
      "zh" -> (() => word(cjk, 2, 4)))
    val docs = langs.flatMap { case (lang, mk) =>
      (0 until 200).map { i =>
        val text = Seq.fill(12 + rng.nextInt(29))(mk()).mkString(" ")
        (lang.hashCode.toLong * 1000 + i, text, lang, s"src${i % 4}",
          text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.text.TextAnalysis.fertilityOf(docs).collect()
    val fert = out.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("fertility_ppm")).toMap
    val bytes = out.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("bytes_per_subword_ppm")).toMap
    assert(fert.keySet == Set("en", "ru", "zh"))
    // every ws word yields at least one subword
    assert(fert.values.forall(_ >= 1000000L), fert)
    // the contract that was degenerate on the driver corpus now bites:
    val spread = fert.values.max.toDouble / fert.values.min
    assert(spread >= 1.5, s"fertility spread $spread < 1.5 — fixture degenerate: $fert")
    // per-codepoint scripts must read MORE fertile than ASCII words
    assert(fert("ru") > fert("en") && fert("zh") > fert("en"), fert)
    // byte economy differs too: multibyte scripts pay ~2-3 bytes per
    // one-codepoint subword vs multi-char ASCII subwords
    assert(bytes("en") > bytes("zh"), bytes)
  }
}
