package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / graph analytics over the `events` clickstream and the
  * `documents` release table: link-graph centrality (PageRank), cohort
  * retention, Markov transition structure, and a k-anonymity
  * generalization audit.
  *
  * These are the analytics a crawl-curation stack runs beside the
  * LLM-data operators (SURVEY §2.4/§6): centrality is the classic
  * crawl-frontier / domain-quality prior (the public Common Crawl
  * ranking uses exactly a link-graph centrality over hosts), cohorts and
  * transition matrices are the reference's Athena-style product
  * analytics, and the k-anonymity ladder is the governance audit run
  * before a corpus release (alongside t22's PII scan and p27's
  * pseudonymization).
  *
  * Determinism discipline: every row is EXACT — all arithmetic is
  * integer (`div` in Spark ≡ `//` in DuckDB on non-negative BIGINTs),
  * window orders carry an `event_id` tiebreak, and output orders end in
  * a unique key, so the driver's value-hash compare holds bit-for-bit.
  */
object BehaviorQueries {

  type Q = (SparkSession, String) => DataFrame

  // --- g22: PageRank over the props.k page graph ------------------------

  /** Fixed power-iteration count; small because the output contract is
    * "the spec's 5th iterate", not convergence — both engines run the
    * identical integer recurrence. */
  val PageRankIters = 5

  /** Rank fixed-point scale: r₀ = 10⁹ per node. With damping 85/100 and
    * edge weights ≤ 10⁶, every intermediate product stays ≤ ~10¹⁶,
    * comfortably inside BIGINT (and never routed through a double). */
  val RankScale = 1000000000L

  /** floor(0.15 × [[RankScale]]) — the teleport term each node receives
    * per iteration. */
  val TeleportScaled = 150000000L

  /** g22: weighted PageRank over the clickstream page graph. Each user's
    * event sequence (ordered by `ts, event_id`) yields transitions
    * `page(i) → page(i+1)` where `page = props.k` (the 100-value page id
    * the synthetic feed carries); transition multiplicity is the edge
    * weight. The rank recurrence is stated EXACTLY in scaled integers —
    * r₀(v) = 10⁹; rᵢ(v) = 150 000 000 + ⌊85 × Σ_{(u,v,w)} ⌊rᵢ₋₁(u)·w /
    * outw(u)⌋ / 100⌋ — so Spark and the DuckDB oracle compute the same
    * BIGINTs with no float in the loop. Dangling pages (none in this
    * graph, but stated) keep their mass; no redistribution.
    *
    * Scale: the expensive step is building EDGES — one per-user window
    * pass over the corpus (co-partitioned by `user_id`, linear) and one
    * groupBy onto the page-pair key. The iteration itself runs over the
    * AGGREGATED graph (|pages|² ≤ 10⁴ rows here; hosts-not-pages at
    * 100 TB, still ≪ corpus), so the 5 join+agg rounds shuffle only
    * rank-table-sized frames. Edges/nodes are persisted so the loop
    * reads the windowed corpus once, not five times — exactly how the
    * production host-graph job is shaped (edge extraction ≫ iteration). */
  def g22PageRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d).select(
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("page"),
      col("ts"), col("event_id"))
    val edges = ev
      .withColumn("src", lag(col("page"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("page").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy(col("src").as("ow_src")).agg(sum(col("w")).as("outw"))
    // localCheckpoint (eager), not persist: the iterative loop re-reads
    // these small frames every pass, but a CacheManager entry would pin
    // them for the session; checkpointed blocks release with the frame.
    val ew = edges.join(outw, edges("src") === outw("ow_src"))
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .localCheckpoint(true)
    val nodes = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(RankScale).as("r"))
    for (_ <- 1 to PageRankIters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), expr("(r * w) div outw").as("c"))
      val inw = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inw"))
      ranks = nodes.join(inw, nodes("node") === inw("dst"), "left")
        .select(col("node"),
          (lit(TeleportScaled) +
            coalesce(expr("(85 * inw) div 100"), lit(0L))).as("r"))
    }
    ranks.select(col("node").as("page"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("page"))
  }

  /** The g22 oracle, generated for the same [[PageRankIters]] — one CTE
    * per iteration (a fixed unrolling rather than a recursive CTE:
    * grouped aggregation over the recursive reference is exactly what
    * SQL's recursive-term rules restrict, and an unrolled chain is
    * portable and visibly identical to the Spark loop). */
  private[queries] val PageRankOracleSql: String = {
    val base = s"""
      WITH seqd AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$$.k') AS BIGINT) AS page,
               lag(CAST(json_extract_string(props, '$$.k') AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        FROM events),
      edges AS (
        SELECT src, page AS dst, count(*) AS w
        FROM seqd WHERE src IS NOT NULL GROUP BY 1, 2),
      ew AS (
        SELECT e.src, e.dst, e.w, o.outw
        FROM edges e
        JOIN (SELECT src, sum(w) AS outw FROM edges GROUP BY 1) o USING (src)),
      nodes AS (SELECT DISTINCT src AS node FROM edges
                UNION SELECT DISTINCT dst FROM edges),
      r0 AS (SELECT node, CAST($RankScale AS BIGINT) AS r FROM nodes)"""
    val iters = (1 to PageRankIters).map { i =>
      s""",
      r$i AS (
        SELECT n.node,
               CAST(CAST($TeleportScaled AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r${i - 1} p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node)"""
    }.mkString
    base + iters + s"""
      SELECT node AS page, r AS rank_scaled
      FROM r$PageRankIters
      ORDER BY rank_scaled DESC, page"""
  }

  // --- g23: weekly cohort retention ------------------------------------

  /** g23: cohort retention matrix — users bucketed by the ISO week of
    * their FIRST event; each (cohort_week, offset_week) cell counts the
    * distinct users from that cohort active that many whole weeks later,
    * plus their event volume. The product-analytics staple the reference
    * serves from Athena.
    *
    * Scale: one groupBy(user) for first-touch, then a join back on
    * `user_id` — both sides hash-partitioned on the SAME key, so the
    * join reuses the aggregation's exchange (no extra shuffle for the
    * fact side under AQE); the final rollup is over the (weeks × offsets)
    * grid, tiny at any corpus size. distinct-user counting is exact here
    * (the oracle can state it); at 100 TB the drop-in economization is
    * `approx_count_distinct`, the q25/g07 contract shape. */
  def g23CohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        expr("datediff(day, cohort_day) div 7").as("offset_week"))
      .groupBy(col("cohort_week"), col("offset_week"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("cohort_week"), col("offset_week"))
  }

  // --- g24: event-type transition matrix --------------------------------

  /** g24: first-order Markov transition matrix over each user's event
    * sequence — counts per (prev_type → next_type) pair and the row-
    * normalized transition probability in exact parts-per-million
    * (`(n × 10⁶) div row_total`, integer on both engines — no float
    * probability to drift). The session-modeling companion to g17's
    * funnel: the funnel fixes one path, this surfaces all of them.
    *
    * Scale: one per-user window pass (co-partitioned, linear) onto a
    * |types|² aggregate; the row-total window then runs over ≤ 25 rows. */
  def g24EventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy("prev_type")))
      .withColumn("p_ppm", expr("(n * 1000000) div row_total"))
      .select(col("prev_type"), col("next_type"), col("n"), col("p_ppm"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  // --- g25: k-anonymity generalization ladder ---------------------------

  /** Classes smaller than this violate k-anonymity. */
  val KAnonK = 5L

  /** The generalization ladder for the numeric quasi-identifier:
    * candidate `n_chars` bucket widths, coarsest last. */
  val KAnonWidths: Seq[Long] = Seq(10L, 100L, 1000L)

  /** g25: k-anonymity audit over the document release table. Quasi-
    * identifiers are (lang, source, n_chars bucketed at a candidate
    * width); for each width on the generalization ladder the audit
    * reports the equivalence-class count, the smallest class, how many
    * rows sit in sub-k classes (the suppression cost of releasing at
    * that width), and whether the width achieves k-anonymity outright —
    * the table a release manager picks the minimal safe generalization
    * from. Complements t22 (PII content scan) and p27 (pseudonymization):
    * those fix VALUES, this audits LINKABILITY.
    *
    * Scale: one scan with a 3-way width explode (an Expand, ×|ladder|)
    * into a single hash aggregate on the class key, then a |ladder|-row
    * rollup — no joins, no driver data. At 100 TB the Expand factor is
    * the ladder length (3), constant, and partial aggregation collapses
    * each class before the exchange. */
  def g25KAnonymity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"),
        explode(array(KAnonWidths.map(lit): _*)).as("width"))
      .groupBy(col("width"), col("lang"), col("source"),
        expr("n_chars div width").as("bucket"))
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy(col("width"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < KAnonK, col("class_size"))
          .otherwise(lit(0L))).as("n_rows_suppressed"),
        (min(col("class_size")) >= KAnonK).as("achieves_k"))
      .orderBy(col("width"))
  }

  // --- g26: chi-square independence test --------------------------------

  /** χ² critical value at α = 0.05, dof = (5−1)(7−1) = 24 — the fixed
    * decision threshold for this contingency shape. */
  val ChiSqCrit24 = 36.415

  /** g26: Pearson chi-square independence test over the event_type ×
    * ISO-weekday contingency table — per event type its χ² contribution,
    * the table-level statistic, and the α=0.05 verdict. The statistical
    * companion to g03's drift monitor: drift panels SCORE a divergence,
    * this TESTS one (is behavior weekday-dependent at all?).
    *
    * Determinism discipline: observed counts aggregate exactly; expected
    * values and per-cell terms are doubles computed by the IDENTICAL
    * expression text in both engines from identical integers (BIGINT `/`
    * is float division in both), then each cell's term is micro-scaled
    * to BIGINT before any multi-cell SUM — the p16 order-free idiom, so
    * no parallel-double-sum order can flip a rounded digit. Weekday is
    * ISO (1 = Monday) on both engines (`weekday(ts)+1` ≡ `isodow(ts)`).
    *
    * Scale: one scan into a 35-cell aggregate; every window/join after
    * the rollup runs over ≤ 35 rows. */
  def g26ChiSquare(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .groupBy(col("event_type"), expr("weekday(ts) + 1").as("dow"))
      .agg(count(lit(1)).as("o"))
    val tot = cells.agg(
      count_distinct(col("event_type")).as("n_types"),
      count_distinct(col("dow")).as("n_dows"))
    val withTot = cells
      .withColumn("row_tot", sum(col("o")).over(Window.partitionBy("event_type")))
      .withColumn("col_tot", sum(col("o")).over(Window.partitionBy("dow")))
      .withColumn("n_tot", sum(col("o")).over(Window.partitionBy()))
      .withColumn("term_micros", expr(
        """CAST(round(pow(o - (row_tot * col_tot) / n_tot, 2)
          |     / ((row_tot * col_tot) / n_tot) * 1000000) AS BIGINT)""".stripMargin))
    withTot
      .groupBy(col("event_type"))
      .agg(sum(col("o")).as("n"), sum(col("term_micros")).as("part_micros"))
      .withColumn("chi2_part",
        round(col("part_micros") / lit(1000000.0), 6))
      .withColumn("chi2_total",
        round(sum(col("part_micros")).over(Window.partitionBy())
          / lit(1000000.0), 6))
      .crossJoin(broadcast(tot))
      .withColumn("dof", (col("n_types") - 1) * (col("n_dows") - 1))
      .withColumn("is_dependent",
        col("chi2_total") > lit(ChiSqCrit24) && col("dof") === lit(24L))
      .select(col("event_type"), col("n"), col("chi2_part"),
        col("chi2_total"), col("dof"), col("is_dependent"))
      .orderBy(col("event_type"))
  }

  // --- g27: autocorrelation of the hourly event series -------------------

  /** ACF lags probed: adjacent hours, short horizons, and the daily
    * seasonality lag (24). */
  val AcfLags: Seq[Int] = Seq(1, 2, 3, 6, 12, 24)

  /** g27: sample autocorrelation of the DENSIFIED hourly event-count
    * series at the [[AcfLags]] horizons — the seasonality diagnostic
    * behind g06's anomaly window (a lag-24 spike says "daily cycle";
    * near-zero everywhere says the trailing-24h baseline is the right
    * model). Standard estimator r_k = Σ(n_t−μ)(n_{t+k}−μ) / Σ(n_t−μ)².
    *
    * Determinism discipline: the estimator is expanded so that BOTH the
    * numerator and denominator are single BIGINT expressions over exact
    * integer aggregates — with S = Σn, N = #hours, A_k = Σ n_t·n_{t+k},
    * B_k/C_k the truncated sums over each pair's ends:
    * num_k·N² = A_k·N² − S·N·(B_k+C_k) + (N−k)·S², and
    * den·N² = N²·Σn² − N·S² — so r_k is ONE double division of two
    * identically-computed BIGINTs, no floating-point accumulation
    * anywhere. (At feeds where n·N overflows 2⁶³ the same algebra rides
    * DECIMAL/HUGEINT; stated here for the journal-scale frame.)
    *
    * Scale: the corpus collapses to the hourly aggregate first (one
    * scan, one shuffle); the series frame (8,760 rows/year), the grid
    * densify, the lag self-join, and the final per-lag rollup are all
    * bounded by HOURS, not events — the g06 justification. */
  def g27Acf(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val grid = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
        .as("h"))
    val dense = grid.join(hourly, Seq("h"), "left")
      .select(unix_micros(col("h")).as("hu"),
        coalesce(col("n"), lit(0L)).as("n"))
    val tot = dense.agg(sum(col("n")).as("s"), count(lit(1)).as("nn"),
      sum(col("n") * col("n")).as("s2"))
    val lags = dense.select(col("hu"), col("n"),
      explode(array(AcfLags.map(lit): _*)).as("lag"))
    val h2 = dense.select(col("hu").as("hu2"), col("n").as("n2"))
    val pairs = lags.join(h2,
        col("hu2") === col("hu") + col("lag").cast("long") * lit(3600000000L))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n") * col("n2")).as("a"),
        sum(col("n")).as("b"),
        sum(col("n2")).as("c"))
    pairs.crossJoin(broadcast(tot))
      .withColumn("num", col("a") * col("nn") * col("nn")
        - col("s") * col("nn") * (col("b") + col("c"))
        + (col("nn") - col("lag")) * col("s") * col("s"))
      .withColumn("den", col("nn") * col("nn") * col("s2")
        - col("nn") * col("s") * col("s"))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast("double") / col("den"), 6).as("acf"))
      .orderBy(col("lag"))
  }

  // --- g28: Benford first-digit audit ------------------------------------

  /** Mean-absolute-deviation conformity threshold in ppm — Nigrini's
    * "close conformity" band (MAD < 0.006) in the integer scale. */
  val BenfordMadPpm = 6000L

  /** g28: Benford's-law first-digit audit over the event `value` column —
    * the classic fabricated-data / unit-mix screen run beside g01's rule
    * gates: observed first-significant-digit shares vs log₁₀(1+1/d),
    * with the per-digit deviation and Nigrini's MAD verdict. (The
    * synthetic feed is uniform-ish, so the audit SAYS non-conformant —
    * the point is the audit, not the corpus passing it.)
    *
    * Determinism: the first digit is taken from the INTEGER cents
    * (`round(value·100)`) rendered as a string — never from
    * `floor(log10(value))`, whose boundary cells (exact powers of ten)
    * can round differently across engines; shares are exact ppm
    * integers; the Benford expectation is the identical literal
    * `round(log10(1 + 1/d)·10⁶)` on both sides. One scan, a ≤ 9-row
    * aggregate, window rollups over that frame. */
  def g28Benford(s: SparkSession, d: String): DataFrame = {
    val observed = Tables.events(s, d)
      .select(round(col("value") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // densify to all nine bins: an absent digit's deviation from its
    // Benford share must count, not silently vanish
    val grid = s.range(1, 10).select(col("id").cast("int").as("digit"))
    grid.join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("freq_ppm", expr("(n * 1000000) div total"))
      .withColumn("expected_ppm",
        expr("CAST(round(log10(1 + 1/digit) * 1000000) AS BIGINT)"))
      .withColumn("dev_ppm", abs(col("freq_ppm") - col("expected_ppm")))
      .withColumn("mad_ppm",
        expr("sum(dev_ppm) OVER () div 9"))
      .withColumn("conforms", col("mad_ppm") < lit(BenfordMadPpm))
      .select(col("digit"), col("n"), col("freq_ppm"), col("expected_ppm"),
        col("dev_ppm"), col("mad_ppm"), col("conforms"))
      .orderBy(col("digit"))
  }

  // --- g29: sequential conversion funnel ---------------------------------

  /** The ordered funnel steps — each must happen at-or-after the
    * previous step's FIRST qualifying occurrence. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "signup", "purchase")

  /** g29: the sequential conversion funnel — for each step k, the number
    * of users whose event history contains the ORDERED chain
    * step₁ ≤ … ≤ stepₖ (each step's timestamp at-or-after the previous
    * step's earliest qualifying time). This is the temporal-order funnel
    * p10's gate-counting cannot express (a user with purchase-then-view
    * is NOT a converted user here) — the product-analytics panel Athena
    * serves on the reference's event lake.
    *
    * Semantics pinned exactly: t₁ = min ts of step 1; tₖ = min ts of
    * step k with ts ≥ tₖ₋₁ (inclusive — a same-microsecond follow-up
    * counts). Nulls propagate: a user missing step k has null tₖ₊₁…
    * Conversion ratios are integer ppm (`div`), so the row is exact.
    *
    * Scale: one chain of |steps| left-joins + min-aggregations, ALL
    * keyed on `user_id` — a single hash-partitioning reused down the
    * chain, each frame ≤ one row per user; the final rollup is one
    * 4-counter aggregate stacked into the funnel table. No windows over
    * the raw corpus, no cross joins. */
  def g29EventFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    var acc = ev.filter(col("event_type") === FunnelSteps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    for (i <- 1 until FunnelSteps.length) {
      val st = ev.filter(col("event_type") === FunnelSteps(i))
        .select(col("user_id").as("su"), col("ts").as("sts"))
      val carried = (0 until i).map(j => col(s"t$j"))
      acc = acc.join(st,
          acc("user_id") === st("su") && col("sts") >= col(s"t${i - 1}"),
          "left")
        .groupBy(col("user_id") +: carried: _*)
        .agg(min(col("sts")).as(s"t$i"))
    }
    acc.agg(count(col("t0")).as("n0"), count(col("t1")).as("n1"),
        count(col("t2")).as("n2"), count(col("t3")).as("n3"))
      .selectExpr(
        s"""stack(4,
             0, '${FunnelSteps(0)}', n0, CAST(1000000 AS BIGINT),
                CAST(1000000 AS BIGINT),
             1, '${FunnelSteps(1)}', n1,
                CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n1 * 1000000) div n0 END,
                CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n1 * 1000000) div n0 END,
             2, '${FunnelSteps(2)}', n2,
                CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n2 * 1000000) div n0 END,
                CASE WHEN n1 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n2 * 1000000) div n1 END,
             3, '${FunnelSteps(3)}', n3,
                CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n3 * 1000000) div n0 END,
                CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT)
                     ELSE (n3 * 1000000) div n2 END)
           AS (step_idx, step, n_users, conv_top_ppm, conv_prev_ppm)""")
      .orderBy(col("step_idx"))
  }

  // --- g30: Mann–Whitney rank-sum test ------------------------------------

  /** g40's x-axis bucket width over the cents key: values span ≤ ~5×10⁴
    * cents → ≤ ~192 x-buckets; with the 24-hour y-domain the dense grid
    * is ≤ ~4.6 k cells, INDEPENDENT of corpus size. */
  val KendallXBucket = 256L

  /** Hard ceiling on g40's dense grid (VERDICT r12: the "bounded axes"
    * premise was derived from the value domain but never asserted — a
    * corpus with values ≫ 5×10⁴ cents would silently grow the grid the
    * whole prefix-sum construction rests on). ~3.5× the current-domain
    * 4.6 k cells; a wide-domain corpus fails loudly with the re-bucket
    * instruction instead of degrading. */
  val KendallMaxCells = 16384L

  /** g40: Kendall τ-b rank correlation between bucketed spend and
    * hour-of-day — the tie-robust monotone-dependence statistic a data
    * board asks for ("do high-value events cluster late in the day?").
    * The naive statistic is an O(N²) pair census — infeasible at 100 TB
    * and the reason τ is usually approximated. Over BOUNDED discrete
    * axes it is EXACT and linear: reduce the corpus to a (x-bucket,
    * hour) contingency census (one map-side-combinable groupBy — the
    * only pass over data), densify onto the bounded grid (missing cells
    * carry n = 0 so prefix sums are total), and count concordant /
    * discordant pairs by 2-D prefix sums: cum_lt_x(x,y) = Σ_{x'<x}
    * n(x',y) (window by y over x), then ll(x,y) = Σ_{y'<y} cum_lt_x
    * (window by x over y) — every concordant pair is counted exactly
    * once at its higher-y cell as n·ll, discordant as n·gl with the
    * column-total complement. Ties come off the axis marginals. All
    * integers end-to-end; the ONLY floating point is the final
    * τ-b = (C−D)/√((n0−Tx)(n0−Ty)) evaluated on identical BIGINTs in
    * both engines (g30's shared-expression discipline). Windows are
    * partitioned by the OPPOSITE axis — never partition-less. */
  /** The (spend-bucket, hour) contingency census shared by g40 and g41 —
    * ONE corpus pass (map-side-combinable groupBy), eagerly
    * checkpointed, with the grid-premise guard (bounded driver-side
    * aggregate off the checkpoint — one scalar): both constructions are
    * linear ONLY while the dense grid stays domain-bounded. */
  private def rankGridCells(s: SparkSession, d: String, who: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select(
        expr(s"CAST(round(value * 100) AS BIGINT) div $KendallXBucket").as("xb"),
        hour(col("ts")).cast("long").as("yb"))
      .groupBy(col("xb"), col("yb")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val nxb = cells.agg(countDistinct(col("xb"))).first().getLong(0)
    require(nxb * 24 <= KendallMaxCells,
      s"$who grid premise broken: $nxb x-buckets x 24 hours > " +
        s"$KendallMaxCells cells — widen KendallXBucket for this value domain")
    cells
  }

  def g40KendallTau(s: SparkSession, d: String): DataFrame = {
    val cells = rankGridCells(s, d, "g40")
    val grid = cells.select(col("xb")).distinct()
      .crossJoin(broadcast(s.range(0, 24).toDF("yb")))
    val dense = grid.join(cells, Seq("xb", "yb"), "left")
      .select(col("xb"), col("yb"), coalesce(col("n"), lit(0L)).as("n"))
    val wX = Window.partitionBy(col("yb")).orderBy(col("xb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wColTot = Window.partitionBy(col("yb"))
    val cum = dense
      .withColumn("cum_lt_x", coalesce(sum(col("n")).over(wX), lit(0L)))
      .withColumn("gt_x",
        sum(col("n")).over(wColTot) - col("cum_lt_x") - col("n"))
    val wY = Window.partitionBy(col("xb")).orderBy(col("yb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cd = cum
      .withColumn("ll", coalesce(sum(col("cum_lt_x")).over(wY), lit(0L)))
      .withColumn("gl", coalesce(sum(col("gt_x")).over(wY), lit(0L)))
      .agg(sum(col("n") * col("ll")).as("conc"),
        sum(col("n") * col("gl")).as("disc"),
        sum(col("n")).as("n_total"))
    val tieX = cells.groupBy(col("xb")).agg(sum(col("n")).as("nx"))
      .agg(sum(expr("nx * (nx - 1) div 2")).as("tie_x"))
    val tieY = cells.groupBy(col("yb")).agg(sum(col("n")).as("ny"))
      .agg(sum(expr("ny * (ny - 1) div 2")).as("tie_y"))
    cd.crossJoin(broadcast(tieX)).crossJoin(broadcast(tieY))
      .withColumn("n0", expr("n_total * (n_total - 1) div 2"))
      .select(col("n_total"), col("conc"), col("disc"),
        col("tie_x"), col("tie_y"), col("n0"),
        // degenerate constant-axis guard (ADVICE r12): a 0 divisor is
        // NULL in Spark but a round(inf)-cast error in DuckDB — emit
        // NULL explicitly on BOTH sides (the t11/g39 kappa rule)
        expr("CASE WHEN n0 = tie_x OR n0 = tie_y THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round((conc - disc) / sqrt(CAST(n0 - tie_x AS DOUBLE) " +
          "* CAST(n0 - tie_y AS DOUBLE)) * 1000000) AS BIGINT) END")
          .as("tau_b_micros"))
  }

  /** g41's overflow bound: centered doubled midranks satisfy |dx2| ≤ N,
    * so each of the three BIGINT sums is ≤ N³ — exact in 64 bits up to
    * N ≈ 2.1 M points. Beyond that the SAME construction auto-lifts to
    * DECIMAL(38,0) sums (round 14 — the r13 require is now a branch;
    * products are cast per-FACTOR so no BIGINT intermediate ever forms;
    * decimal bound ~4.6×10¹² points from 4N³ ≤ 10³⁸). The BIGINT form
    * stays the default because integer-sum equality is the repo's
    * cross-engine discipline and every committed corpus is ≪ the bound;
    * RoundFourteenOpsSpec proves sum equality across the lift boundary
    * and BigInt-exactness of the lifted sums on a >2 M-point frame. */
  val SpearmanMaxN = 2000000L

  /** g41: Spearman rank correlation (tie-aware, midranks) between
    * bucketed spend and hour-of-day — g40's companion statistic (ρ
    * answers "how monotone is the relationship" on rank VALUES where
    * τ-b counts pair ORDER; an analyst asks for both). The textbook
    * computation global-sorts the corpus twice to assign ranks —
    * a full-shuffle sort per axis at 100 TB. Over the SAME bounded
    * contingency grid as g40 it is exact and linear with NO global
    * sort over data: midranks come off the two marginals (≤ ~192 and
    * 24 rows), broadcast back onto the grid cells, and ρ is Pearson
    * over per-point midranks. All integers: the doubled midrank
    * 2·cum_before + n_bucket + 1 is an odd BIGINT (the g30 trick), its
    * centered form dx2 = 2·cum + n − N has Σ n·dx2 = 0 EXACTLY (the
    * spec's identity), and the three sums Σ n·dx2·dy2 / Σ n·dx2² /
    * Σ n·dy2² are BIGINTs the one FP division reads identically in
    * both engines (the factor 2² cancels). Constant-axis degeneracy
    * (sxx or syy = 0) is NULL on both sides — g40's lesson applied
    * from the start. The marginal windows are partition-less over
    * DOMAIN-bounded frames (≤ [[KendallMaxCells]]/24 and 24 rows —
    * GlobalWindowBoundSpec-allowlisted with that derivation bound). */
  def g41SpearmanRho(s: SparkSession, d: String): DataFrame = {
    val cells = rankGridCells(s, d, "g41")
    // one scalar off the checkpoint (same discipline as the grid-premise
    // require) picks the representation: BIGINT-exact up to SpearmanMaxN,
    // DECIMAL(38,0) beyond — the r13 require, now a branch
    val nTotal = cells.agg(sum(col("n"))).first().getLong(0)
    spearmanOverCells(cells, lift = nTotal > SpearmanMaxN)
  }

  /** g41's computation over an arbitrary (xb, yb, n) contingency frame —
    * factored so RoundFourteenOpsSpec can drive the DECIMAL lift on a
    * synthetic >2 M-point frame and prove sum equality across the lift
    * boundary. `lift = true` computes the three rank sums (and the two
    * zero-identity sums) in DECIMAL(38,0), casting each FACTOR before any
    * multiply so no 64-bit intermediate can overflow; the rho division
    * reads identically in both branches (sums → DOUBLE either way). */
  private[graft] def spearmanOverCells(cells: DataFrame, lift: Boolean): DataFrame = {
    def marginal(axis: String): DataFrame = {
      val w = Window.orderBy(col(axis))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells.groupBy(col(axis)).agg(sum(col("n")).as("nm"))
        .withColumn("cum", coalesce(sum(col("nm")).over(w), lit(0L)))
    }
    val mx = marginal("xb").select(col("xb"),
      (lit(2L) * col("cum") + col("nm")).as("rx2n")) // dx2 + N (N joins later)
    val my = marginal("yb").select(col("yb"),
      (lit(2L) * col("cum") + col("nm")).as("ry2n"))
    val n = cells.agg(sum(col("n")).as("n_total"))
    def t(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (lift) c.cast("decimal(38,0)") else c
    cells
      .join(broadcast(mx), "xb")
      .join(broadcast(my), "yb")
      .crossJoin(broadcast(n))
      .select(col("n"), col("n_total"),
        (col("rx2n") - col("n_total")).as("dx2"),
        (col("ry2n") - col("n_total")).as("dy2"))
      .groupBy(col("n_total"))
      .agg(sum(t(col("n")) * t(col("dx2")) * t(col("dy2"))).as("sxy"),
        sum(t(col("n")) * t(col("dx2")) * t(col("dx2"))).as("sxx"),
        sum(t(col("n")) * t(col("dy2")) * t(col("dy2"))).as("syy"),
        sum(t(col("n")) * t(col("dx2"))).as("zero_x"),
        sum(t(col("n")) * t(col("dy2"))).as("zero_y"))
      .select(col("n_total"), col("sxy"), col("sxx"), col("syy"),
        col("zero_x"), col("zero_y"),
        expr("CASE WHEN sxx = 0 OR syy = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round(CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * " +
          "CAST(syy AS DOUBLE)) * 1000000) AS BIGINT) END").as("rho_micros"))
  }

  /** The two samples compared by g30: does spend (`value`) distribute
    * differently across these event types? */
  val RankSumA = "purchase"
  val RankSumB = "click"

  /** g30 prefix-sum bucket width over the cents key (value ≤ ~6×10⁴
    * cents in this domain → ≤ ~16 buckets; the bucket count is bounded
    * by the VALUE DOMAIN, not the corpus). */
  val RankSumBucket = 4096L

  /** The z-statistic under the normal approximation with tie correction,
    * as ONE shared expression string over the aggregate columns
    * (n_a, n_b, r2a, tie_term) — Spark `selectExpr` and the DuckDB
    * oracle evaluate the identical IEEE-double formula on identical
    * BIGINT inputs, so the doubles agree bit-for-bit.
    * z = (2U_A − n_A·n_B) / √(n_A·n_B·((N+1) − T/(N(N−1)))/3), where
    * 2U_A = 2R_A − n_A(n_A+1) and T = Σ(t³−t) over tie groups. */
  private val RankSumZSql: String =
    "(r2a - n_a * (n_a + 1) - n_a * n_b) / " +
      "sqrt(CAST(n_a AS DOUBLE) * n_b * ((n_a + n_b + 1.0) - " +
      "CAST(tie_term AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * " +
      "(n_a + n_b - 1.0))) / 3.0)"

  /** g30: the Mann–Whitney U (Wilcoxon rank-sum) test — the
    * nonparametric two-sample comparison a metrics pipeline runs when
    * spend distributions are skewed and a t-test's normality assumption
    * fails (the A/B-test screen beside g26's categorical independence
    * test). Values are keyed as integer cents; tied values take
    * midranks, carried THROUGHOUT in the doubled integer scale
    * (rank2 = 2·|{< v}| + t_v + 1 — an odd integer for any tie group),
    * so R_A, U_A, and the tie term are exact BIGINTs on both engines;
    * only the final z-score touches doubles, via the one shared
    * [[RankSumZSql]] expression.
    *
    * Scale: the corpus collapses to ONE row per distinct cents value
    * first (domain-bounded, like g28's digit frame); the global
    * rank prefix sum runs the p32 two-level decomposition — an
    * intra-bucket running sum windowed BY [[RankSumBucket]] bucket,
    * exclusive bucket offsets over the bucket frame, broadcast back —
    * never a value-table-on-one-partition global window. The final
    * statistic is a single scalar aggregate. */
  def g30RankSum(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .filter(col("event_type").isin(RankSumA, RankSumB))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        when(col("event_type") === RankSumA, 1L).otherwise(0L).as("isa"))
      .groupBy(col("cents"))
      .agg(sum(col("isa")).as("na"), count(lit(1)).as("n"))
      .withColumn("bkt", expr(s"cents div $RankSumBucket"))
    val wIntra = Window.partitionBy(col("bkt")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = per
      .withColumn("c_in", coalesce(sum(col("n")).over(wIntra), lit(0L)))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = per.groupBy(col("bkt")).agg(sum(col("n")).as("bsum"))
      .withColumn("off", coalesce(sum(col("bsum")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("off"))
    intra.join(broadcast(offs), "bkt")
      .withColumn("rank2",
        lit(2L) * (col("off") + col("c_in")) + col("n") + lit(1L))
      .agg(sum(col("na")).as("n_a"), sum(col("n") - col("na")).as("n_b"),
        sum(col("na") * col("rank2")).as("r2a"),
        sum(col("n") * col("n") * col("n") - col("n")).as("tie_term"))
      .selectExpr("n_a", "n_b",
        "r2a - n_a * (n_a + 1) AS u2_a",
        "2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS u2_b",
        "tie_term",
        s"CAST(round(($RankSumZSql) * 1000000) AS BIGINT) AS z_micros",
        s"abs($RankSumZSql) > 1.96 AS significant")
  }

  // --- g31: triangle counting / clustering coefficient --------------------

  /** g31: exact triangle counting over the undirected page graph (edges
    * = g22's observed transitions, collapsed + deduplicated) with the
    * global clustering coefficient — the graph-cohesion audit beside
    * g22's centrality (for a crawl host graph: how clique-ish is the
    * link neighborhood — a spam-farm / link-ring signal).
    *
    * Algorithm: the standard degree-ordered orientation (the MapReduce
    * triangle count of Suri–Vassilvitskii '11): each undirected edge is
    * directed from its (degree, id)-smaller endpoint to the larger, so
    * every triangle is counted exactly once and the join fan-out per
    * node is bounded by its ORIENTED out-degree — O(√m) per node on any
    * graph, which is what makes the self-join survive skew (a celebrity
    * node's edges all point outward from its low-degree neighbors).
    * Wedges w(a→b→c) come from one hash self-join; each closes iff
    * (a→c) exists — a second hash join. The clustering coefficient
    * 3·Δ/wedges is integer ppm.
    *
    * Scale: edge extraction is the g22 per-user window pass; degrees
    * and orientation are edge-keyed aggregates/joins; nothing touches
    * the raw corpus twice, and no join is ever node×node. */
  def g31Triangles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d).select(
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("page"),
      col("ts"), col("event_id"))
    val edges = ev.withColumn("src", lag(col("page"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("page"))
      .select(least(col("src"), col("page")).as("u"),
        greatest(col("src"), col("page")).as("v"))
      .distinct().localCheckpoint(true)
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = edges.join(broadcast(du), "u").join(broadcast(dv), "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("a"),
        when(fwd, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint(true)
    val e2 = oriented.select(col("a").as("b2"), col("b").as("c"))
    val closing = oriented.select(col("a").as("ca"), col("b").as("cb"))
    val tri = oriented.join(e2, col("b") === col("b2"))
      .join(closing, col("a") === col("ca") && col("c") === col("cb"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val ecount = edges.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(ecount).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (3 * n_triangles * 1000000) div n_wedges END")
          .as("clustering_ppm"))
  }

  // --- g32: Kolmogorov–Smirnov two-sample test ---------------------------

  /** The KS significance verdict at α = 0.05 as ONE shared expression
    * string over the exact BIGINT aggregates (g30's [[RankSumZSql]]
    * idiom): D > c(α)·√((n_A+n_B)/(n_A·n_B)) with c(0.05) = 1.3581 —
    * identical IEEE-double evaluation on identical integers in both
    * engines, so the boolean and the micro-scaled statistic agree
    * bit-for-bit. */
  private val KsStatSql: String =
    "CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
  private val KsCritSql: String =
    "1.3581 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / " +
      "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"

  /** g32: the Kolmogorov–Smirnov two-sample test over the same
    * purchase-vs-click spend split as g30 — the SHAPE-sensitive
    * companion (KS sees any CDF divergence: location, scale, tails;
    * Mann–Whitney sees stochastic dominance only; g26 sees categorical
    * association). The drift screen a curation pipeline runs when two
    * corpus slices should be exchangeable.
    *
    * Exactness: D = sup|F_A − F_B| is evaluated in the cross-multiplied
    * integer frame — D_scaled = max|cumA·n_B − cumB·n_A| over the
    * pooled distinct cents values — so the supremum, its argmax, and
    * d_ppm = D_scaled·10⁶ div (n_A·n_B) are exact BIGINTs (the ppm
    * scaling is valid to n_A·n_B ≤ 9.2×10¹²; past that, emit the shared
    * double only). Only the significance verdict touches doubles, via
    * the one shared [[KsStatSql]]/[[KsCritSql]] expression pair.
    *
    * Scale: the corpus collapses to one row per distinct cents value
    * first (domain-bounded, g28's frame); the inclusive CDF prefix sums
    * run the p32/g30 two-level bucket decomposition — never a
    * value-table-on-one-partition global window; D is one scalar
    * aggregate over that bounded frame. */
  def g32KsTest(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .filter(col("event_type").isin(RankSumA, RankSumB))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        when(col("event_type") === RankSumA, 1L).otherwise(0L).as("isa"))
      .groupBy(col("cents"))
      .agg(sum(col("isa")).as("na"), count(lit(1)).as("n"))
      .withColumn("nb", col("n") - col("na"))
      .withColumn("bkt", expr(s"cents div $RankSumBucket"))
    val wIntra = Window.partitionBy(col("bkt")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = per
      .withColumn("ia", sum(col("na")).over(wIntra))
      .withColumn("ib", sum(col("nb")).over(wIntra))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = per.groupBy(col("bkt"))
      .agg(sum(col("na")).as("ba"), sum(col("nb")).as("bb"))
      .withColumn("offa", coalesce(sum(col("ba")).over(wBkt), lit(0L)))
      .withColumn("offb", coalesce(sum(col("bb")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("offa"), col("offb"))
    val totals = per.agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
    intra.join(broadcast(offs), "bkt")
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs((col("offa") + col("ia")) * col("n_b") -
          (col("offb") + col("ib")) * col("n_a")).as("gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("gap")).as("d_scaled"))
      .selectExpr("n_a", "n_b", "d_scaled",
        "(d_scaled * 1000000) div (n_a * n_b) AS d_ppm",
        s"CAST(round(($KsStatSql) * 1000000) AS BIGINT) AS d_micros",
        s"($KsStatSql) > ($KsCritSql) AS significant")
  }

  // --- g33: Gini concentration of document mass per source ---------------

  /** g33: the Lorenz/Gini concentration audit — per source, how
    * unequally is character mass distributed across documents? The
    * mixture-design read beside g09's token panel and p13's source-mix
    * rates: a source whose mass sits in a few giant documents (gini →
    * 1) contributes far less DIVERSITY per token than its row count
    * suggests, and chunking/packing (t13/p21) behave very differently
    * on it than on a uniform source (gini → 0).
    *
    * Exactness: Gini = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the
    * ascending length order — computed WITHOUT materializing ranks:
    * after collapsing to one row per (source, n_chars), a tie-group of
    * c docs at value v with C predecessors contributes
    * v·(c·C + c·(c+1)/2) to Σᵢ i·x₍ᵢ₎ (the sum is tie-order invariant,
    * so no tiebreak is ever needed); everything through the ppm result
    * is BIGINT (`div` ≡ `//`). Mean length rides along exact.
    *
    * Scale: one corpus scan → a (source, n_chars) aggregate bounded by
    * sources × length domain (g28's frame); the predecessor count is a
    * per-source window over that BOUNDED frame, not the corpus; the
    * rollup is #sources rows. At extreme corpus scale Σ i·x overflows
    * 64 bits near n·v ≈ 10¹⁸ — shard the sum by length bucket (p32's
    * decomposition) before widening, noted here because the toy SF
    * never approaches it. */
  def g33GiniConcentration(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("cpred", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("contrib",
        col("v") * (col("c") * col("cpred") +
          expr("(c * (c + 1)) div 2")))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("v") * col("c")).as("total_chars"),
        sum(col("contrib")).as("rank_mass"))
      .selectExpr("source", "n_docs", "total_chars",
        "total_chars div n_docs AS mean_chars",
        "CASE WHEN n_docs = 0 OR total_chars = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE ((2 * rank_mass - (n_docs + 1) * total_chars) * 1000000) " +
          "div (n_docs * total_chars) END AS gini_ppm")
      .orderBy(col("source"))
  }

  // --- g35: Theil inequality decomposition --------------------------------

  /** g35's per-cell within-group term and per-source between-group term,
    * as shared expression strings over exact BIGINT aggregates (g26's
    * micro-scale-then-sum discipline): each CELL rounds to integer
    * micros BEFORE any multi-cell sum, so no parallel-double summation
    * order can flip a digit — the integer sums are then order-free and
    * engine-identical. The statistic is thereby DEFINED as the sum of
    * per-cell micro-rounded terms (within ±0.5 µ per cell of true
    * Theil; the spec bounds the drift against an unrounded rebuild). */
  private val TheilCellSql: String =
    "CAST(round(CAST(c AS DOUBLE) * CAST(v AS DOUBLE) / CAST(s_g AS DOUBLE)" +
      " * ln(CAST(v AS DOUBLE) * CAST(n_g AS DOUBLE) / CAST(s_g AS DOUBLE))" +
      " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
  private val TheilBetweenSql: String =
    "CAST(round(CAST(s_g AS DOUBLE) / CAST(s_tot AS DOUBLE)" +
      " * ln(CAST(s_g AS DOUBLE) * CAST(n_tot AS DOUBLE) /" +
      " (CAST(n_g AS DOUBLE) * CAST(s_tot AS DOUBLE)))" +
      " * CAST(1000000 AS DOUBLE)) AS BIGINT)"

  /** g35: the Theil T inequality index with its between/within-source
    * decomposition — the property that makes Theil (not g33's Gini) the
    * mixture-design tool: T = T_between + Σ_g (s_g/S)·T_within,g
    * EXACTLY, so the panel says how much of the corpus's length
    * inequality is "sources differ from each other" (fixable by p13/p18
    * mixing weights) vs "documents differ within a source" (fixable
    * only by per-doc curation like p15 caps). Gini does not decompose;
    * this is the standard companion audit.
    *
    * Exactness: the corpus collapses to the (source, n_chars) frame
    * (g33's); within-cell terms (c/n_g)·(v·n_g/s_g)·ln(v·n_g/s_g) =
    * (c·v/s_g)·ln(v·n_g/s_g) and the between term
    * (s_g/S)·ln(μ_g/μ) each evaluate through ONE shared expression on
    * identical BIGINTs and round to integer micros per cell before
    * summation — the g26 discipline — so both engines emit identical
    * integers.
    *
    * Scale: identical to g33 — one scan, a bounded (source × length-
    * domain) frame, per-source and global rollups derived from that
    * frame (no second scan), #sources output rows. */
  def g35Theil(s: SparkSession, d: String): DataFrame = {
    // the bounded (source × length-domain) frame feeds the per-source
    // rollup AND the within-term sum: eagerly localCheckpoint it so the
    // corpus scan runs once (g22 edges precedent) without leaving a
    // session-lifetime CacheManager entry behind.
    val per = Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .groupBy(col("source"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bySrc = per.groupBy(col("source"))
      .agg(sum(col("c")).as("n_g"), sum(col("v") * col("c")).as("s_g"))
    val glob = bySrc.agg(sum(col("n_g")).as("n_tot"),
      sum(col("s_g")).as("s_tot"))
    val within = per.join(broadcast(bySrc), "source")
      .selectExpr("source", s"$TheilCellSql AS cell_micros")
      .groupBy(col("source"))
      .agg(sum(col("cell_micros")).as("theil_within_micros"))
    bySrc.join(within, "source")
      .crossJoin(broadcast(glob))
      .selectExpr("source", "n_g AS n_docs", "s_g AS total_chars",
        "theil_within_micros",
        s"$TheilBetweenSql AS between_term_micros",
        "(s_g * 1000000) div s_tot AS weight_ppm")
      .orderBy(col("source"))
  }

  // --- g36: CUSUM drift alarm ---------------------------------------------

  /** g36 allowance and decision threshold, as integer fractions of the
    * frame's own mean hourly rate μ: allowance k = μ + μ/4 (alarm only
    * on sustained >25 % elevation), threshold h = 4·μ (≈ the classic
    * h = 4σ tuning when counts are Poisson-ish, σ ≈ √μ ≤ μ). Both land
    * in micro-units via integer division, so the whole statistic is
    * BIGINT-exact. */
  val CusumSlackDenom = 4L
  val CusumHFactor = 4L

  /** g36: the one-sided CUSUM drift alarm over the densified hourly
    * event series — the SEQUENTIAL change detector beside g06's
    * pointwise z-score (a z-score sees one loud hour; CUSUM accumulates
    * a persistent small elevation until it crosses h — the "slow leak"
    * alarm a pipeline wants for gradual feed drift, SDP.py's alarms rule
    * generalized). Silent hours densify to zero exactly as g06/g27, so
    * a gap RESETS the statistic rather than hiding.
    *
    * The recursion S_t = max(0, S_{t-1} + x_t − k) is not a window
    * function — the standard trap is a driver loop. It IS, however,
    * exactly expressible as windows via the prefix identity
    * S_t = Y_t − min(0, min_{j≤t} Y_j) with Y_t = Σ_{i≤t}(x_i − k): a
    * running sum and a running min over the SAME ordered frame — two
    * windows, no recursion, no driver loop. All arithmetic in integer
    * micro-units (k = (N·10⁶ div H)·(1 + 1/[[CusumSlackDenom]]) exact),
    * so both engines emit identical BIGINTs.
    *
    * Scale: the corpus collapses to the hourly aggregate first; the
    * windows run over the CALENDAR-bounded hourly frame (g27's
    * argument), never the corpus. */
  def g36Cusum(s: SparkSession, d: String): DataFrame = {
    // the hourly frame feeds the grid bounds, the dense join, and the
    // rate scalars: eagerly localCheckpoint the calendar-bounded
    // aggregate so the corpus scan runs once (g22 edges precedent)
    // without a session-lifetime CacheManager entry.
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val grid = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
        .as("h"))
    val dense = grid.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
    val tot = dense.agg(sum(col("n")).as("ntot"), count(lit(1)).as("hh"))
      .selectExpr(
        s"(ntot * 1000000 div hh) + (ntot * 1000000 div hh) div $CusumSlackDenom AS k_micros",
        s"$CusumHFactor * (ntot * 1000000 div hh) AS h_micros")
    val wOrd = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.crossJoin(broadcast(tot))
      .withColumn("y", sum(col("n") * lit(1000000L) - col("k_micros")).over(wOrd))
      .withColumn("ymin", min(col("y")).over(wOrd))
      .selectExpr("h", "n",
        "y - least(CAST(0 AS BIGINT), ymin) AS cusum_micros",
        "(y - least(CAST(0 AS BIGINT), ymin)) > h_micros AS alarm")
      .orderBy(col("h"))
  }

  // --- g42: hot-key join census under a planted Zipf regime --------------

  /** The planted hot key — outside every natural user_id domain, so the
    * remap mints ONE new user owning ~half of all events (VERDICT r13
    * item 3: the d21 hostileDocs discipline, applied to join keys). */
  val HotUserId = 888888888888L
  /** event_id % 2 == 0 → the hot user: ~50 % of the corpus on one key. */
  val HotEventMod = 2L
  /** Keys owning more than this share of events are salted — detected
    * from a count aggregate, never hard-coded to the planted id, so the
    * plan is the one a real pipeline ships. ≤ 1/share keys can qualify,
    * so the hot list is bounded (≤ 20 rows) and broadcast. */
  val HotKeyShare = 0.05
  /** Salt fan-out for hot keys: the hot key's probe rows spread across
    * this many (user_id, salt) shuffle groups. */
  val HotSalts = 16

  /** The adversarial corpus, derived in-query (the hostileDocs pattern)
    * so the oracle restates the same remap: half of all events land on
    * [[HotUserId]]. */
  private[graft] def hotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        when(col("event_id") % HotEventMod === 0, lit(HotUserId))
          .otherwise(col("user_id")).as("user_id"),
        col("event_id"), to_date(col("ts")).as("day"))

  /** g42: g23's cohort-retention shape (first-touch groupBy + join back
    * on the key + census) on the planted-hot corpus, with the skew
    * handled by DIFFERENTIATED SALTING — the deployable batch analog of
    * st21's state-store salt:
    *
    *  1. ONE aggregate pass yields both the first-touch frame and the
    *     per-key counts (map-side combine absorbs the hot key in the
    *     partial phase — groupBy skew is the cheap half of the problem).
    *  2. Hot keys are DETECTED (count > [[HotKeyShare]]·total — a
    *     bounded, broadcastable list), never assumed.
    *  3. The probe side salts hot rows content-addressed
    *     (xxhash64(event_id) mod [[HotSalts]] — deterministic under
    *     replay, st21's rule); cold rows keep salt 0. The build side
    *     explodes hot keys into all salts and keeps cold keys at 0, so
    *     the join on (user_id, salt) is exactly the unsalted join with
    *     the hot key's probe rows spread across [[HotSalts]] groups.
    *     The shuffle_hash hint pins the shuffled join at toy SF (AQE
    *     would broadcast the build side here and hide the very skew
    *     path this row exists to prove; at 100 TB the build side is
    *     every user — not broadcastable).
    *
    * Without the salt, ONE task ingests ~50 % of the corpus (the
    * RoundFourteenOpsSpec spread law measures exactly this); with it,
    * the hot key's max (user_id, salt) group is ~1/[[HotSalts]] of that
    * — per-task input bounded at ~3 % of the corpus. AQE's skew-join
    * split (q45) solves the same problem opportunistically; the salt is
    * the deterministic form that also survives streaming state (st21)
    * and non-sort-merge joins. Output ≡ the unsalted census
    * (spec-pinned) ≡ the DuckDB oracle. */
  def g42HotCohort(s: SparkSession, d: String): DataFrame = {
    val ev = hotEvents(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"), count(lit(1)).as("n_ev"))
    val tot = first.agg(sum(col("n_ev")).as("tot"))
    val hot = first.crossJoin(broadcast(tot))
      .filter(col("n_ev") > col("tot") * HotKeyShare)
      .select(col("user_id"), lit(true).as("is_hot"))
    val evSalted = ev
      .join(broadcast(hot), Seq("user_id"), "left")
      .withColumn("salt",
        when(col("is_hot"),
          pmod(xxhash64(col("event_id")), lit(HotSalts.toLong)))
          .otherwise(lit(0L)))
      .select(col("user_id"), col("salt"), col("day"))
    val firstSalted = first
      .join(broadcast(hot), Seq("user_id"), "left")
      .select(col("user_id"), col("cohort_day"),
        explode(when(col("is_hot"),
          sequence(lit(0L), lit((HotSalts - 1).toLong)))
          .otherwise(array(lit(0L)))).as("salt"))
    evSalted
      .join(firstSalted.hint("shuffle_hash"), Seq("user_id", "salt"))
      .select(col("user_id"),
        date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        expr("datediff(day, cohort_day) div 7").as("offset_week"))
      .groupBy(col("cohort_week"), col("offset_week"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("cohort_week"), col("offset_week"))
  }

  /** The salted probe side, exposed for the spread law (how evenly did
    * the salt spread the hot key's rows across shuffle groups). */
  private[graft] def g42SaltedProbe(s: SparkSession, d: String): DataFrame = {
    val ev = hotEvents(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
    val tot = first.agg(sum(col("n_ev")).as("tot"))
    val hot = first.crossJoin(broadcast(tot))
      .filter(col("n_ev") > col("tot") * HotKeyShare)
      .select(col("user_id"), lit(true).as("is_hot"))
    ev.join(broadcast(hot), Seq("user_id"), "left")
      .withColumn("salt",
        when(col("is_hot"),
          pmod(xxhash64(col("event_id")), lit(HotSalts.toLong)))
          .otherwise(lit(0L)))
      .select(col("user_id"), col("salt"))
  }

  val queries: Map[String, Q] = Map(
    "g42_hot_cohort" -> g42HotCohort _,
    "g41_spearman_rho" -> g41SpearmanRho _,
    "g40_kendall_tau" -> g40KendallTau _,
    "g26_chi_square" -> g26ChiSquare _,
    "g27_acf" -> g27Acf _,
    "g28_benford" -> g28Benford _,
    "g22_pagerank" -> g22PageRank _,
    "g23_cohort_retention" -> g23CohortRetention _,
    "g24_event_transitions" -> g24EventTransitions _,
    "g25_kanonymity" -> g25KAnonymity _,
    "g29_event_funnel" -> g29EventFunnel _,
    "g30_rank_sum" -> g30RankSum _,
    "g31_triangles" -> g31Triangles _,
    "g32_ks_test" -> g32KsTest _,
    "g33_gini" -> g33GiniConcentration _,
    "g35_theil" -> g35Theil _,
    "g36_cusum" -> g36Cusum _,
  )

  val oracleSql: Map[String, String] = Map(
    // g42: the remap restated + g23's census — the oracle neither salts
    // nor detects hot keys, so a hash match proves the salted plan
    // computes exactly the plain join's answer on the skewed corpus
    "g42_hot_cohort" -> s"""
      WITH ev AS (
        SELECT CASE WHEN event_id % $HotEventMod = 0 THEN $HotUserId
                    ELSE user_id END AS user_id,
               CAST(ts AS DATE) AS day
        FROM events),
      f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
      SELECT CAST(date_trunc('week', f.cohort_day) AS DATE) AS cohort_week,
             (date_diff('day', f.cohort_day, ev.day) // 7) AS offset_week,
             count(DISTINCT ev.user_id) AS n_users,
             count(*) AS n_events
      FROM ev JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, offset_week""",
    // g41: the identical midrank-marginal construction — same census,
    // same centered doubled midranks (integers end-to-end, HUGEINT sums
    // cast back), the one FP division on identical BIGINTs, NULL on a
    // constant axis on both sides
    "g41_spearman_rho" -> s"""
      WITH pts AS (
        SELECT CAST(round(value * 100) AS BIGINT) // $KendallXBucket AS xb,
               CAST(hour(ts) AS BIGINT) AS yb
        FROM events),
      cells AS (SELECT xb, yb, CAST(count(*) AS BIGINT) AS n
                FROM pts GROUP BY 1, 2),
      nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells),
      mx AS (
        SELECT xb,
               CAST(2 * COALESCE(sum(nm) OVER (ORDER BY xb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + nm AS BIGINT) AS rx2n
        FROM (SELECT xb, CAST(sum(n) AS BIGINT) AS nm FROM cells GROUP BY xb)),
      my AS (
        SELECT yb,
               CAST(2 * COALESCE(sum(nm) OVER (ORDER BY yb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + nm AS BIGINT) AS ry2n
        FROM (SELECT yb, CAST(sum(n) AS BIGINT) AS nm FROM cells GROUP BY yb)),
      d AS (
        SELECT c.n, nt.n_total,
               mx.rx2n - nt.n_total AS dx2,
               my.ry2n - nt.n_total AS dy2
        FROM cells c JOIN mx USING (xb) JOIN my USING (yb) CROSS JOIN nt),
      agg AS (
        SELECT n_total,
               CAST(sum(n * dx2 * dy2) AS BIGINT) AS sxy,
               CAST(sum(n * dx2 * dx2) AS BIGINT) AS sxx,
               CAST(sum(n * dy2 * dy2) AS BIGINT) AS syy,
               CAST(sum(n * dx2) AS BIGINT) AS zero_x,
               CAST(sum(n * dy2) AS BIGINT) AS zero_y
        FROM d GROUP BY n_total)
      SELECT n_total, sxy, sxx, syy, zero_x, zero_y,
             CASE WHEN sxx = 0 OR syy = 0 THEN CAST(NULL AS BIGINT)
                  ELSE CAST(round(sxy / sqrt(CAST(sxx AS DOUBLE)
                    * CAST(syy AS DOUBLE)) * 1000000) AS BIGINT) END
               AS rho_micros
      FROM agg""",
    // g40: the identical dense-grid prefix-sum construction in SQL —
    // same bucketing, same window frames, HUGEINT sums cast back, the
    // one FP step (tau) on identical BIGINTs
    "g40_kendall_tau" -> s"""
      WITH pts AS (
        SELECT CAST(round(value * 100) AS BIGINT) // $KendallXBucket AS xb,
               CAST(hour(ts) AS BIGINT) AS yb
        FROM events),
      cells AS (SELECT xb, yb, CAST(count(*) AS BIGINT) AS n
                FROM pts GROUP BY 1, 2),
      grid AS (
        SELECT x.xb, y.yb
        FROM (SELECT DISTINCT xb FROM cells) x
        CROSS JOIN (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS yb) y),
      dense AS (
        SELECT g.xb, g.yb, COALESCE(c.n, 0) AS n
        FROM grid g LEFT JOIN cells c USING (xb, yb)),
      cum AS (
        SELECT xb, yb, n,
          COALESCE(sum(n) OVER (PARTITION BY yb ORDER BY xb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt_x,
          sum(n) OVER (PARTITION BY yb) AS coly
        FROM dense),
      lg AS (
        SELECT xb, yb, n,
          COALESCE(sum(cum_lt_x) OVER (PARTITION BY xb ORDER BY yb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ll,
          COALESCE(sum(coly - cum_lt_x - n) OVER (PARTITION BY xb ORDER BY yb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gl
        FROM cum),
      cd AS (
        SELECT CAST(sum(n * ll) AS BIGINT) AS conc,
               CAST(sum(n * gl) AS BIGINT) AS disc,
               CAST(sum(n) AS BIGINT) AS n_total
        FROM lg),
      tx AS (SELECT CAST(sum(nx * (nx - 1) // 2) AS BIGINT) AS tie_x
             FROM (SELECT CAST(sum(n) AS BIGINT) AS nx FROM cells GROUP BY xb)),
      ty AS (SELECT CAST(sum(ny * (ny - 1) // 2) AS BIGINT) AS tie_y
             FROM (SELECT CAST(sum(n) AS BIGINT) AS ny FROM cells GROUP BY yb))
      SELECT n_total, conc, disc, tie_x, tie_y,
             CAST(n_total * (n_total - 1) // 2 AS BIGINT) AS n0,
             CASE WHEN n_total * (n_total - 1) // 2 = tie_x
                    OR n_total * (n_total - 1) // 2 = tie_y
                  THEN CAST(NULL AS BIGINT)
                  ELSE CAST(round((conc - disc)
                    / sqrt(CAST(n_total * (n_total - 1) // 2 - tie_x AS DOUBLE)
                         * CAST(n_total * (n_total - 1) // 2 - tie_y AS DOUBLE))
                    * 1000000) AS BIGINT) END AS tau_b_micros
      FROM cd, tx, ty""",
    "g22_pagerank" -> PageRankOracleSql,
    "g27_acf" -> s"""
      WITH o AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS n
        FROM events GROUP BY 1),
      g AS (
        SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        FROM o),
      dense AS (
        SELECT epoch_us(g.h) AS hu, CAST(coalesce(o.n, 0) AS BIGINT) AS n
        FROM g LEFT JOIN o ON g.h = o.h),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS s, count(*) AS nn,
               CAST(sum(n * n) AS BIGINT) AS s2
        FROM dense),
      lags AS (
        SELECT hu, n, unnest([${AcfLags.mkString(", ")}]) AS lag FROM dense),
      pairs AS (
        SELECT l.lag, count(*) AS n_pairs,
               CAST(sum(l.n * d2.n) AS BIGINT) AS a,
               CAST(sum(l.n) AS BIGINT) AS b,
               CAST(sum(d2.n) AS BIGINT) AS c
        FROM lags l
        JOIN dense d2 ON d2.hu = l.hu + CAST(l.lag AS BIGINT) * 3600000000
        GROUP BY 1)
      SELECT p.lag, p.n_pairs,
             round(CAST(p.a * t.nn * t.nn - t.s * t.nn * (p.b + p.c)
                        + (t.nn - p.lag) * t.s * t.s AS DOUBLE)
                   / (t.nn * t.nn * t.s2 - t.nn * t.s * t.s), 6) AS acf
      FROM pairs p, tot t ORDER BY p.lag""",
    "g28_benford" -> s"""
      WITH obs AS (
        SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit,
               count(*) AS n
        FROM events
        WHERE CAST(round(value * 100) AS BIGINT) > 0
        GROUP BY 1),
      grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
      dense AS (
        SELECT g.digit, CAST(coalesce(obs.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN obs ON obs.digit = g.digit),
      w AS (
        SELECT digit, n,
               CAST((n * 1000000) // sum(n) OVER () AS BIGINT) AS freq_ppm,
               CAST(round(log10(1 + 1/digit) * 1000000) AS BIGINT)
                 AS expected_ppm
        FROM dense),
      dev AS (
        SELECT digit, n, freq_ppm, expected_ppm,
               abs(freq_ppm - expected_ppm) AS dev_ppm
        FROM w)
      SELECT digit, n, freq_ppm, expected_ppm, dev_ppm,
             CAST(sum(dev_ppm) OVER () // 9 AS BIGINT) AS mad_ppm,
             (CAST(sum(dev_ppm) OVER () // 9 AS BIGINT) < $BenfordMadPpm)
               AS conforms
      FROM dev ORDER BY digit""",
    "g26_chi_square" -> s"""
      WITH cells AS (
        SELECT event_type, isodow(ts) AS dow, count(*) AS o
        FROM events GROUP BY 1, 2),
      t AS (
        SELECT count(DISTINCT event_type) AS n_types,
               count(DISTINCT dow) AS n_dows
        FROM cells),
      w AS (
        SELECT event_type, o,
               sum(o) OVER (PARTITION BY event_type) AS row_tot,
               sum(o) OVER (PARTITION BY dow) AS col_tot,
               sum(o) OVER () AS n_tot
        FROM cells),
      terms AS (
        SELECT event_type, o,
               CAST(round(pow(o - (row_tot * col_tot) / n_tot, 2)
                    / ((row_tot * col_tot) / n_tot) * 1000000) AS BIGINT)
                 AS term_micros
        FROM w),
      parts AS (
        SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
               CAST(sum(term_micros) AS BIGINT) AS part_micros
        FROM terms GROUP BY 1)
      SELECT event_type, n,
             round(part_micros / 1000000.0, 6) AS chi2_part,
             round(sum(part_micros) OVER () / 1000000.0, 6) AS chi2_total,
             (t.n_types - 1) * (t.n_dows - 1) AS dof,
             (round(sum(part_micros) OVER () / 1000000.0, 6) > $ChiSqCrit24
              AND (t.n_types - 1) * (t.n_dows - 1) = 24) AS is_dependent
      FROM parts, t ORDER BY event_type""",
    "g23_cohort_retention" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
      SELECT CAST(date_trunc('week', f.cohort_day) AS DATE) AS cohort_week,
             (date_diff('day', f.cohort_day, ev.day) // 7) AS offset_week,
             count(DISTINCT ev.user_id) AS n_users,
             count(*) AS n_events
      FROM ev JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, offset_week""",
    "g24_event_transitions" -> """
      WITH seqd AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
      pairs AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seqd WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
             CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
                  AS BIGINT) AS p_ppm
      FROM pairs ORDER BY prev_type, next_type""",
    // g29: the same sequential min-ts chain, one CTE per step — nulls
    // propagate through the ts >= prev join condition exactly as the
    // Spark left-join chain does
    "g29_event_funnel" -> s"""
      WITH s0 AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = '${FunnelSteps(0)}' GROUP BY 1),
      s1 AS (
        SELECT s0.user_id, min(e.ts) AS t1
        FROM s0 LEFT JOIN events e
          ON e.user_id = s0.user_id
         AND e.event_type = '${FunnelSteps(1)}' AND e.ts >= s0.t0
        GROUP BY 1),
      s2 AS (
        SELECT s1.user_id, min(e.ts) AS t2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.user_id
         AND e.event_type = '${FunnelSteps(2)}' AND e.ts >= s1.t1
        GROUP BY 1),
      s3 AS (
        SELECT s2.user_id, min(e.ts) AS t3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.user_id
         AND e.event_type = '${FunnelSteps(3)}' AND e.ts >= s2.t2
        GROUP BY 1),
      tot AS (
        SELECT count(s0.t0) AS n0, count(s1.t1) AS n1,
               count(s2.t2) AS n2, count(s3.t3) AS n3
        FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)
                JOIN s3 USING (user_id))
      SELECT CAST(0 AS INTEGER) AS step_idx, '${FunnelSteps(0)}' AS step,
             n0 AS n_users, CAST(1000000 AS BIGINT) AS conv_top_ppm,
             CAST(1000000 AS BIGINT) AS conv_prev_ppm FROM tot
      UNION ALL
      SELECT 1, '${FunnelSteps(1)}', n1,
             CASE WHEN n0 = 0 THEN 0 ELSE (n1 * 1000000) // n0 END,
             CASE WHEN n0 = 0 THEN 0 ELSE (n1 * 1000000) // n0 END FROM tot
      UNION ALL
      SELECT 2, '${FunnelSteps(2)}', n2,
             CASE WHEN n0 = 0 THEN 0 ELSE (n2 * 1000000) // n0 END,
             CASE WHEN n1 = 0 THEN 0 ELSE (n2 * 1000000) // n1 END FROM tot
      UNION ALL
      SELECT 3, '${FunnelSteps(3)}', n3,
             CASE WHEN n0 = 0 THEN 0 ELSE (n3 * 1000000) // n0 END,
             CASE WHEN n2 = 0 THEN 0 ELSE (n3 * 1000000) // n2 END FROM tot
      ORDER BY step_idx""",
    // g30: midranks in the doubled integer scale over a plain
    // single-pass prefix (the oracle engine may single-partition; the
    // Spark side runs the two-level decomposition); z via the SHARED
    // [[RankSumZSql]] expression on identical BIGINTs
    "g30_rank_sum" -> s"""
      WITH per AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(sum(CASE WHEN event_type = '$RankSumA' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               count(*) AS n
        FROM events WHERE event_type IN ('$RankSumA', '$RankSumB')
        GROUP BY 1),
      r AS (
        SELECT cents, na, n,
               coalesce(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cntless
        FROM per),
      a AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(n - na) AS BIGINT) AS n_b,
               CAST(sum(na * (2 * cntless + n + 1)) AS BIGINT) AS r2a,
               CAST(sum(n * n * n - n) AS BIGINT) AS tie_term
        FROM r)
      SELECT n_a, n_b,
             r2a - n_a * (n_a + 1) AS u2_a,
             2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS u2_b,
             tie_term,
             CAST(round(($RankSumZSql) * 1000000) AS BIGINT) AS z_micros,
             abs($RankSumZSql) > 1.96 AS significant
      FROM a""",
    // g31: same degree-ordered orientation; every triangle counted once
    "g31_triangles" -> """
      WITH seqd AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS page,
               lag(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        FROM events),
      edges AS (
        SELECT DISTINCT least(src, page) AS u, greatest(src, page) AS v
        FROM seqd WHERE src IS NOT NULL AND src <> page),
      deg AS (
        SELECT node, count(*) AS deg
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges) GROUP BY 1),
      o AS (
        SELECT CASE WHEN (x.deg, e.u) < (y.deg, e.v) THEN e.u ELSE e.v END
                 AS a,
               CASE WHEN (x.deg, e.u) < (y.deg, e.v) THEN e.v ELSE e.u END
                 AS b
        FROM edges e JOIN deg x ON x.node = e.u JOIN deg y ON y.node = e.v),
      tri AS (
        SELECT count(*) AS n_triangles
        FROM o e1 JOIN o e2 ON e1.b = e2.a
                  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
      st AS (
        SELECT count(*) AS n_nodes,
               CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg),
      ec AS (SELECT count(*) AS n_edges FROM edges)
      SELECT n_nodes, n_edges, n_wedges, n_triangles,
             CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
                  ELSE (3 * n_triangles * 1000000) // n_wedges END
               AS clustering_ppm
      FROM st, ec, tri""",
    // g32: inclusive CDF prefixes over a plain single-pass window (the
    // oracle engine may single-partition; the Spark side runs the
    // two-level decomposition); the verdict via the SHARED
    // [[KsStatSql]]/[[KsCritSql]] expressions on identical BIGINTs.
    // Every sum CASTs back to BIGINT — DuckDB promotes to HUGEINT.
    "g32_ks_test" -> s"""
      WITH per AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(sum(CASE WHEN event_type = '$RankSumA' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type IN ('$RankSumA', '$RankSumB')
        GROUP BY 1),
      c AS (
        SELECT CAST(sum(na) OVER (ORDER BY cents) AS BIGINT) AS cuma,
               CAST(sum(n - na) OVER (ORDER BY cents) AS BIGINT) AS cumb
        FROM per),
      t AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(n - na) AS BIGINT) AS n_b
        FROM per),
      m AS (
        SELECT n_a, n_b,
               CAST(max(abs(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_scaled
        FROM c, t GROUP BY 1, 2)
      SELECT n_a, n_b, d_scaled,
             (d_scaled * 1000000) // (n_a * n_b) AS d_ppm,
             CAST(round(($KsStatSql) * 1000000) AS BIGINT) AS d_micros,
             ($KsStatSql) > ($KsCritSql) AS significant
      FROM m""",
    // g36: same densified grid (generate_series), same prefix identity
    // (running sum + running min over the hour order), identical integer
    // micro-unit arithmetic; sums CAST against HUGEINT
    "g36_cusum" -> s"""
      WITH o AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
      g AS (
        SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        FROM o),
      dense AS (
        SELECT g.h, coalesce(o.n, 0) AS n FROM g LEFT JOIN o USING (h)),
      t AS (
        SELECT (CAST(sum(n) AS BIGINT) * 1000000 // count(*))
                 + (CAST(sum(n) AS BIGINT) * 1000000 // count(*))
                   // $CusumSlackDenom AS k_micros,
               $CusumHFactor * (CAST(sum(n) AS BIGINT) * 1000000 // count(*))
                 AS h_micros
        FROM dense),
      pre AS (
        SELECT h, n,
               CAST(sum(n * 1000000 - k_micros)
                 OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) AS y,
               h_micros
        FROM dense CROSS JOIN t),
      mn AS (
        SELECT h, n, y, h_micros,
               CAST(min(y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS ymin
        FROM pre)
      SELECT h, n,
             y - least(CAST(0 AS BIGINT), ymin) AS cusum_micros,
             (y - least(CAST(0 AS BIGINT), ymin)) > h_micros AS alarm
      FROM mn ORDER BY h""",
    // g35: identical frame, identical shared cell/between expressions on
    // identical BIGINTs; per-cell micro-rounding BEFORE summation makes
    // the sums order-free (g26 discipline); sums CAST against HUGEINT
    "g35_theil" -> s"""
      WITH per AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM documents WHERE n_chars > 0 GROUP BY 1, 2),
      bysrc AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n_g,
               CAST(sum(v * c) AS BIGINT) AS s_g
        FROM per GROUP BY 1),
      gtot AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n_tot,
               CAST(sum(s_g) AS BIGINT) AS s_tot
        FROM bysrc),
      within AS (
        SELECT p.source,
               CAST(sum($TheilCellSql) AS BIGINT) AS theil_within_micros
        FROM per p JOIN bysrc USING (source)
        GROUP BY 1)
      SELECT b.source, b.n_g AS n_docs, b.s_g AS total_chars,
             w.theil_within_micros,
             $TheilBetweenSql AS between_term_micros,
             (b.s_g * 1000000) // g.s_tot AS weight_ppm
      FROM bysrc b JOIN within w ON w.source = b.source CROSS JOIN gtot g
      ORDER BY b.source""",
    // g33: the same tie-group identity over a plain per-source window;
    // sums CAST to BIGINT against HUGEINT promotion
    "g33_gini" -> """
      WITH per AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      p AS (
        SELECT source, v, c,
               CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cpred
        FROM per),
      a AS (
        SELECT source,
               CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(sum(v * c) AS BIGINT) AS total_chars,
               CAST(sum(v * (c * cpred + (c * (c + 1)) // 2)) AS BIGINT)
                 AS rank_mass
        FROM p GROUP BY 1)
      SELECT source, n_docs, total_chars,
             total_chars // n_docs AS mean_chars,
             CASE WHEN n_docs = 0 OR total_chars = 0 THEN CAST(0 AS BIGINT)
                  ELSE ((2 * rank_mass - (n_docs + 1) * total_chars)
                        * 1000000) // (n_docs * total_chars) END AS gini_ppm
      FROM a ORDER BY source""",
    "g25_kanonymity" -> s"""
      WITH classes AS (
        SELECT w.width, lang, source, n_chars // w.width AS bucket,
               count(*) AS class_size
        FROM documents
        CROSS JOIN (SELECT CAST(unnest([${KAnonWidths.mkString(", ")}]) AS BIGINT)
                      AS width) w
        GROUP BY 1, 2, 3, 4)
      SELECT width, count(*) AS n_classes,
             min(class_size) AS min_class_size,
             CAST(sum(CASE WHEN class_size < $KAnonK
                           THEN class_size ELSE 0 END) AS BIGINT)
               AS n_rows_suppressed,
             (min(class_size) >= $KAnonK) AS achieves_k
      FROM classes GROUP BY 1 ORDER BY width""",
  )
}
