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
    val ew = edges.join(outw, edges("src") === outw("ow_src"))
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .persist()
    val nodes = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node"))).distinct().persist()
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
               CAST($TeleportScaled AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
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

  val queries: Map[String, Q] = Map(
    "g26_chi_square" -> g26ChiSquare _,
    "g27_acf" -> g27Acf _,
    "g28_benford" -> g28Benford _,
    "g22_pagerank" -> g22PageRank _,
    "g23_cohort_retention" -> g23CohortRetention _,
    "g24_event_transitions" -> g24EventTransitions _,
    "g25_kanonymity" -> g25KAnonymity _,
  )

  val oracleSql: Map[String, String] = Map(
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
             (n * 1000000) // sum(n) OVER (PARTITION BY prev_type) AS p_ppm
      FROM pairs ORDER BY prev_type, next_type""",
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
