package graft.queries

import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of oracle-checked queries: as-of join (a01), window
  * analytics beyond ranking (q26), array/higher-order functions (q27),
  * and approximate distinct (q25) — closing the SURVEY §2.3/2.4/2.5/2.7
  * inventory.
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  /** a01: as-of join — each click event matched to the same user's latest
    * purchase at or before it (backward inclusive). One shuffle on
    * user_id via the union-merge construction ([[Joins.asOf]]). */
  def a01AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
    Joins.asOf(clicks, purchases, "user_id",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("event_id").as("purchase_id"), col("value").as("purchase_value")),
        tieBreak = col("event_id"))
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** a03: FORWARD as-of join — each view event matched to the same
    * user's FIRST purchase at or after it (the attribution direction a01
    * cannot express: a01 looks back, conversion analysis looks ahead).
    * Same union-merge cost ([[Joins.asOfForward]]); the time-to-convert
    * gap rides exact microsecond integers so no float can drift it. */
  def a03AsOfForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
    Joins.asOfForward(views, purchases, "user_id",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("event_id").as("purchase_id"), col("ts").as("purchase_ts")),
        tieBreak = col("event_id"))
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** a04: as-of join with a TOLERANCE horizon — a01's backward walk with
    * the production stale-quote cutoff: a matched purchase older than 30
    * minutes is discarded, the click still emits with a null payload
    * (the left-join null-emission semantics a real enrich pipeline
    * needs). One filter on [[Joins.asOf]]'s union-merge output — the
    * matched row's ts rides inside the payload struct, so the horizon
    * check adds no shuffle. gap_us rides exact integer microseconds. */
  def a04AsOfTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
    Joins.asOf(clicks, purchases, "user_id",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("event_id").as("purchase_id"), col("ts").as("purchase_ts")),
        tieBreak = col("event_id"),
        within = Some(expr("INTERVAL '30' MINUTE")))
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** a05: NEAREST as-of join ([[Joins.asOfNearest]]) — each error event
    * matched to the click (same user) closest in time in EITHER
    * direction, within a symmetric 45-minute horizon; equal distance
    * prefers the earlier (backward) click. The symmetric "closest event"
    * alignment neither a01's backward nor a03's forward walk expresses —
    * log correlation's native join. Both directed walks share ONE
    * key-shuffle (two in-partition sorts); gap_us is signed exact
    * microseconds (negative = click before error). */
  def a05AsOfNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
    Joins.asOfNearest(errors, clicks, "user_id",
        leftTs = col("ts"), rightTs = col("ts"),
        payload = Seq(col("event_id").as("click_id"), col("ts").as("click_ts")),
        tieBreak = col("event_id"),
        within = Some(expr("INTERVAL '45' MINUTE")))
      .select(col("event_id"), col("user_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** a07: INTERPOLATION as-of ([[Joins.asOfBracket]]) — each error event
    * bracketed by the same user's purchases on both sides, with the
    * purchase value linearly interpolated at the error's instant: the
    * time-series gap-fill join (resample a sensor/price series at
    * arbitrary instants), which no directed walk alone expresses. The
    * bracket is a01's backward walk and a03's forward walk sharing ONE
    * key-shuffle (two in-partition sorts — [[Joins.asOfNearest]]'s
    * shape). The row emits the blend as EXACT integers — value in cents,
    * the interpolation as a (numerator, denominator) pair in cents·µs —
    * so the oracle compare is order-free and float-free; the double
    * blend itself ([[Joins.asOfInterpolate]]) is spec-checked against a
    * plain-Scala rebuild in AsOfJoinSpec. Edge semantics in the pair
    * encoding: one-sided bracket → (cents, 1) constant extrapolation;
    * exact-ts hit → (cents, 1); no match → (null, null). */
  def a07AsOfInterpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
    val pv = col("prev_cents"); val nv = col("next_cents")
    val both = pv.isNotNull && nv.isNotNull && col("next_ts") =!= col("prev_ts")
    Joins.asOfBracket(errors, purchases, "user_id",
        leftTs = col("ts_us"), rightTs = col("p_us"),
        value = col("cents"), tieBreak = col("event_id"), out = "cents")
      .select(col("event_id"), col("user_id"),
        pv, col("prev_ts").as("prev_us"), nv, col("next_ts").as("next_us"),
        when(both, pv * (col("next_ts") - col("ts_us")) +
                   nv * (col("ts_us") - col("prev_ts")))
          .when(pv.isNotNull, pv).otherwise(nv).as("interp_num"),
        when(both, col("next_ts") - col("prev_ts"))
          .otherwise(when(pv.isNotNull || nv.isNotNull, lit(1L))).as("interp_den"))
      .orderBy(col("event_id"))
  }

  /** a08: TEMPORAL (point-in-time) join against an SCD2 dimension — the
    * lakehouse query every p08-style history table exists to answer:
    * each fact row joined to the dimension version valid AT its own
    * timestamp (`valid_from <= ts < valid_to`, half-open; open rows
    * have null valid_to). Built on [[Joins.asOf]]'s backward walk over
    * `valid_from` — SCD2 intervals tile each key's timeline, so the
    * latest-start-at-or-before row IS the containing interval (a
    * defensive `ts < valid_to` guard documents the general
    * non-contiguous case and costs one filter) — one key shuffle, no
    * range-join BNLJ. Facts before a key's first version emit null
    * (they predate the dimension). The dimension here is the per-user
    * purchase-value history (`Transform.scd2` over purchases, versions
    * unique per key at every SF — verified); facts are error events. */
  def a08TemporalJoin(s: SparkSession, d: String): DataFrame = {
    import graft.transform.Transform
    val ev = Tables.events(s, d)
    val dim = Transform.scd2(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents")),
      keys = Seq("user_id"), versionCol = "ts")
    val facts = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    Joins.asOf(facts, dim, "user_id",
        leftTs = col("ts"), rightTs = col("valid_from"),
        payload = Seq(col("cents").as("dim_cents"),
          col("valid_to").as("dim_to")),
        tieBreak = col("valid_from"))
      .select(col("event_id"), col("user_id"),
        when(col("dim_to").isNull || col("ts") < col("dim_to"),
          col("dim_cents")).as("dim_cents"))
      .orderBy(col("event_id"))
  }

  /** a06: as-of vs a NATIVE independent implementation — the strongest
    * oracle form the as-of family can carry: a01/a03/a04/a05's oracles
    * RESTATE the union-merge as window SQL (same algorithm, different
    * engine), while a06's oracle is DuckDB's built-in `ASOF LEFT JOIN` —
    * a separately-engineered binary-search implementation sharing zero
    * algorithmic structure with [[Joins.asOf]]. Agreement here rules out
    * a family-wide misreading of as-of semantics that a restatement
    * oracle could mirror. Left-outer accounting (every purchase emitted,
    * matched or not) and exact microsecond gap sums per hour keep the
    * compare order-free. */
  def a06AsOfNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
    Joins.asOf(purchases, clicks, "user_id",
        leftTs = col("p_ts"), rightTs = col("ts"),
        payload = Seq(col("ts").as("c_ts")), tieBreak = col("ts"))
      .groupBy(date_trunc("hour", col("p_ts")).as("hour_bucket"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("c_ts")).as("n_matched"),
        sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_bucket"))
  }

  /** a02: interval/range join (§2.3) — every event landing inside the
    * 30-minute incident window opened by each error event, aggregated per
    * window. The naive formulation is a pure theta-join (no equi key)
    * that Spark plans as BroadcastNestedLoopJoin — O(N·M) comparisons
    * against a broadcast corpus, exactly what cannot run at 100 TB. Here
    * the time axis is bucketed at the window span: each interval covers
    * at most two 30-min bins, so it explodes into ≤2 bin rows, the join
    * is a plain shuffled hash equi-join on bin, and the exact containment
    * predicate filters residuals — O(N + 2M) shuffled rows partitioned by
    * bin like any grouped aggregate, AQE-salvageable if a bin is hot.
    * Each (point, window) pair meets in exactly one bin (the point's), so
    * no dedup pass is needed; self-inclusion (an error event opens its
    * own window) guarantees ≥1 row per window, so the inner join drops no
    * windows. */
  def a02RangeJoin(s: SparkSession, d: String): DataFrame = {
    val binUs = 1800L * 1000000L // 30-min bins in microseconds
    val ev = Tables.events(s, d)
    val pts = ev.select(col("ts").as("p_ts"), col("value"))
      .withColumn("bin", expr(s"unix_micros(p_ts) div $binUs"))
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("w_start"))
      .withColumn("w_start_us", expr("unix_micros(w_start)"))
      .withColumn("w_end_us", col("w_start_us") + lit(binUs))
      // end is exclusive, so the last covered bin is (end − 1) div width
      .withColumn("bin",
        explode(expr(s"sequence(w_start_us div $binUs, (w_end_us - 1) div $binUs)")))
    wins.join(pts, "bin")
      .filter(expr("unix_micros(p_ts)").between(
        col("w_start_us"), col("w_end_us") - 1))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_in_window"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("win_id"))
  }

  /** q37: sliding-window aggregate (T3's sliding half, batch form) —
    * 1-hour windows every 15 minutes over events. Spark's `window(ts,
    * "1 hour", "15 minutes")` expands each row into its 4 covering
    * windows BEFORE the partial aggregate, so the map side combines
    * (window, type) cells and the shuffle carries only aggregate rows —
    * overlap multiplies in-core expansion, never exchange volume. The
    * oracle reproduces the same epoch-aligned grid with `time_bucket` +
    * `generate_series`. */
  def q37SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** q25: approximate distinct (G4) — HLL-based approx_count_distinct
    * next to the exact count; the oracle checks the exact count and that
    * both engines' sketches land within 10 % (sketches differ across
    * engines, so the *bound* is the comparable contract). */
  def q25ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("d_exact"),
        (abs(approx_count_distinct(col("l_orderkey"), 0.05) - countDistinct(col("l_orderkey")))
          <= countDistinct(col("l_orderkey")) * 0.1).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** q26: analytic windows beyond ranking (§2.5) — ntile quartiles,
    * first/last value over a frame, and a range-frame sum. */
  def q26WindowExtras(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRange = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        ntile(4).over(wOrd).as("quartile"),
        first(col("l_quantity")).over(wFull).as("first_qty"),
        last(col("l_quantity")).over(wFull).as("last_qty"),
        count(lit(1)).over(wRange).as("n_within_5"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q27: array + higher-order functions (§2.7) — per-group sorted array
    * build, then element_at/slice/transform/filter/aggregate over it.
    * Arrays are built with sort_array(collect_list(...)) so content is
    * deterministic; outputs are scalars (the driver's compare hashes
    * scalar columns). */
  def q27ArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("qs"))
      .select(
        col("l_returnflag"),
        size(col("qs")).as("n"),
        element_at(col("qs"), 1).as("q_min"),
        element_at(col("qs"), -1).as("q_max"),
        round(aggregate(transform(slice(col("qs"), 1, 100), x => x * 2.0),
          lit(0.0), (acc, x) => acc + x), 2).as("sum_doubled_first100"),
        size(filter(col("qs"), x => x > 25)).as("n_gt_25"),
        round(aggregate(col("qs"), lit(0.0),
          (acc, x) => acc + x), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** q28: HAVING + LIKE + CASE — the filtering/branching SQL surface over
    * grouped data (post-aggregation predicates prune groups, not rows). */
  def q28HavingLikeCase(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_type").like("%AR%"))
      .withColumn("size_class",
        when(col("p_size") < 15, "small")
          .when(col("p_size") < 35, "medium")
          .otherwise("large"))
      .groupBy(col("p_brand"), col("size_class"))
      .agg(count(lit(1)).as("n_parts"),
           round(avg(col("p_retailprice")), 2).as("avg_price"))
      .filter(col("n_parts") >= 2) // HAVING
      .orderBy(col("p_brand"), col("size_class"))

  /** q29: IN / NOT IN subqueries via the SQL surface (decorrelated by
    * Catalyst into semi/anti joins — same plans as q06/q07). */
  def q29InSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("insq_orders")
    Tables.customer(s, d).createOrReplaceTempView("insq_customer")
    s.sql("""
      SELECT o_orderpriority, count(*) AS n
      FROM insq_orders
      WHERE o_custkey IN (SELECT c_custkey FROM insq_customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_orderkey NOT IN (SELECT o_orderkey FROM insq_orders
                               WHERE o_totalprice > 400000.0)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  }

  /** q30: PIVOT — event counts per user decile, event types as columns
    * (explicit value list so the output schema is static and
    * oracle-comparable; dynamic pivot requires a pre-pass to collect the
    * distinct values — at scale always pass the list). */
  def q30Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("user_decile", (col("user_id") % 10).cast("int"))
      .groupBy(col("user_decile"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy(col("user_decile"))

  /** q35: batch sessionization (SURVEY §2.8 T3, reference claim
    * README:34-36) — per-user activity sessions closed by a 30-minute
    * gap, via the SAME `session_window` expression the streaming path
    * uses ([[graft.streaming.StreamingPipeline.sessionized]]), so the
    * session-merge semantics get a hard driver-checked row (wall-clock
    * watermark behavior stays in StreamingSpec). Batch session_window
    * plans as a single shuffle on the session key followed by an
    * in-partition sort-and-merge — no per-session state beyond the open
    * session, so it scales like any grouped aggregate. Session end is
    * last-event-ts + gap (window semantics); two events exactly 30 min
    * apart belong to DIFFERENT sessions (the window is half-open). */
  def q35Sessionize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** q36: DYNAMIC pivot — q30's ad-hoc BI form (the reference's Athena
    * surface implies ad-hoc pivots, README:66-68): the column list is not
    * known ahead, so a driver-side pre-pass collects the distinct pivot
    * values (sorted for a deterministic column order) and feeds them to
    * the same single-shuffle pivot. The pre-pass is inherent to dynamic
    * pivot at any scale — the OUTPUT SCHEMA depends on the data — and is
    * a distinct-values aggregate (tiny result), not a data collect. */
  def q36DynamicPivot(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("user_decile", (col("user_id") % 10).cast("int"))
    val types = ev.select(col("event_type")).distinct()
      .orderBy(col("event_type"))
      .collect().map(_.getString(0)).toSeq
    ev.groupBy(col("user_decile"))
      .pivot("event_type", types)
      .count()
      .na.fill(0L)
      .orderBy(col("user_decile"))
  }

  /** q31: right outer join (§2.3) — every customer kept even with zero
    * orders, written with the fact side on the LEFT so the plan is a
    * genuine RightOuter (Catalyst may still flip build sides; semantics,
    * not build choice, is what's under test — q04 covers the left form). */
  def q31RightJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
      .orderBy(col("c_mktsegment"))

  /** q32: map-typed functions (§2.7) — `from_json` to a MapType over
    * events.props, a column-built map merged in with `map_concat`, then
    * `size`/`map_keys`/`element_at`/`map_entries`(exploded) over the
    * result. Keys are sorted before joining so both engines agree on
    * order. */
  def q32MapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        map_concat(
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)),
          map(lit("type"), col("event_type"),
              lit("uid"), col("user_id").cast("string"))).as("m"))
      .select(
        col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
        element_at(col("m"), "k").cast("long").as("k_val"),
        explode(map_entries(col("m"))).as("e"))
      .select(col("event_id"), col("n_keys"), col("keys_csv"), col("k_val"),
        col("e.key").as("mk"), col("e.value").as("mv"))
      .orderBy(col("event_id"), col("mk"))

  /** u01: the typed-Aggregator plugin surface (SURVEY §2.9 U2) as a
    * driver row. [[graft.functions.Aggregators.PassRate]] is exact
    * integer arithmetic (bit-identical to the SQL form on any engine);
    * [[graft.functions.Aggregators.VarianceStats]] merges Welford
    * buffers whose float result depends on merge order, so its contract
    * is agreement with the builtin `var_pop` within 1e-6 relative — the
    * honest cross-engine statement for a parallel variance. Both run
    * with map-side partial aggregation like any builtin. */
  def u01PluginAgg(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Aggregators
    val passRate = udaf(Aggregators.PassRate, org.apache.spark.sql.Encoders.scalaBoolean)
    val varStats = udaf(Aggregators.VarianceStats, org.apache.spark.sql.Encoders.scalaDouble)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(passRate(col("value") <= 300), 6).as("pass_rate"),
        varStats(col("value")).as("vs"),
        var_pop(col("value")).as("builtin_var"),
        count(lit(1)).as("n"))
      .select(
        col("event_type"), col("pass_rate"), col("n"),
        round(col("builtin_var"), 4).as("var_value"),
        (abs(col("vs._3") - col("builtin_var")) <=
          greatest(col("builtin_var"), lit(1e-12)) * 1e-6).as("welford_ok"))
      .orderBy(col("event_type"))
  }

  /** u02: the SQL-registration path of the native vector expressions
    * (SURVEY §2.9 U1 + §4 SparkSessionExtensions) as a driver row: the
    * codegen'd `dot_product`/`cosine_similarity` called FROM SQL text,
    * proving a pure-SQL user gets the plugin functions. The oracle
    * mirrors the expressions' exact accumulation order, so values
    * compare bit-for-bit after rounding. */
  def u02SqlVector(s: SparkSession, d: String): DataFrame = {
    graft.extensions.GraftExtensions.register(s)
    Tables.embeddings(s, d).createOrReplaceTempView("u02_emb")
    s.sql("""
      SELECT vec_id,
             round(dot_product(embedding, embedding), 6) AS self_dot,
             round(cosine_similarity(embedding, embedding), 6) AS self_cos
      FROM u02_emb ORDER BY vec_id""")
  }

  /** a09: resample-to-grid with forward fill (last observation carried
    * forward) — the gap-fill that turns an irregular event series into
    * the regular hourly frame every downstream time-series op (g27's
    * ACF, a drift monitor, a feature-store point-in-time read) assumes.
    * Each user's purchase stream becomes hourly bars: the bar value is
    * the hour's LAST purchase (by ts, event_id — the deterministic
    * "hourly close"), and empty hours carry the previous close forward;
    * hours before a user's first purchase stay null. The row emits the
    * per-user accounting of that resample (grid size, own-bar hours,
    * filled hours, carried hours, filled mass) rather than the
    * user×hour frame itself, so the oracle hash stays O(users).
    *
    * Scale: the grid is |users| × |hours| — hours bounded by the feed's
    * calendar span (the g27 argument), users are the parallelism. The
    * hourly close prunes as WindowGroupLimit (rn = 1 per (user, hour));
    * the carry-forward is a running `last(ignoreNulls)` windowed BY
    * USER over that user's ≤|hours| grid rows — never a global window;
    * the rollup re-uses the same user partitioning. */
  def a09LocfResample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    val pw = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val bars = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(pw)).filter(col("rn") === 1)
      .select(col("user_id"), col("h"), col("cents"))
    val lw = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bars, Seq("user_id", "h"), "left")
      .withColumn("fill", last(col("cents"), ignoreNulls = true).over(lw))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        count(col("cents")).as("n_bar_hours"),
        count(col("fill")).as("n_filled_hours"),
        (count(col("fill")) - count(col("cents"))).as("n_gap_hours"),
        sum(col("fill")).as("sum_filled_cents"))
      .withColumn("coverage_ppm",
        expr("(n_filled_hours * 1000000) div n_hours"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "u01_plugin_agg"     -> u01PluginAgg _,
    "u02_sql_vector"     -> u02SqlVector _,
    "q31_right_join"     -> q31RightJoin _,
    "q32_map_funcs"      -> q32MapFuncs _,
    "a01_asof_join"      -> a01AsOfJoin _,
    "a02_range_join"     -> a02RangeJoin _,
    "a03_asof_forward"   -> a03AsOfForward _,
    "a04_asof_tolerance" -> a04AsOfTolerance _,
    "a05_asof_nearest"   -> a05AsOfNearest _,
    "a06_asof_native"    -> a06AsOfNative _,
    "a07_asof_interpolate" -> a07AsOfInterpolate _,
    "a08_temporal_join"    -> a08TemporalJoin _,
    "a09_locf_resample"    -> a09LocfResample _,
    "q37_sliding_window" -> q37SlidingWindow _,
    "q30_pivot"          -> q30Pivot _,
    "q25_approx_distinct"-> q25ApproxDistinct _,
    "q26_window_extras"  -> q26WindowExtras _,
    "q27_array_funcs"    -> q27ArrayFuncs _,
    "q28_having_like_case" -> q28HavingLikeCase _,
    "q29_in_subquery"    -> q29InSubquery _,
    "q35_sessionize"     -> q35Sessionize _,
    "q36_dynamic_pivot"  -> q36DynamicPivot _,
  )

  val oracleSql: Map[String, String] = Map(
    // PassRate is exact long arithmetic → value compare; the Welford
    // variance carries a tolerance contract (see u01PluginAgg scaladoc)
    "u01_plugin_agg" -> """
      SELECT event_type,
             round(avg(CASE WHEN value <= 300 THEN 1.0 ELSE 0.0 END), 6) AS pass_rate,
             count(*) AS n,
             round(var_pop(value), 4) AS var_value,
             TRUE AS welford_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    // d = the expressions' accumulation (sequential sum of squares);
    // denom mirrors sqrt(d)*sqrt(d) so float behavior matches exactly
    "u02_sql_vector" -> """
      WITH e AS (
        SELECT vec_id,
               list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS d
        FROM embeddings)
      SELECT vec_id,
             round(d, 6) AS self_dot,
             CASE WHEN sqrt(d) * sqrt(d) = 0 THEN NULL
                  ELSE round(d / (sqrt(d) * sqrt(d)), 6) END AS self_cos
      FROM e ORDER BY vec_id""",
    "q31_right_join" -> """
      SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    // CORPUS COUPLING (deliberate): the literal n_keys=3 / 'k,type,uid'
    // encode that every generated props payload is exactly {"k": ...} —
    // one JSON key plus the two map_concat'd columns. If the events
    // generator ever adds payload keys, this oracle (not the engine)
    // must be updated; the mismatch would surface as a value diff here,
    // never silently.
    "q32_map_funcs" -> """
      WITH base AS (
        SELECT event_id,
               json_extract_string(props, '$.k') AS kv,
               event_type,
               CAST(user_id AS VARCHAR) AS uid
        FROM events),
      entries AS (
        SELECT event_id, 'k' AS mk, kv AS mv FROM base
        UNION ALL SELECT event_id, 'type', event_type FROM base
        UNION ALL SELECT event_id, 'uid', uid FROM base)
      SELECT b.event_id,
             CAST(3 AS BIGINT) AS n_keys,
             'k,type,uid' AS keys_csv,
             CAST(b.kv AS BIGINT) AS k_val,
             e.mk, e.mv
      FROM base b JOIN entries e USING (event_id)
      ORDER BY event_id, mk""",
    // Mirrors the union-merge construction so tie semantics are identical
    // by construction (right rows sort before left at equal ts).
    // a06: DuckDB's NATIVE ASOF LEFT JOIN — an independent binary-search
    // implementation, not a restatement of our union-merge
    "a06_asof_native" -> """
      WITH p AS (
        SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
      j AS (
        SELECT p.user_id, p.p_ts, c.c_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.c_ts <= p.p_ts)
      SELECT CAST(date_trunc('hour', p_ts) AS TIMESTAMP) AS hour_bucket,
             count(*) AS n_purchases,
             count(c_ts) AS n_matched,
             CAST(sum(epoch_us(p_ts) - epoch_us(c_ts)) AS BIGINT) AS gap_us,
             count(DISTINCT user_id) AS n_users
      FROM j GROUP BY 1 ORDER BY hour_bucket""",
    "a01_asof_join" -> """
      WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts, 1 AS side, event_id,
               NULL::BIGINT AS tie, NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
        FROM clicks
        UNION ALL
        SELECT user_id, ts, 0 AS side, NULL, event_id, event_id, value
        FROM purchases),
      m AS (
        SELECT *,
               last_value(p_id IGNORE NULLS) OVER w AS purchase_id,
               last_value(p_value IGNORE NULLS) OVER w AS purchase_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, tie
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, purchase_id,
             round(purchase_value, 2) AS purchase_value
      FROM m WHERE side = 1 ORDER BY event_id""",
    // a01's union-merge mirrored: descending timeline, right rows still
    // sort before left at equal ts (inclusive >=), tie DESC → smallest
    // purchase id wins; the gap is exact integer microseconds
    "a03_asof_forward" -> """
      WITH views AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts, 1 AS side, event_id,
               NULL::BIGINT AS tie, NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts
        FROM views
        UNION ALL
        SELECT user_id, ts, 0 AS side, NULL, event_id, event_id, ts
        FROM purchases),
      m AS (
        SELECT *,
               last_value(p_id IGNORE NULLS) OVER w AS purchase_id,
               last_value(p_ts IGNORE NULLS) OVER w AS purchase_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, side, tie DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, purchase_id,
             epoch_us(purchase_ts) - epoch_us(ts) AS gap_us
      FROM m WHERE side = 1 ORDER BY event_id""",
    // a01's union-merge with the matched purchase's own ts carried so the
    // 30-minute horizon is one CASE on the window output; out-of-horizon
    // and never-matched clicks both emit null payload
    "a04_asof_tolerance" -> """
      WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts, 1 AS side, event_id,
               NULL::BIGINT AS tie, NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts
        FROM clicks
        UNION ALL
        SELECT user_id, ts, 0 AS side, NULL, event_id, event_id, ts
        FROM purchases),
      m AS (
        SELECT *,
               last_value(p_id IGNORE NULLS) OVER w AS m_id,
               last_value(p_ts IGNORE NULLS) OVER w AS m_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, tie
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id,
             CASE WHEN ts - m_ts <= INTERVAL 30 MINUTE THEN m_id END AS purchase_id,
             CASE WHEN ts - m_ts <= INTERVAL 30 MINUTE
                  THEN epoch_us(m_ts) - epoch_us(ts) END AS gap_us
      FROM m WHERE side = 1 ORDER BY event_id""",
    // a08: the point-in-time semantics stated DIRECTLY as an interval
    // join (valid_from <= ts < valid_to over the lead-built dimension)
    // — a structurally different formulation from the as-of walk
    // a09: identical grid/close/carry rule — generate_series is
    // end-inclusive like Spark's sequence; nulls before a user's first
    // purchase survive both engines' count/sum skipping
    "a09_locf_resample" -> """
      WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events),
      u AS (SELECT DISTINCT user_id FROM events),
      grid AS (
        SELECT u.user_id, g.h
        FROM u, b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR))
               AS g(h)),
      p AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'),
      bars AS (SELECT user_id, h, cents FROM p WHERE rn = 1),
      f AS (
        SELECT g.user_id, bars.cents,
               last_value(bars.cents IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS fill
        FROM grid g LEFT JOIN bars
          ON bars.user_id = g.user_id AND bars.h = g.h)
      SELECT user_id, count(*) AS n_hours,
             count(cents) AS n_bar_hours,
             count(fill) AS n_filled_hours,
             count(fill) - count(cents) AS n_gap_hours,
             CAST(sum(fill) AS BIGINT) AS sum_filled_cents,
             (count(fill) * 1000000) // count(*) AS coverage_ppm
      FROM f GROUP BY 1 ORDER BY user_id""",
    "a08_temporal_join" -> """
      WITH p AS (
        SELECT user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      dim AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
               cents
        FROM p),
      f AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'error')
      SELECT f.event_id, f.user_id, d.cents AS dim_cents
      FROM f LEFT JOIN dim d
        ON f.user_id = d.user_id AND d.valid_from <= f.ts
       AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      ORDER BY event_id""",
    // a07: both directed walks (the bracket) as two windows over ONE
    // stacked union with the purchase cents carried; the blend restated
    // as the same exact-integer (numerator, denominator) pair
    "a07_asof_interpolate" -> """
      WITH errors AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'),
      purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts_us, 1 AS side, event_id,
               NULL::BIGINT AS tie, NULL::BIGINT AS p_cents, NULL::BIGINT AS p_ts
        FROM errors
        UNION ALL
        SELECT user_id, p_us, 0, NULL, event_id, cents, p_us
        FROM purchases),
      m AS (
        SELECT *,
               last_value(p_cents IGNORE NULLS) OVER wb AS prev_cents,
               last_value(p_ts IGNORE NULLS) OVER wb AS prev_us,
               last_value(p_cents IGNORE NULLS) OVER wf AS next_cents,
               last_value(p_ts IGNORE NULLS) OVER wf AS next_us
        FROM u
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, side, tie
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts_us DESC, side, tie DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, prev_cents, prev_us, next_cents, next_us,
             CASE WHEN prev_cents IS NOT NULL AND next_cents IS NOT NULL
                       AND next_us <> prev_us
                    THEN prev_cents * (next_us - ts_us) + next_cents * (ts_us - prev_us)
                  WHEN prev_cents IS NOT NULL THEN prev_cents
                  ELSE next_cents END AS interp_num,
             CASE WHEN prev_cents IS NOT NULL AND next_cents IS NOT NULL
                       AND next_us <> prev_us
                    THEN next_us - prev_us
                  WHEN prev_cents IS NOT NULL OR next_cents IS NOT NULL
                    THEN CAST(1 AS BIGINT) END AS interp_den
      FROM m WHERE side = 1 ORDER BY event_id""",
    // a05: both directed walks as two windows over ONE stacked union,
    // then the same closer-side CASE the Spark operator applies; equal
    // distance prefers backward, both-out-of-horizon emits null
    "a05_asof_nearest" -> """
      WITH errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
      clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      u AS (
        SELECT user_id, ts, 1 AS side, event_id,
               NULL::BIGINT AS tie, NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts
        FROM errors
        UNION ALL
        SELECT user_id, ts, 0 AS side, NULL, event_id, event_id, ts
        FROM clicks),
      m AS (
        SELECT *,
               last_value(p_id IGNORE NULLS) OVER wb AS b_id,
               last_value(p_ts IGNORE NULLS) OVER wb AS b_ts,
               last_value(p_id IGNORE NULLS) OVER wf AS f_id,
               last_value(p_ts IGNORE NULLS) OVER wf AS f_ts
        FROM u
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, tie
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts DESC, side, tie DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      c AS (
        SELECT event_id, user_id, ts, b_id, b_ts, f_id, f_ts,
               (b_ts IS NOT NULL AND ts - b_ts <= INTERVAL 45 MINUTE) AS b_ok,
               (f_ts IS NOT NULL AND f_ts - ts <= INTERVAL 45 MINUTE) AS f_ok
        FROM m WHERE side = 1)
      SELECT event_id, user_id,
             CASE WHEN b_ok AND (NOT f_ok OR ts - b_ts <= f_ts - ts) THEN b_id
                  WHEN f_ok THEN f_id END AS click_id,
             CASE WHEN b_ok AND (NOT f_ok OR ts - b_ts <= f_ts - ts)
                    THEN epoch_us(b_ts) - epoch_us(ts)
                  WHEN f_ok THEN epoch_us(f_ts) - epoch_us(ts) END AS gap_us
      FROM c ORDER BY event_id""",
    "a02_range_join" -> """
      SELECT e.event_id AS win_id,
             count(*) AS n_in_window,
             round(sum(p.value), 2) AS sum_value
      FROM events e
      JOIN events p
        ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
      WHERE e.event_type = 'error'
      GROUP BY 1
      ORDER BY 1""",
    // time_bucket aligns the 15-min grid to the epoch exactly like
    // Spark's window(); each event scatters to its 4 covering starts
    "q37_sliding_window" -> """
      WITH g AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS grid, event_type, value
        FROM events),
      w AS (
        SELECT unnest(generate_series(grid - INTERVAL '45 minutes', grid,
                 INTERVAL '15 minutes')) AS window_start,
               event_type, value
        FROM g)
      SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
             count(*) AS n, round(sum(value), 6) AS sum_value
      FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q25_approx_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS d_exact,
             (abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
               <= count(DISTINCT l_orderkey) * 0.1) AS approx_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q26_window_extras" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
             ntile(4) OVER wo AS quartile,
             first_value(l_quantity) OVER wf AS first_qty,
             last_value(l_quantity) OVER wf AS last_qty,
             count(*) OVER wr AS n_within_5
      FROM lineitem
      WHERE l_suppkey <= 5
      WINDOW wo AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber),
             wf AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             wr AS (PARTITION BY l_suppkey ORDER BY l_quantity
                    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q27_array_funcs" -> """
      WITH g AS (
        SELECT l_returnflag, list(l_quantity ORDER BY l_quantity) AS qs
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
             len(qs) AS n,
             qs[1] AS q_min,
             qs[-1] AS q_max,
             round(list_sum(list_transform(qs[1:100], x -> x * 2.0)), 2)
               AS sum_doubled_first100,
             len(list_filter(qs, x -> x > 25)) AS n_gt_25,
             round(list_sum(qs), 2) AS sum_qty
      FROM g ORDER BY l_returnflag""",
    "q28_having_like_case" -> """
      SELECT p_brand,
             CASE WHEN p_size < 15 THEN 'small'
                  WHEN p_size < 35 THEN 'medium'
                  ELSE 'large' END AS size_class,
             count(*) AS n_parts,
             round(avg(p_retailprice), 2) AS avg_price
      FROM part
      WHERE p_type LIKE '%AR%'
      GROUP BY 1, 2
      HAVING count(*) >= 2
      ORDER BY p_brand, size_class""",
    "q29_in_subquery" -> """
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
                               WHERE o_totalprice > 400000.0)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    // CORPUS COUPLING (deliberate): the five CASE columns are the event
    // types the generator emits; q30's static value list and this SQL
    // must list the same set. q36 (dynamic) collects the set from the
    // data, so a generator change would surface as a schema mismatch
    // here rather than silently dropping a column.
    "q30_pivot" -> """
      SELECT CAST(user_id % 10 AS INTEGER) AS user_decile,
             CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events
      GROUP BY 1 ORDER BY user_decile""",
    "q36_dynamic_pivot" -> """
      SELECT CAST(user_id % 10 AS INTEGER) AS user_decile,
             CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events
      GROUP BY 1 ORDER BY user_decile""",
    // Session end is last-event-ts + gap and the window is half-open
    // (diff == 30 min ⇒ new session), matching Spark's session_window.
    // ts is cast to microsecond TIMESTAMP to match Spark's timestamp unit
    // (the parquet file stores nanos; all corpus values are micro-exact).
    "q35_sessionize" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             user_id,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",
  )
}
