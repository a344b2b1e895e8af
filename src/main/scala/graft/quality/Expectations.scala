package graft.quality

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ / dbt-test shape
  * (cf. reference README:40's data-validation stage, generalized from
  * the P1 schema gate to user-declared constraints): a pipeline declares
  * WHAT must hold (non-null keys, uniqueness, value domains, ranges,
  * formats) and the runner turns the whole suite into ONE aggregation
  * pass over the table.
  *
  * Scale design: every expectation compiles to an aggregate expression,
  * so N expectations cost one scan + one partial-aggregated reduce to a
  * single row — never N scans. `Unique` adds distinct-count buffers to
  * that same pass (the g04 one-pass-Expand trade: at production scale
  * the scan dominates, so one Expand pass beats per-check scans). The
  * result unpivots driver-free into one row per expectation.
  */
object Expectations {

  /** One declared constraint; `id` is the stable row key the report
    * emits, `violations` the aggregate counting rows that break it.
    * Null handling: range/domain/format checks skip nulls — declare an
    * explicit [[NotNull]] when absence itself is a violation.
    * `mergeable` marks counters that combine across data slices by
    * plain addition (the property incremental/streaming maintenance
    * needs); uniqueness does not — distinctness is a property of the
    * whole, not a sum of parts. */
  sealed trait Expectation {
    def id: String
    private[quality] def violations: Column
    def mergeable: Boolean = true
  }

  final case class NotNull(column: String) extends Expectation {
    val id = s"not_null($column)"
    private[quality] def violations =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** Uniqueness of a column tuple under the SQL UNIQUE-constraint
    * convention: rows with ANY null key column are EXEMPT (declare
    * [[NotNull]] separately if absence matters); violations = the
    * surplus copies among fully-non-null tuples. The convention is
    * explicit because the engines disagree by default — Spark's
    * countDistinct over a struct counts a null-field tuple, SQL's
    * count(DISTINCT col) skips it — so a defined rule (and the oracle
    * restating it with the same filter) is the only way the check
    * means one thing. */
  final case class Unique(columns: Seq[String]) extends Expectation {
    val id = s"unique(${columns.mkString(",")})"
    private[quality] def violations = {
      val allSet = columns.map(col(_).isNotNull).reduce(_ && _)
      sum(when(allSet, 1L).otherwise(0L)) -
        countDistinct(when(allSet, struct(columns.map(col): _*)))
    }
    override val mergeable = false
  }

  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    val id = s"in_range($column,$lo,$hi)"
    private[quality] def violations =
      sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L))
  }

  final case class OneOf(column: String, values: Seq[String])
      extends Expectation {
    val id = s"one_of($column)"
    private[quality] def violations =
      sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L).otherwise(0L))
  }

  final case class Matches(column: String, regex: String)
      extends Expectation {
    val id = s"matches($column)"
    private[quality] def violations =
      sum(when(col(column).isNotNull &&
        !col(column).rlike(regex), 1L).otherwise(0L))
  }

  /** The single-aggregation counter pass: one row, `_v0.._vN` violation
    * counters plus `n_rows`. The intermediate form [[mergeCounters]]
    * maintains incrementally and [[report]] renders. */
  def counters(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val ids = checks.map(_.id)
    require(ids.distinct.size == ids.size, s"duplicate expectation ids: $ids")
    val aggs = checks.zipWithIndex.map { case (e, i) =>
      e.violations.as(s"_v$i")
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two counter rows by addition — valid ONLY for suites of
    * mergeable expectations (enforced by the callers that maintain
    * counters incrementally; see [[Expectation.mergeable]]). */
  def mergeCounters(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns
    require(cols.sameElements(b.columns), "counter shapes differ")
    val sums = cols.map(c => sum(col(c)).as(c))
    a.unionByName(b).agg(sums.head, sums.tail: _*)
  }

  /** Render a counter row as the per-expectation report —
    * (expectation, violations, n_rows, passed), sorted by id. */
  def report(countersDf: DataFrame, checks: Seq[Expectation]): DataFrame = {
    val entries = checks.zipWithIndex.map { case (e, i) =>
      struct(lit(e.id).as("expectation"), col(s"_v$i").as("violations"))
    }
    countersDf.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.expectation").as("expectation"),
        col("e.violations").as("violations"),
        col("n_rows"),
        (col("e.violations") === 0).as("passed"))
      .orderBy(col("expectation"))
  }

  /** Run a suite: one aggregation pass, one output row per expectation —
    * (expectation, violations, n_rows, passed), sorted by id. */
  def check(df: DataFrame, checks: Seq[Expectation]): DataFrame =
    report(counters(df, checks), checks)

  /** g18 registered suite over `orders` — a deliberate pass/fail mix so
    * the report is non-vacuous at every SF: the key constraints hold,
    * the business-composite uniqueness does NOT (32 (custkey, day)
    * collisions at sf0.01), the price cap and the two-status domain are
    * genuinely violated. */
  def g18Suite: Seq[Expectation] = Seq(
    NotNull("o_orderkey"),
    Unique(Seq("o_orderkey")),
    Unique(Seq("o_custkey", "o_orderdate")),
    InRange("o_totalprice", 0.0, 300000.0),
    OneOf("o_orderstatus", Seq("O", "F")),
    Matches("o_orderpriority", "^[1-5]-"))

  def g18Expectations(s: SparkSession, d: String): DataFrame =
    check(Tables.orders(s, d), g18Suite)

  /** st14's streaming suite over `events` — MERGEABLE checks only (the
    * counters are maintained incrementally across micro-batches by
    * addition; a Unique check needs the st06 dedup-state machinery
    * instead). Pass/fail mix: the key is never null and props is always
    * a JSON object, while the 300-cap and the four-type domain are
    * genuinely violated (error rows, value tail). */
  def st14Suite: Seq[Expectation] = Seq(
    NotNull("user_id"),
    InRange("value", 0.0, 300.0),
    OneOf("event_type", Seq("click", "view", "purchase", "signup")),
    Matches("props", "^\\{"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g18_expectations" -> (g18Expectations(_, _)))

  // the same counters as plain filtered aggregates, unpivoted by hand;
  // ids are literal so Spark and the oracle can only agree by meaning
  val oracleSql: Map[String, String] = Map(
    "g18_expectations" -> """
      WITH agg AS (
        SELECT count(*) AS n_rows,
          count(*) FILTER (WHERE o_orderkey IS NULL) AS v0,
          count(*) FILTER (WHERE o_orderkey IS NOT NULL)
            - count(DISTINCT o_orderkey) AS v1,
          count(*) FILTER (WHERE o_custkey IS NOT NULL
                           AND o_orderdate IS NOT NULL)
            - count(DISTINCT (o_custkey, o_orderdate))
                FILTER (WHERE o_custkey IS NOT NULL
                        AND o_orderdate IS NOT NULL) AS v2,
          count(*) FILTER (WHERE o_totalprice < 0.0 OR o_totalprice > 300000.0) AS v3,
          count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                           AND o_orderstatus NOT IN ('O','F')) AS v4,
          count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                           AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS v5
        FROM orders)
      SELECT expectation, violations, n_rows, violations = 0 AS passed
      FROM (
        SELECT 'not_null(o_orderkey)' AS expectation, CAST(v0 AS BIGINT) AS violations, n_rows FROM agg
        UNION ALL SELECT 'unique(o_orderkey)', CAST(v1 AS BIGINT), n_rows FROM agg
        UNION ALL SELECT 'unique(o_custkey,o_orderdate)', CAST(v2 AS BIGINT), n_rows FROM agg
        UNION ALL SELECT 'in_range(o_totalprice,0.0,300000.0)', CAST(v3 AS BIGINT), n_rows FROM agg
        UNION ALL SELECT 'one_of(o_orderstatus)', CAST(v4 AS BIGINT), n_rows FROM agg
        UNION ALL SELECT 'matches(o_orderpriority)', CAST(v5 AS BIGINT), n_rows FROM agg)
      ORDER BY expectation""")
}
