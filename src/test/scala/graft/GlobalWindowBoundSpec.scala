package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** The bounded-global-window invariant (VERDICT r11 item 4).
  *
  * A number of rows deliberately use a partition-less window — Spark's
  * `WindowExec: No Partition Defined` warning — because their input is a
  * SMALL, DERIVED frame (vocabulary rungs, histogram buckets/bins, hour
  * domains, per-source mixes, a reservoir of k candidates), where a
  * single-partition sort is the right plan. The danger is the warning
  * becoming noise: a future row could ship a CORPUS-SIZED global window
  * and drown in it. This spec makes the invariant executable:
  *
  *  1. sweep EVERY SparkEntry query's optimized logical plan for
  *     partition-less Window nodes — any query not in the allowlist below
  *     fails the build;
  *  2. for each allowlisted query, execute it and measure the actual row
  *     count flowing through each partition-less WindowExec (window
  *     operators preserve cardinality, so the node's own output count IS
  *     its input count) against the documented constant.
  *
  * The bounds are DERIVATION bounds, not corpus measurements: the framed
  * quantity is a bucket/bin/rung/source domain whose size is fixed by the
  * operator's own constants, independent of corpus size.
  */
class GlobalWindowBoundSpec extends SparkSpec {

  /** query -> max rows allowed through any of its partition-less windows.
    * Keys are the EXACT SparkEntry names; a query that acquires a global
    * window without an entry here fails test 1.
    *
    *  - rung/ladder rows (t25/t26/t27): one row per corpus-size rung /
    *    candidate merge / vocab budget — ≤ 64 by their constant tables;
    *  - bucket/bin statistics (g26/g28/g30/g32/g36/p32): cents-bucket or
    *    digit/bin domains — cents ∈ [0, 10000) div 16 → ≤ 4096 buckets,
    *    Benford digits ≤ 9, χ²/KS bins ≤ 4096;
    *  - hour/day domains (g03/g06): ≤ 8784 (hours in a leap year);
    *  - mix rows (p13/p18): one row per (source, lang) cell / epoch
    *    spec — ≤ 4096;
    *  - reservoirs (p33/st16): k + tie candidates, k = 100 — ≤ 4096. */
  private val Allow: Map[String, Long] = Map(
    "t25_vocab_growth"  -> 64L,
    "t26_bpe_pairs"     -> 64L,
    "t27_oov_ladder"    -> 64L,
    "g03_drift_monitor" -> 8784L,
    "g06_anomaly"       -> 8784L,
    "g26_chi_square"    -> 4096L,
    // g41: midrank marginals — x ≤ KendallMaxCells/24 (the grid-premise
    // require in rankGridCells), y ≤ 24 hours
    "g41_spearman_rho"  -> 1024L,
    "g28_benford"       -> 4096L,
    "g30_rank_sum"      -> 4096L,
    "g32_ks_test"       -> 4096L,
    "g36_cusum"         -> 8784L,
    "p13_source_mix"    -> 4096L,
    "p18_epoch_mix"     -> 4096L,
    "p32_pps_sample"    -> 4096L,
    "p33_weighted_reservoir" -> 4096L,
    "st16_reservoir_replay"  -> 4096L
  )

  private def globalLogicalWindows(
      df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }.size
  }

  /** Recurse through AQE wrappers (collect() stops at query-stage
    * boundaries) to find every partition-less WindowExec. */
  private def globalWindowExecs(p: SparkPlan): Seq[WindowExec] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(i.relation.cachedPlan)
      case other => other.children
    }
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Seq.empty
    }
    here ++ kids.flatMap(globalWindowExecs)
  }

  test("every partition-less logical Window in the query surface is allowlisted") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = try globalLogicalWindows(fn(spark, sf))
                catch { case e: Throwable =>
                  fail(s"$name failed to build: ${e.getMessage}") }
        if (n > 0 && !Allow.contains(name)) Some(s"$name ($n global windows)")
        else None
    }
    assert(offenders.isEmpty,
      s"unallowlisted global windows — document a row bound in Allow or " +
        s"repartition the window: ${offenders.mkString(", ")}")
  }

  test("each allowlisted global window stays under its documented row bound") {
    val measured = Allow.toSeq.sortBy(_._1).map { case (name, bound) =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE so the real per-stage plans exist
      val ws = globalWindowExecs(df.queryExecution.executedPlan)
      val counts = ws.map(_.execute().count())
      info(s"$name: global-window input rows ${counts.mkString(",")} (bound $bound)")
      (name, bound, counts)
    }
    measured.foreach { case (name, bound, counts) =>
      counts.foreach { n =>
        assert(n <= bound,
          s"$name: a global WindowExec saw $n rows > documented bound $bound")
      }
    }
  }
}
