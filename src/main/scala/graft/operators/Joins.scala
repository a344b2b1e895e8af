package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (SURVEY §2.3).
  *
  * The as-of join — "for each left row, the latest right row at or before
  * its timestamp, per key" — is the canonical time-series enrich join.
  * Spark has no native operator for it, and the naive formulations do not
  * scale: a non-equi range join plans as a broadcast-nested-loop
  * (O(|L|·|R|) per key), and a groupBy-collect per key materializes whole
  * histories.
  *
  * This implementation uses the union-merge construction instead: stack
  * both sides, sort each key's timeline once (a single shuffle on the
  * key, the same cost as any equi-join), and carry the most recent right
  * payload forward with a running `last(ignoreNulls)` window. Cost is
  * O((|L|+|R|) log per-partition) with no per-key blowup — at 100 TB it
  * behaves exactly like a sort-merge join.
  */
object Joins {

  /** As-of join (backward, inclusive): each left row matches the right
    * row with the greatest `rightTs <= leftTs` for the same `key`.
    *
    * @param payload right-side columns to carry (pre-aliased); they MUST
    *                not collide with left column names.
    * @param tieBreak orders right rows sharing (key, ts) by this column's
    *                natural sort order (any orderable type — no numeric
    *                cast); the greatest wins, making ties deterministic.
    * @param within  optional tolerance horizon (the stale-quote cutoff):
    *                a match older than this is discarded — the left row
    *                is still emitted with a null payload. Compared as
    *                `leftTs - matchedTs <= within`, so pass an interval
    *                literal for timestamp axes (`expr("INTERVAL '30'
    *                MINUTE")`) or a plain number for numeric axes.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: Column, rightTs: Column,
           payload: Seq[Column], tieBreak: Column,
           within: Option[Column] = None): DataFrame = {
    val payloadNames = right.select(payload: _*).columns.toSeq
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), rightTs.as("__ts"), tieBreak.as("__tie"),
        // the matched row's own ts rides inside the payload struct so the
        // horizon check is one filter on the window output — no extra
        // shuffle, no second pass
        struct(payload :+ rightTs.as("__rts"): _*).as("__payload"))
      .withColumn("__side", lit(0))
    val stacked = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at an equal timestamp → inclusive
    // (<=) semantics; __tie orders same-timestamp right rows.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = stacked.withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
    val keep = within match {
      case Some(d) => col("__ts") - col("__match.__rts") <= d
      case None    => lit(true)
    }
    val outCols = left.columns.map(col) ++ payloadNames.map { n =>
      (if (within.isDefined) when(keep, col(s"__match.$n")) else col(s"__match.$n")).as(n)
    }
    matched.filter(col("__side") === 1).select(outCols.toIndexedSeq: _*)
  }

  /** As-of join (forward, inclusive): each left row matches the right
    * row with the SMALLEST `rightTs >= leftTs` for the same `key` — the
    * "next event after" attribution join (view → next purchase, error →
    * next recovery). Same union-merge construction as [[asOf]] with the
    * timeline walked DESCENDING, so the running `last(ignoreNulls)` at a
    * left row is the nearest right row at-or-after it. Cost identical to
    * [[asOf]]: one shuffle on the key, one per-partition sort.
    *
    * @param tieBreak orders right rows sharing (key, ts) by this column's
    *                 natural sort order (any orderable type — no numeric
    *                 cast); the SMALLEST wins (mirror of [[asOf]]'s
    *                 greatest-wins), keeping ties deterministic.
    * @param within   optional tolerance horizon, mirrored forward: a match
    *                 further ahead than this is discarded (null payload).
    *                 Compared as `matchedTs - leftTs <= within`. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: Column, rightTs: Column,
                  payload: Seq[Column], tieBreak: Column,
                  within: Option[Column] = None): DataFrame = {
    val payloadNames = right.select(payload: _*).columns.toSeq
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), rightTs.as("__ts"), tieBreak.as("__tie"),
        struct(payload :+ rightTs.as("__rts"): _*).as("__payload"))
      .withColumn("__side", lit(0))
    val stacked = l.unionByName(r, allowMissingColumns = true)
    // Descending timeline; right rows still sort before left rows at an
    // equal timestamp → inclusive (>=); __tie DESC makes the smallest
    // tie the last-seen (winning) right row.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = stacked.withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
    val keep = within match {
      case Some(d) => col("__match.__rts") - col("__ts") <= d
      case None    => lit(true)
    }
    val outCols = left.columns.map(col) ++ payloadNames.map { n =>
      (if (within.isDefined) when(keep, col(s"__match.$n")) else col(s"__match.$n")).as(n)
    }
    matched.filter(col("__side") === 1).select(outCols.toIndexedSeq: _*)
  }

  /** As-of join (nearest, inclusive): each left row matches the right row
    * minimizing `|rightTs - leftTs|` for the same `key` — the symmetric
    * "closest event in time" enrich (sensor alignment, log correlation),
    * which neither directed walk can express alone. Built as BOTH walks
    * over ONE stacked union: the same key-shuffle feeds an ascending and
    * a descending running `last(ignoreNulls)` window (two in-partition
    * sorts, still one exchange), and a per-row CASE picks the closer
    * side. Cost is one shuffle + two sorts — at 100 TB it behaves like a
    * sort-merge join with a second sort pass, with no per-key blowup.
    *
    * Tie rules: equal distance prefers the BACKWARD match; same-(key,ts)
    * right rows resolve by `tieBreak` natural order ([[asOf]]'s greatest
    * wins on the backward side, [[asOfForward]]'s smallest on the
    * forward side).
    *
    * @param within optional symmetric horizon: a side whose gap exceeds
    *               it is ineligible; if both are, the left row emits a
    *               null payload. */
  /** Bracketing as-of: each left row matched to BOTH its backward
    * ([[asOf]]) and forward ([[asOfForward]]) right row in one pass —
    * the primitive under gap-fill interpolation, and generally useful
    * wherever "the reading before AND after" is the question (sensor
    * resampling, price interpolation, SLA gap audits). Same single
    * key-shuffle + two in-partition sorts as [[asOfNearest]]; the two
    * directed walks share one stacked union.
    *
    * Emits left columns ++ `prev_<out>`, `prev_ts`, `next_<out>`,
    * `next_ts` (null where that side has no match). The time axis must
    * be NUMERIC (pass `unix_micros(ts)` for timestamps) so downstream
    * interpolation arithmetic is exact; `value` must be numeric.
    *
    * Tie rules match the directed walks: same-(key,ts) right rows
    * resolve by `tieBreak` (greatest wins backward, smallest forward);
    * a right row exactly AT the left ts matches in both directions
    * (prev_ts = next_ts), which downstream blends must treat as "use
    * either side verbatim", never divide by the zero gap. */
  def asOfBracket(left: DataFrame, right: DataFrame, key: String,
                  leftTs: Column, rightTs: Column,
                  value: Column, tieBreak: Column,
                  out: String): DataFrame = {
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), rightTs.as("__ts"), tieBreak.as("__tie"),
        struct(value.as("v"), rightTs.as("__rts")).as("__payload"))
      .withColumn("__side", lit(0))
    val stacked = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = stacked
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wb))
      .withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wf))
    val outCols = left.columns.map(col) ++ Seq(
      col("__mb.v").as(s"prev_$out"), col("__mb.__rts").as("prev_ts"),
      col("__mf.v").as(s"next_$out"), col("__mf.__rts").as("next_ts"))
    matched.filter(col("__side") === 1).select(outCols.toIndexedSeq: _*)
  }

  /** Linear-interpolation as-of (gap fill): each left row gets the
    * right-side `value` linearly interpolated between its bracketing
    * right rows — `vb + (vf - vb) · (ts - tsb) / (tsf - tsb)` — the
    * time-series resampling join (fill a sensor reading at an arbitrary
    * instant from its neighbors). Edge semantics: only one side matched
    * → that side's value verbatim (constant extrapolation at series
    * edges); an exact-ts match → that row's value (no division by the
    * zero gap); no match either side → null. Cost identical to
    * [[asOfBracket]], which does all the heavy lifting.
    */
  def asOfInterpolate(left: DataFrame, right: DataFrame, key: String,
                      leftTs: Column, rightTs: Column,
                      value: Column, tieBreak: Column,
                      out: String): DataFrame = {
    val b = asOfBracket(left, right, key, leftTs, rightTs, value, tieBreak, out)
    val pv = col(s"prev_$out"); val nv = col(s"next_$out")
    val interp = when(pv.isNotNull && nv.isNotNull,
        when(col("next_ts") === col("prev_ts"), pv)
          .otherwise(pv + (nv - pv) *
            ((col("__lts") - col("prev_ts")).cast("double") /
             (col("next_ts") - col("prev_ts")).cast("double"))))
      .when(pv.isNotNull, pv)
      .otherwise(nv)
    b.withColumn("__lts", leftTs)
      .withColumn(out, interp)
      .drop("__lts", s"prev_$out", "prev_ts", s"next_$out", "next_ts")
  }

  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: Column, rightTs: Column,
                  payload: Seq[Column], tieBreak: Column,
                  within: Option[Column] = None): DataFrame = {
    val payloadNames = right.select(payload: _*).columns.toSeq
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), rightTs.as("__ts"), tieBreak.as("__tie"),
        struct(payload :+ rightTs.as("__rts"): _*).as("__payload"))
      .withColumn("__side", lit(0))
    val stacked = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = stacked
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wb))
      .withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wf))
    val gb = col("__ts") - col("__mb.__rts")
    val gf = col("__mf.__rts") - col("__ts")
    val bOk = col("__mb").isNotNull &&
      within.map(d => gb <= d).getOrElse(lit(true))
    val fOk = col("__mf").isNotNull &&
      within.map(d => gf <= d).getOrElse(lit(true))
    val useB = bOk && (!fOk || gb <= gf)
    val outCols = left.columns.map(col) ++ payloadNames.map { n =>
      when(useB, col(s"__mb.$n")).when(fOk, col(s"__mf.$n")).as(n)
    }
    matched.filter(col("__side") === 1).select(outCols.toIndexedSeq: _*)
  }
}
