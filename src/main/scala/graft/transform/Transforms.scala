package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable transformation steps (SURVEY §2.2 P2-P5) — the reference's
  * transformation stage does "cleaning, enrichment, format conversion"
  * (README:316) with the output partitioned `year=/month=/day=/hour=`
  * (SDP.py:197).
  *
  * A step is just `DataFrame => DataFrame`; [[Transform.pipeline]] folds a
  * sequence of steps. Each step is declarative so Catalyst can fuse the
  * whole chain into one projection over the scan — a Transform pipeline
  * of clean→enrich→derive compiles to a single WholeStageCodegen stage
  * plus (only if enrichment joins) one broadcast join.
  */
object Transform {

  type Step = DataFrame => DataFrame

  def pipeline(steps: Step*): Step = df => steps.foldLeft(df)((d, s) => s(d))

  /** P2: trim + collapse whitespace on the given string columns. */
  def cleanStrings(cols: String*): Step = df =>
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, regexp_replace(trim(col(c)), "\\s+", " ")))

  /** P2: fill numeric nulls with a default. */
  def fillNulls(defaults: Map[String, Any]): Step = _.na.fill(defaults)

  /** P2: drop rows with nulls in required columns. */
  def requireColumns(cols: String*): Step = _.na.drop("any", cols)

  /** P2: exact dedup on a key, keeping an arbitrary-but-deterministic row
    * (min of `tieBreak`) per key — hash-shuffle on the key only. */
  def dedupByKey(keys: Seq[String], tieBreak: String): Step = df => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** CDC merge / upsert, latest-wins: apply a batch of keyed updates to a
    * base table — the batch analog of the reference's state-table
    * `put_item` (SDP.py:325-339), and the maintenance pass every ingest
    * pipeline runs (dedup-on-replay, backfill corrections, dimension
    * refresh).
    *
    * Semantics: one row per key survives — the one with the greatest
    * `versionCol` across base ∪ updates (an update with an older version
    * than the base row is a no-op, the CDC out-of-order case).
    * `versionCol` must strictly order rows within a key (a CDC
    * LSN/sequence number; ties would pick an arbitrary winner).
    *
    * Scale: one hash shuffle on the key; the rank-1 filter compiles to
    * WindowGroupLimit, so each map task forwards only its per-key best
    * row — the shuffle carries O(keys), not O(rows), when updates churn
    * few keys. Against a partitioned table, pair with
    * `Sinks.writePartitioned`'s dynamic overwrite so only partitions the
    * update batch touches are rewritten. */
  def upsert(base: DataFrame, updates: DataFrame,
             keys: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD2 history build: turn an append-only keyed change feed into a
    * type-2 slowly-changing-dimension table — every version of a key
    * becomes a row with its validity interval: `valid_from` = its
    * version, `valid_to` = the key's next version (null = still
    * current). One keyed shuffle; the interval derivation is a single
    * `lead` window. */
  def scd2(updates: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    updates
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** SCD2 incremental apply: merge a new change batch into an existing
    * history table WITHOUT rebuilding it — closed history rows pass
    * through untouched; each updated key's open row is closed at the
    * batch's first version for that key; the batch's own rows chain
    * among themselves. The contract (held by p08's oracle): apply(build
    * (old), new) ≡ build(old ∪ new) — incremental maintenance must be
    * indistinguishable from the global rebuild.
    *
    * Precondition: the batch's versions are ≥ the history's (append-only
    * CDC ingest). An out-of-order version would need its key's history
    * rebuilt — at scale that is a keyed anti-join + rebuild of the
    * affected keys only, not the table.
    *
    * Scale: history's closed rows (the bulk, ever-growing) are never
    * shuffled — only the per-key first-version aggregate of the (small)
    * batch joins against them; with history partitioned on `is_current`
    * the closed partitions are not even read. */
  def scd2Apply(history: DataFrame, updates: DataFrame,
                keys: Seq[String], versionCol: String): DataFrame = {
    val firstNew = updates.groupBy(keys.map(col): _*)
      .agg(min(col(versionCol)).as("__close_at"))
    // no broadcast hint: the per-key aggregate of a CDC batch is usually
    // tiny (AQE broadcasts it), but a backfill-sized batch must be free
    // to sort-merge
    val closed = history.join(firstNew, keys, "left")
      .withColumn("valid_to",
        when(col("is_current") && col("__close_at").isNotNull, col("__close_at"))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__close_at")
    closed.unionByName(scd2(updates, keys, versionCol))
  }

  /** Snapshot diff — categorize every key of two table versions as
    * added / removed / changed / unchanged by comparing a caller-supplied
    * row fingerprint (companion to [[upsert]]/[[scd2]]: they write the
    * new version, diff explains it; p14 is the query form).
    *
    * Scale: each side reduces to (key, fingerprint) on its own scan
    * before the single full-outer join, so the join never carries row
    * bodies; with both snapshots stored key-bucketed
    * ([[graft.sink.Sinks.writeBucketed]]) the join plans with zero
    * Exchange. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, fingerprint: Column): DataFrame = {
    val o = oldSnap.select(col(key).as("k"), fingerprint.as("fp_old"))
    val n = newSnap.select(col(key).as("k"), fingerprint.as("fp_new"))
    o.join(n, Seq("k"), "full")
      .select(col("k"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("category"))
  }

  /** P3: enrichment via broadcast join against a small dimension —
    * dimension rows ship with the plan, no shuffle of the fact side. */
  def enrich(dim: DataFrame, joinExpr: Column): Step = df =>
    df.join(broadcast(dim), joinExpr, "left")

  /** P3 (simple form): left broadcast join on equal column names. */
  def enrichOn(dim: DataFrame, key: String): Step = df =>
    df.join(broadcast(dim), Seq(key), "left")

  /** P5: derive the reference's partition-projection columns from a
    * timestamp (SDP.py:197 `year=!{timestamp:yyyy}/month=.../day=.../hour=`). */
  def derivePartitions(tsCol: String): Step = df =>
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))
}

/** Skew-handling aggregation (SURVEY §4 "salting for skew"): two-phase
  * aggregate where phase 1 groups on (key, salt) — splitting a hot key
  * across `saltBuckets` reducers — and phase 2 merges the partials per
  * key. Correct only for algebraic aggregates (sum/count/min/max), which
  * is what the caller supplies as partial and merge expression pairs.
  *
  * AQE's skew-join handling covers joins; salting is the aggregation-side
  * tool when one key carries a disproportionate share of a 100 TB table.
  */
object SaltedAggregate {
  import org.apache.spark.sql.{Column, DataFrame}

  /** @param partials  phase-1 aggregates over the raw rows, aliased
    * @param merges    phase-2 aggregates over the phase-1 columns, aliased
    *                  with the SAME names */
  def apply(df: DataFrame, key: String, saltBuckets: Int,
            partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
}
