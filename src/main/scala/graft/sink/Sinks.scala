package graft.sink

import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks (SURVEY §2.1 K1-K3).
  *
  * K1 mirrors the reference's Firehose delivery: Parquet, GZIP-compressed,
  * Hive-partitioned `year=/month=/day=/hour=` derived from the record
  * timestamp (SDP.py:197-211). Partitioned layout + columnar format is
  * what makes the downstream query surface scale: partition pruning and
  * row-group min/max skipping both come free from this layout.
  *
  * K2 is the `errors/` quarantine (SDP.py:198) — failed rows are data,
  * not exceptions: they land in their own Parquet table with the error
  * reason and arrival batch attached, replayable later.
  */
object Sinks {

  /** K1: partitioned Parquet sink. Derives the partition columns from
    * `tsCol` if they are not already present. Dynamic partition overwrite
    * keeps re-runs idempotent per partition (only touched partitions are
    * replaced, never the whole table).
    *
    * Rows are REPARTITIONED on the partition columns before the write:
    * without it every input task writes a file into every hour directory
    * it touches — tasks × partitions small files (the classic
    * small-files catastrophe; at 1000 executors × hourly partitions that
    * is the table's death by metadata). Round 15: an EXPLICIT
    * `repartition(shuffle.partitions, partCols)` replaced the round-6
    * `REBALANCE` hint. The rebalance's AQE coalescing made write
    * parallelism a function of `coalescePartitions.minPartitionSize` —
    * at toy SF the round-14 256k floor coalesced the pre-write exchange
    * to a handful of tasks and serialized the dir-count-bound write
    * (st15 +2.2 s, x01 +1.1 s, x02 +0.8 s measured), which then needed
    * per-query 64k session pins. An explicit partition count is
    * floor-insensitive (AQE never coalesces REPARTITION_BY_NUM), sized
    * by the session's shuffle parallelism (the cluster-scale knob), and
    * still gives exactly one file per hour dir per write (each dir's
    * rows hash to one task). Trade stated: on the hot path a single
    * monster hour is no longer AQE-skew-split across tasks — at that
    * point file-size bounds are the contract and
    * [[writePartitionedSizeBudget]] is the sink. The SIZE-DRIVEN rewrite
    * path ([[compactPartitioned]], whose whole purpose is re-cutting
    * files by bytes) keeps the REBALANCE hint via `rebalance = true`:
    * there AQE's oversized-partition split IS the contract
    * (RoundThirteenOpsSpec's relaxed-regime law), and a maintenance
    * window tolerates the floor-coupled parallelism the hot path cannot.
    *
    * Rows are then SORTED within each task by (partition cols, ts). The
    * partition-column prefix satisfies the ordering the dynamic-partition
    * writer would otherwise sort for itself (so this costs nothing
    * extra), and the ts suffix makes every row group's min/max ts stats
    * tight — a time-range scan inside an hour skips row groups instead
    * of reading the whole file. */
  def writePartitioned(df: DataFrame, path: String, tsCol: String = "ts",
                       mode: SaveMode = SaveMode.Append,
                       rebalance: Boolean = false): Unit = {
    val withParts =
      if (df.columns.contains("year")) df
      else Transform.derivePartitions(tsCol)(df)
    // same existence filter for hint, sort, and partitionBy: a frame that
    // carries "year" (skipping derivePartitions) but not the full set
    // must not fail analysis on a hint/partition column it lacks
    val partCols = Seq("year", "month", "day", "hour")
      .filter(withParts.columns.contains)
    val ordering = (partCols ++ Seq(tsCol).filter(withParts.columns.contains)).map(col)
    val rebalanced =
      if (partCols.isEmpty) withParts
      else if (rebalance) withParts.hint("rebalance", partCols: _*)
      else withParts.repartition(
        withParts.sparkSession.sessionState.conf.numShufflePartitions,
        partCols.map(col): _*)
    val sorted =
      if (ordering.isEmpty) rebalanced else rebalanced.sortWithinPartitions(ordering: _*)
    sorted
      .write
      .mode(mode)
      .option("compression", "gzip")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** K1 byte half: the reference's Firehose delivery buffers 60 s OR
    * 5 MB, whichever crosses first (SDP.py:199-202). The time half is the
    * streaming trigger; THIS is the size half: within each Hive partition
    * the rows are split into consecutive "rolls" of at most `byteBudget`
    * serialized bytes (a record that crosses the boundary still joins the
    * roll it started in, like a Firehose buffer flush), and each roll
    * becomes exactly ONE output file. So a fat hour delivers
    * ceil(bytes/budget) bounded files instead of one unbounded one — the
    * property the downstream reader actually wants from Firehose's size
    * flush (no multi-GB objects, no seek-amplification).
    *
    * `sizeOf` is the per-row serialized-size measure in bytes. It must be
    * DETERMINISTIC (the roll assignment is content-addressed: re-runs and
    * checkpoint replays of the same rows produce the same file cuts) —
    * engine-portable string-length arithmetic, not an opaque serializer
    * probe. `orderCols` fixes the within-partition row order the running
    * byte count accumulates in (pass a unique tiebreaker; ts alone has
    * duplicates at scale).
    *
    * Scale shape: TWO hash exchanges of the batch — one on the partition
    * cols for the prefix-sum window (roll assignment needs a partition's
    * rows co-located and ordered), then one on (partition cols, roll) to
    * give each roll its own writer task. That is one more shuffle than
    * [[writePartitioned]]'s rebalance pays; the extra pass is inherent to
    * EXACT file cuts (a roll id is a function of the prefix sum, which
    * needs the first co-location before it can partition the second) and
    * buys the bounded-file-size contract. Use this sink when file-size
    * bounds are the contract (Firehose-style delivery); keep
    * [[writePartitioned]] when AQE-rebalanced best-effort sizes are
    * enough. Rolls are computed per write (per micro-batch epoch under
    * streaming), matching Firehose's per-delivery-window buffer. */
  def writePartitionedSizeBudget(df: DataFrame, path: String,
                                 sizeOf: org.apache.spark.sql.Column,
                                 orderCols: Seq[String],
                                 byteBudget: Long = 5L * 1024 * 1024,
                                 tsCol: String = "ts",
                                 mode: SaveMode = SaveMode.Append): Unit = {
    import org.apache.spark.sql.expressions.Window
    require(byteBudget > 0, "byteBudget must be positive")
    val withParts =
      if (df.columns.contains("year")) df
      else Transform.derivePartitions(tsCol)(df)
    val partCols = Seq("year", "month", "day", "hour")
      .filter(withParts.columns.contains)
    require(partCols.nonEmpty,
      s"writePartitionedSizeBudget needs partition columns (derived from $tsCol)")
    // roll = floor(exclusive-prefix-bytes / budget): the first row of a
    // partition always starts roll 0, and a row lands in the roll its
    // PREDECESSORS filled — the buffer it arrives into — so every roll
    // holds at least one row and crosses the budget by at most one record.
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val rolled = withParts.withColumn("_roll",
      floor(coalesce(sum(sizeOf).over(w), lit(0L)) / byteBudget.toDouble)
        .cast("long"))
    val allParts = partCols :+ "_roll"
    // hash-repartition on the full combo: every (partition, roll) group
    // lands in one task, and the dynamic writer opens one file per
    // partition DIRECTORY per task — exactly one file per roll. (Two
    // combos hash-colliding into one task still write to different dirs.)
    // Explicit partition count (round 15): same floor-insensitivity
    // rationale as [[writePartitioned]] — one-file-per-roll holds at ANY
    // count, so write parallelism must not swing with the AQE floor.
    rolled
      .repartition(
        withParts.sparkSession.sessionState.conf.numShufflePartitions,
        allParts.map(col): _*)
      .sortWithinPartitions((allParts ++ Seq(tsCol).filter(withParts.columns.contains)).map(col): _*)
      .write
      .mode(mode)
      .option("compression", "gzip")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(allParts: _*)
      .parquet(path)
    // Collapse the _roll=N level: hoist each roll's single file into its
    // hour directory (prefixed so rolls never collide) and drop the roll
    // dirs — the table keeps the plain K1 year/month/day/hour layout, with
    // ceil(bytes/budget) files per hour instead of one. Underscore-prefixed
    // dirs are invisible to Spark's file index, so a crash mid-hoist leaves
    // unhoisted rolls hidden rather than double-visible.
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    def hoist(dir: Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val name = st.getPath.getName
          if (name.startsWith("_roll=")) {
            val rollId = name.substring("_roll=".length)
            fs.listStatus(st.getPath).foreach { f =>
              if (f.isFile && f.getPath.getName != "_SUCCESS") {
                val target = new Path(dir, s"roll-$rollId-${f.getPath.getName}")
                if (!fs.rename(f.getPath, target))
                  throw new java.io.IOException(
                    s"size-budget hoist: rename ${f.getPath} -> $target returned false")
              }
            }
            fs.delete(st.getPath, true)
            ()
          } else hoist(st.getPath)
        }
      }
    hoist(new Path(path))
  }

  /** The engine's canonical record-size measure for the events feed: the
    * string payload bytes plus a fixed 64-byte envelope (timestamp, value,
    * framing). Deliberately a portable integer formula — the oracle
    * recomputes it verbatim — standing in for "serialized record bytes"
    * the way Firehose counts payload bytes. */
  def eventWireSize: org.apache.spark.sql.Column =
    (length(col("event_id").cast("string")) + length(col("event_type")) +
      length(col("user_id").cast("string")) +
      length(coalesce(col("props"), lit(""))) + lit(64))
      .cast("long")

  /** K2: quarantine sink — failed rows land with the error reason, the
    * stage that rejected them, and a batch id for replay bookkeeping.
    * Each (stage, batch) writes its own OVERWRITE-mode subdirectory, so a
    * retried or re-run batch REPLACES its prior quarantine rows instead
    * of appending a duplicate copy that replay would re-ingest. */
  def quarantine(df: DataFrame, path: String, stage: String, batchId: String): Unit =
    df.withColumn("_error_stage", lit(stage))
      .withColumn("_error_batch", lit(batchId))
      .withColumn("_error_at", current_timestamp())
      .write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .parquet(s"$path/b_${sanitize(stage)}_${sanitize(batchId)}")

  /** Read the quarantine table (recursive: one subdirectory per
    * (stage, batch), see [[quarantine]]). */
  def readQuarantine(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** K2 counterpart: read quarantined rows back for re-ingestion (the
    * reference's DLQ keeps messages 14 days precisely so they can be
    * replayed, SDP.py:125). Strips the error bookkeeping columns so the
    * result matches the original input schema. */
  def replayQuarantine(spark: org.apache.spark.sql.SparkSession, path: String,
                       batchId: Option[String] = None): DataFrame = {
    val all = readQuarantine(spark, path)
    val scoped = batchId.fold(all)(b => all.filter(col("_error_batch") === b))
    scoped.drop("_error_stage", "_error_batch", "_error_at", "errors")
  }

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9_-]", "_")

  /** K3: archive sink — immutable raw copy (SDP.py:268 ARCHIVE_BUCKET).
    * Run-scoped OVERWRITE subdirectory: re-running a pipeline id replaces
    * its own archive copy instead of appending a second one. */
  def archive(df: DataFrame, path: String, runId: String = "adhoc"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .parquet(s"$path/run_${sanitize(runId)}")

  /** Read the archive (recursive over per-run subdirectories). */
  def readArchive(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** Idempotent staged write: materialize under a work-scoped staging dir
    * with OVERWRITE (re-running a failed attempt replaces its own partial
    * output, never duplicates), then merge-move partition directories
    * into the live table. The write-once/promote-once split is what makes
    * micro-batch retries and the quality gate's promote-or-abandon safe
    * (SURVEY §7.4). */
  def writePartitionedStaged(df: DataFrame, livePath: String, stagingPath: String,
                             tsCol: String = "ts"): Unit = {
    writePartitioned(df, stagingPath, tsCol, SaveMode.Overwrite)
    promoteStaged(df.sparkSession, stagingPath, livePath)
  }

  /** Merge-move a staged tree into the live path (per-partition-directory
    * renames; existing partition dirs are descended into so concurrent
    * writers of different hours never clobber each other). */
  def promoteStaged(spark: org.apache.spark.sql.SparkSession,
                    stagingPath: String, livePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stagingPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(livePath)
    if (!fs.exists(live)) fs.mkdirs(live)
    moveTree(fs, new Path(stagingPath), live)
  }

  private def moveTree(fs: org.apache.hadoop.fs.FileSystem,
                       src: org.apache.hadoop.fs.Path,
                       dst: org.apache.hadoop.fs.Path): Unit = {
    fs.listStatus(src).foreach { st =>
      val target = new org.apache.hadoop.fs.Path(dst, st.getPath.getName)
      if (st.isDirectory && fs.exists(target)) moveTree(fs, st.getPath, target)
      else if (st.getPath.getName == "_SUCCESS" || fs.exists(target)) {
        // markers / already-present files: drop the staged copy, keep live
        fs.delete(st.getPath, true)
      } else if (!fs.rename(st.getPath, target)) {
        // HDFS/S3A return false instead of throwing (e.g. dst appeared
        // concurrently) — failing loudly lets the caller's retry handle
        // it; silently deleting staged-but-unmoved data would lose rows
        throw new java.io.IOException(
          s"promoteStaged: rename ${st.getPath} -> $target returned false")
      }
    }
    fs.delete(src, true)
    ()
  }

  /** Maintenance: rewrite a partitioned table's accumulated small files
    * into rebalanced ones (streaming micro-batches append a file per
    * batch per hour — after a day a busy hour holds hundreds of slivers,
    * and scan cost becomes file-open cost; see the measured ~6 ms/file
    * constant in [[graft.streaming.StreamReplay]]).
    *
    * `scope` limits the rewrite to matching partitions (e.g.
    * `col("day") === 12` — compact only yesterday), which is the
    * steady-state form: touch the partitions the last window wrote,
    * leave cold ones alone. The rewrite stages to a sibling dir via the
    * K1 write (rebalance + gzip) and then swaps each staged LEAF
    * partition directory over its live counterpart — untouched
    * partitions and the `_batches` markers are never visited. NOT safe
    * concurrently with writers of the same partitions; run it in the
    * maintenance window the reference's daily crawler occupies
    * (SDP.py:613-615).
    *
    * Returns (filesBefore, filesAfter) over the compacted scope. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession, livePath: String,
                         scope: Option[org.apache.spark.sql.Column] = None): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val staging = s"$livePath.compact-${java.util.UUID.randomUUID()}"
    val base = spark.read.parquet(livePath)
    // the swap replaces whole partition directories, so the scope MUST cut
    // on partition boundaries — a row-level predicate (e.g. on ts) would
    // silently drop the non-matching rows of every touched partition.
    // Checked by resolving the predicate against a LINEAGE-FREE frame of
    // only the partition columns (a projection of the table would not do:
    // ResolveMissingReferences pulls missing attributes up through it).
    scope.foreach { c =>
      val probe = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          Seq("year", "month", "day", "hour").map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.IntegerType))))
      val analyzed =
        try {
          val qe = probe.filter(c).queryExecution
          qe.assertAnalyzed(); qe.analyzed
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalArgumentException(
              "compactPartitioned scope must reference only partition columns " +
                s"(year/month/day/hour): ${e.getMessage}")
        }
      // resolution alone is not enough: rand() < 0.5 resolves against any
      // frame yet still cuts inside partitions — require determinism.
      // (Constants like lit(true) are fine: they cannot cut inside a
      // partition, they just scope everything in or out.)
      val cond = analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
      require(cond.forall(_.deterministic),
        "compactPartitioned scope must be a deterministic predicate over " +
          "the partition columns (year/month/day/hour)")
    }
    val scoped = scope.fold(base)(base.filter)
    // rebalance = true: compaction is the size-driven rewrite — AQE must
    // keep splitting an over-advisory hour across tasks/files (the
    // relaxed-regime law); see writePartitioned's scaladoc
    writePartitioned(scoped, staging, mode = SaveMode.Overwrite,
      rebalance = true)
    val fs = new Path(livePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // leaf partition dirs of the staged tree, relative to the staging root
    def leaves(dir: Path, rel: String): Seq[(Path, String)] = {
      val children = fs.listStatus(dir)
      val subdirs = children.filter(st => st.isDirectory)
      if (subdirs.isEmpty) Seq((dir, rel))
      else subdirs.toSeq.flatMap(st =>
        leaves(st.getPath, if (rel.isEmpty) st.getPath.getName
                           else s"$rel/${st.getPath.getName}"))
    }
    def fileCount(dir: Path): Long =
      if (!fs.exists(dir)) 0L
      else fs.listStatus(dir).count(st => st.isFile && st.getPath.getName != "_SUCCESS").toLong
    val staged = leaves(new Path(staging), "").filter(_._2.nonEmpty)
    val before = staged.map { case (_, rel) => fileCount(new Path(livePath, rel)) }.sum
    staged.foreach { case (src, rel) =>
      val dst = new Path(livePath, rel)
      fs.mkdirs(dst.getParent)
      // Swap via rename-aside, never delete-then-rename: the live leaf is
      // moved to a dot-prefixed sibling (invisible to Spark's file index)
      // and deleted only AFTER the staged leaf is in place — a failure
      // between the two steps leaves both copies on disk, recoverable by
      // the paths named in the exception, instead of a vanished partition.
      val aside = new Path(dst.getParent,
        s".compact-aside-${java.util.UUID.randomUUID()}-${dst.getName}")
      val hadLive = fs.exists(dst)
      if (hadLive && !fs.rename(dst, aside))
        throw new java.io.IOException(
          s"compactPartitioned: rename-aside $dst -> $aside failed; " +
            s"staged replacement tree preserved at $staging")
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"compactPartitioned: rename $src -> $dst failed; prior live data " +
            s"at $aside, staged replacement tree at $staging")
      if (hadLive) fs.delete(aside, true)
    }
    fs.delete(new Path(staging), true)
    val after = staged.map { case (_, rel) => fileCount(new Path(livePath, rel)) }.sum
    (before, after)
  }

  /** Bucketed catalog table — the co-located join layout (SURVEY §2.3,
    * §4): two tables bucketed+sorted on the same join key with the same
    * bucket count join with ZERO shuffle and zero sort (bucket files are
    * hash-placed and pre-sorted). At 100 TB this is the difference
    * between re-shuffling the fact table on every join and reading it
    * join-ready; bucket pruning on point predicates comes free. Bucketing
    * requires a catalog table (`saveAsTable`), not a bare path. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32,
                    mode: SaveMode = SaveMode.Overwrite,
                    path: Option[String] = None): Unit = {
    val w = df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    // an explicit path makes it an EXTERNAL table — the bucketed layout
    // lives at the caller's location instead of the session warehouse
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Training-shard sink: the layout [[graft.queries.PipelineQueries
    * .p09ShardManifest]] describes. Every row gets a deterministic
    * content-addressed shard ([[graft.functions.HashGate.shard]] of its
    * id), the frame is repartitioned ON the shard column so each shard's
    * rows land in one task, and the write is Hive-partitioned by shard —
    * one directory, and (absent AQE skew splits) one file, per shard.
    *
    * Why this shape at 100 TB: a training job reads shards as units
    * (shard dirs = the sampling/mixing granularity), so shard count is a
    * CONTRACT, not a parallelism artifact — it must not drift with the
    * writing cluster's task count. Hash assignment keeps it reproducible
    * from row identity alone; re-runs and late-arriving batches append
    * into the same shard dirs without touching the others. */
  def writeHashSharded(df: DataFrame, path: String, idCol: String,
                       numShards: Int = 16,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("shard", graft.functions.HashGate.shard(col(idCol), numShards))
      .repartition(numShards, col("shard"))
      .write
      .mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(path)
}
