package graft.state

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job bookmark — the incremental-batch ingest contract (the Glue
  * "job bookmark" / lakehouse high-watermark shape; generalizes the
  * reference's event-driven triggers to SCHEDULED batch reruns over an
  * append-only source, SDP.py's S3-drop trigger re-run on a timer):
  * each run processes only rows past the recorded watermark, lands its
  * partial under a runId-keyed dir, and advances the watermark LAST.
  *
  * Crash semantics, in order of the writes: a run that dies before
  * landing reprocesses its slice next time (nothing recorded); one that
  * dies after landing but before the advance re-lands the SAME slice
  * under the same runId-keyed dir (idempotent overwrite) and then
  * advances — at-least-once on the partial, exactly-once in the
  * accumulated table. A run that sees nothing past the watermark is a
  * NO-OP: no partial dir, no watermark row.
  *
  * Scale: the slice filter is `axis > watermark` — on a time-partitioned
  * lake that is partition pruning, so a daily rerun reads the new
  * partitions, never the history. The bookmark itself is an append-only
  * parquet audit trail (run_id, watermark_us), one row per advancing
  * run; `read` takes the max.
  */
object Bookmark {

  /** Current high watermark (exact microseconds), or None before the
    * first advancing run. A crash-TORN bookmark dir (the committer's
    * `_temporary` exists but no parquet file ever committed) reads as
    * absent, not as an error — the documented "died before the advance"
    * semantics must hold even when the crash was mid-advance: parquet
    * commits whole files, so whatever footers exist are prior complete
    * advances and their max is the correct pre-crash watermark. */
  def read(s: SparkSession, bookmarkPath: String): Option[Long] = {
    val hp = new org.apache.hadoop.fs.Path(bookmarkPath)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) None
    else if (!fs.listFiles(hp, true).hasNext) None
    else
      try Option(s.read.parquet(bookmarkPath)
          .agg(max(col("watermark_us"))).head.getAs[java.lang.Long](0))
        .map(_.longValue())
      catch {
        // dir holds only uncommitted temp droppings — no schema to infer
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && e.getMessage.contains("infer") => None
      }
  }

  /** One incremental run over what is currently visible. `axisUs` must
    * be a monotone arrival axis in exact microseconds (e.g.
    * `unix_micros(col("ts"))`). Returns the number of rows processed
    * (0 = no-op rerun, nothing landed, watermark untouched). */
  def runIncremental(visible: DataFrame, axisUs: Column, runId: String,
                     partialsDir: String, bookmarkPath: String)
                    (process: DataFrame => DataFrame): Long = {
    val s = visible.sparkSession
    val withAxis = visible.withColumn("__axis", axisUs)
    val slice = read(s, bookmarkPath)
      .fold(withAxis)(w => withAxis.filter(col("__axis") > w))
    // a stats pre-pass, not a second data pass: the agg projects only
    // the axis column, so parquet column pruning (and, on a
    // time-partitioned lake, partition pruning) reduces it to a
    // single-column scan of the new slice — the process() pass below
    // is the only full-width read
    val head = slice.agg(max(col("__axis")), count(lit(1))).head
    val n = head.getLong(1)
    if (n > 0) {
      process(slice.drop("__axis"))
        .write.mode("overwrite").parquet(s"$partialsDir/run=$runId")
      s.createDataFrame(Seq((runId, head.getLong(0))))
        .toDF("run_id", "watermark_us")
        .write.mode("append").parquet(bookmarkPath)
    }
    n
  }
}
