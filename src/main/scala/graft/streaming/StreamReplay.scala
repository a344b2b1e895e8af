package graft.streaming

import graft.Tables
import graft.model.PipelineLayout
import graft.validate.SchemaValidator.Rule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable batch replay of the streaming ingestion path
  * (SURVEY §2.8 T1/T2/T6): the events table is staged as JSON files, run
  * through the REAL streaming pipeline — file source → rule validation →
  * partition derivation → checkpointed retry/quarantine partitioned sink —
  * with `Trigger.AvailableNow` (drain everything, then stop), and the
  * landed partitioned table is rolled up to per-hour counts.
  *
  * The result must equal the purely-batch partition derivation (p05's
  * oracle), which makes the whole streaming sink path — staging, promotion,
  * batch markers, partition layout — a hard CORRECTNESS row instead of
  * spec-only coverage. Streaming semantics that need wall-clock time
  * (watermark drops, ProcessingTime cadence) stay in StreamingSpec.
  *
  * Bench note: this row costs ~6 s at sf0.1 and that is dominated by the
  * partitioned WRITE, not the streaming machinery — the test corpus spans
  * 720 hour-partitions of ~1,400 rows each, and a vanilla Parquet dynamic
  * write pays ~6 ms/partition-dir (writer open/footer/commit-rename;
  * measured: 30 dirs → 0.6 s, 720 dirs → 4.5 s, codec- and
  * committer-version-independent). It is a test-scale artifact: real
  * hourly partitions are MB-to-GB-scale, where the per-dir constant
  * vanishes against data volume.
  */
object StreamReplay {

  type Q = (SparkSession, String) => DataFrame

  def st01StreamReplay(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-st01-").toString
    try {
      val ev = Tables.events(s, d)
      // stage the table as the landing-zone JSON feed the reference ingests
      ev.write.mode("overwrite").json(s"$tmp/incoming")
      val layout = PipelineLayout(s"$tmp/lake")
      val source = StreamingPipeline.jsonFileSource(
        s, s"$tmp/incoming", ev.schema, maxFilesPerTrigger = 1000)
      // an always-true rule: st01 checks the sink path's row accounting, so
      // every row must land in processed/ (p02-style routing is p01's job)
      val stream = StreamingPipeline.processingStream(
        source, Seq(Rule("always_true", lit(true))))
      val query = StreamingPipeline
        .partitionedSink(stream, layout, availableNow = true)
        .start()
      query.awaitTermination()
      s.read.parquet(layout.processed)
        .groupBy(col("year"), col("month"), col("day"), col("hour"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("year"), col("month"), col("day"), col("hour"))
        // materialize before deleting the lake the plan reads from; each
        // replay otherwise leaks two full copies of events under /tmp
        .localCheckpoint(eager = true)
    } finally {
      // success or failure, never leak the staged JSON copy + lake — and
      // never let a cleanup failure mask the replay's own exception
      try {
        val p = new org.apache.hadoop.fs.Path(tmp)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      } catch { case _: Throwable => () }
    }
  }

  val queries: Map[String, Q] = Map(
    "st01_stream_replay" -> st01StreamReplay _,
  )

  /** Same oracle as p05: the streamed partition layout must agree with the
    * batch derivation row-for-row. */
  val oracleSql: Map[String, String] = Map(
    "st01_stream_replay" -> """
      SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day, hour(ts) AS hour,
             count(*) AS n_rows
      FROM events GROUP BY 1, 2, 3, 4 ORDER BY year, month, day, hour""",
  )
}
