package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev diagnostic (round 15): run st-replay rows warm and print every
  * micro-batch's durationMs attribution (triggerExecution, queryPlanning,
  * walCommit, getBatch, latestOffset, addBatch, commitOffsets) plus the
  * state-store commit totals — so the wall-vs-job-sum gap JobProbe
  * surfaced on the st family is attributable to a named phase instead of
  * guessed at.
  *
  * Usage: runMain graft.StProbe [sfDir] [q1,q2,...]
  */
object StProbe {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Shared sink for every session's listener instance — the st rows run
    * their streams in CLONED sessions, which inherit
    * `spark.sql.streaming.streamingQueryListeners` from the builder conf
    * and instantiate their own listener feeding this queue. */
  val events = new java.util.concurrent.ConcurrentLinkedQueue[String]

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targets =
      (if (args.length > 1) args(1).split(",").toSeq
       else Seq("st11_outer_join_replay", "st13_asof_replay")).filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MINPART", "256k"))
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.GraftProgressListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    targets.foreach { n =>
      runToNoop(SparkEntry.queries(n)(spark, sfDir)) // warm
      Thread.sleep(500); StProbe.events.clear()
      val t0 = System.nanoTime()
      runToNoop(SparkEntry.queries(n)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"STPROBE $n wall=$wall%.3f")
      StProbe.events.forEach(l => println(l))
      StProbe.events.clear()
    }
    spark.stop()
  }
}

/** Instantiated per session from the `streamingQueryListeners` conf;
  * every instance feeds [[StProbe.events]]. Dev-probe only. */
class GraftProgressListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    import scala.jdk.CollectionConverters._
    val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"$k=$v" }.mkString(" ")
    val state = Option(p.stateOperators).map(_.toSeq.map(so =>
      s"commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes}").mkString(" | "))
      .getOrElse("")
    StProbe.events.add(
      f"  batch=${p.batchId}%-3d rows=${p.numInputRows}%-6d $dur  [$state]")
    ()
  }
}
