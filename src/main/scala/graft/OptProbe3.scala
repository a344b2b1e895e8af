package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 14): runs d20 in a loop for ~90 s so an external
  * JFR session (jcmd <pid> JFR.start) can sample it — the profile behind
  * the per-task shuffle-constant finding in OPTIMIZATION_r14.md. */
object OptProbe3 {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runToNoop(SparkEntry.queries("d20_prefix_join")(spark, sfDir))
    println("PROFILE_READY pid=" + ProcessHandle.current().pid())
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < 90000) {
      runToNoop(SparkEntry.queries("d20_prefix_join")(spark, sfDir))
    }
    println("PROFILE_DONE")
    spark.stop()
  }
}
