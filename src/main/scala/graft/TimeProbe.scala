package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 15): warm + two timed noop-sink runs (min) for a
  * list of queries, printing wall and process-cpu per row — the same
  * measurement Bench makes, scoped to a target list for per-change A/B
  * evidence without a 20-minute full-surface run.
  *
  * Usage: runMain graft.TimeProbe [sfDir] [q1,q2,...]
  */
object TimeProbe {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targets =
      (if (args.length > 1) args(1).split(",").toSeq else Seq.empty)
        .filter(SparkEntry.queries.contains)
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
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec: Double = osBean.getProcessCpuTime / 1e9
    spark.range(1000000L).selectExpr("sum(id)").collect()
    targets.foreach { n =>
      val fn = SparkEntry.queries(n)
      try runToNoop(fn(spark, sfDir)) catch { case _: Throwable => () } // warm
      val readings = (1 to 2).map { _ =>
        val c0 = cpuSec
        val t0 = System.nanoTime()
        runToNoop(fn(spark, sfDir))
        ((System.nanoTime() - t0) / 1e9, cpuSec - c0)
      }
      val best = readings.minBy(_._1)
      println(f"TIME $n%-28s wall=${best._1}%6.3f cpu=${best._2}%7.2f")
    }
    spark.stop()
  }
}
