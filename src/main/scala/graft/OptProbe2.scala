package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 14): per-session A/B of shuffle-partition count
  * and AQE coalescing floors on the heavy dedup rows — the probe behind
  * the §3 floor decision in OPTIMIZATION_r14.md. */
object OptProbe2 {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
  private def cpuSec: Double = osBean.map(_.getProcessCpuTime / 1e9).getOrElse(-1.0)

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
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def timeIn(tag: String, parts: String, name: String,
               extra: Map[String, String] = Map.empty): Unit = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.session.timeZone", "UTC")
      s2.conf.set("spark.sql.shuffle.partitions", parts)
      extra.foreach { case (k, v) => s2.conf.set(k, v) }
      val fn = SparkEntry.queries(name)
      try runToNoop(fn(s2, sfDir)) catch { case e: Throwable => println(s"$tag FAILED $e"); return }
      val readings = (1 to 2).map { _ =>
        val c0 = cpuSec; val t0 = System.nanoTime()
        runToNoop(fn(s2, sfDir))
        ((System.nanoTime() - t0) / 1e9, cpuSec - c0)
      }
      val best = readings.minBy(_._1)
      println(f"AB $tag%-28s wall=${best._1}%6.2f cpu=${best._2}%7.2f")
    }
    timeIn("d20@32", "32", "d20_prefix_join")
    timeIn("d20@32+aqe256k", "32", "d20_prefix_join",
      Map("spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "256k"))
    timeIn("d20@32+aqe1m", "32", "d20_prefix_join",
      Map("spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m"))
    timeIn("d02@32+aqe1m", "32", "d02_ngram_jaccard",
      Map("spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m"))
    timeIn("d22@32+aqe1m", "32", "d22_dfcap_index",
      Map("spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m"))
    timeIn("d20@32+aqe-pfirst", "32", "d20_prefix_join",
      Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m"))
    timeIn("d02@32+aqe-pfirst", "32", "d02_ngram_jaccard",
      Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m"))
    timeIn("d22@32+aqe-pfirst", "32", "d22_dfcap_index",
      Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m"))
    spark.stop()
  }
}
