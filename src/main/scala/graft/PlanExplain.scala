package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 14): write `explain("formatted")` output for a
  * comma-separated list of queries to `<outDir>/<name>_<tag>.txt` — the
  * optimization round's before/after plan evidence.
  *
  * Usage: runMain graft.PlanExplain <q1,q2,...> <tag> [outDir] [sfDir]
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r14"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), formatted)
        println(s"PLAN $name -> $outDir/${name}_$tag.txt (${formatted.length} chars)")
      } catch {
        case e: Throwable => println(s"PLAN $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
