package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print a query's formatted executed plan (post-run, so
  * AQE's final plan) at the bench SF. Usage: runMain graft.PlanDump <name> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() (not a noop write, which runs a SEPARATE QueryExecution)
    // so df.queryExecution's own AQE plan finalizes and the dump shows
    // the runtime choices — stage reuse, AQE join flips — not the
    // initial static plan
    df.collect()
    println("=== EXECUTED (final AQE) ===")
    val full = df.queryExecution.executedPlan.toString
    println(full.take(12000))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT",
        "tmp/plandump.txt")), full)
    catch { case _: Throwable => () }
  }
}
