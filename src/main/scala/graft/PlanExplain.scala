package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 14): write `explain("formatted")` output for a
  * comma-separated list of queries to `<outDir>/<name>_<tag>.txt` — the
  * optimization round's before/after plan evidence.
  *
  * Round 15 (VERDICT r14 item 9): queries that eagerly materialize
  * intermediate frames (localCheckpoint / persist+count) hide everything
  * above the lineage cut from the top-level plan — the r14 dumps for the
  * shingle family were `Scan ExistingRDD` and proved nothing. Those
  * materializations run through `Dataset.withAction`, so a
  * QueryExecutionListener sees each one's OWN executed plan; every
  * intermediate execution triggered while the query function builds is
  * now appended to the same dump file, making claims above a checkpoint
  * plan-verifiable.
  *
  * Usage: runMain graft.PlanExplain <q1,q2,...> <tag> [outDir] [sfDir]
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // collects the plan of every intermediate execution (checkpoint /
    // count / collect) the query function triggers while building
    val subPlans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit = {
        subPlans.add((fn, qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))); ()
      }
      override def onFailure(fn: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        subPlans.clear()
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Thread.sleep(1500) // the execution-listener bus is async
        val subs = {
          import scala.jdk.CollectionConverters._
          subPlans.asScala.toSeq
        }
        val body = new StringBuilder
        body ++= "== TOP-LEVEL PLAN ==\n" ++= formatted
        subs.zipWithIndex.foreach { case ((action, p), i) =>
          body ++= s"\n== INTERMEDIATE EXECUTION ${i + 1} ($action) — " +
            "materialized while building the query ==\n" ++= p
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), body.toString)
        println(s"PLAN $name -> $outDir/${name}_$tag.txt " +
          s"(${formatted.length} chars top, ${subs.size} intermediate)")
      } catch {
        case e: Throwable => println(s"PLAN $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
