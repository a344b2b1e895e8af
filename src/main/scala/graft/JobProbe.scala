package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the per-query job floor (VERDICT r6 item 1): runs
  * target queries warm and prints every Spark job behind the timed action
  * — wall time, stage count, task count, and the job group/description —
  * so redundant jobs (range-sort sampling passes, eager probes, AQE
  * re-plans) are attributable line by line.
  *
  * Usage: runMain graft.JobProbe [sfDir] [q1,q2,...]
  */
object JobProbe {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private final case class J(id: Int, var desc: String = "", var t0: Long = 0,
                             var t1: Long = 0, var stages: Int = 0, var tasks: Int = 0)

  private final class JobLog extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = J(e.jobId, Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""),
        e.time, 0, e.stageInfos.size, 0)
      jobs.put(e.jobId, j); ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.t1 = e.time); ()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      jobs.forEach((_, j) => if (j.t1 == 0) j.tasks += 1); ()
    }
    def drain(): Seq[J] = {
      import scala.jdk.CollectionConverters._
      val out = jobs.values.asScala.toSeq.sortBy(_.id)
      jobs.clear(); out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targets =
      (if (args.length > 1) args(1).split(",").toSeq
       else Seq("q01_pricing_summary", "q04_left_join", "q34_set_operators",
                "q36_dynamic_pivot", "q24_subquery")).filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val mpb = sys.env.getOrElse("SPARK_GRAFT_MPB", "128m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.files.openCostInBytes", sys.env.getOrElse("SPARK_GRAFT_OCB", "4194304"))
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
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    targets.foreach { n =>
      runToNoop(SparkEntry.queries(n)(spark, sfDir)) // warm
      Thread.sleep(300); log.drain()
      val t0 = System.nanoTime()
      runToNoop(SparkEntry.queries(n)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val js = log.drain()
      val jsum = js.map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"PROBE $n wall=$wall%.3f njobs=${js.size} job-sum=$jsum%.3f")
      js.foreach { j =>
        println(f"   job=${j.id}%-4d ${(j.t1 - j.t0) / 1e3}%6.3fs stages=${j.stages} tasks=${j.tasks} ${j.desc.take(100)}")
      }
    }
    spark.stop()
  }
}
