package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic (round 14): piecewise cpu/wall decomposition of the
  * dedup-family pipelines plus per-stage cpu attribution — the probe
  * behind OPTIMIZATION_r14.md §"Where the CPU actually goes". */
object OptProbe {
  private def runToNoop(df: DataFrame): Unit =
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
    import graft.text.TextAnalysis.tokens
    import graft.dedup.Dedup.shingles

    val docs = Tables.documents(spark, sfDir)

    def piece(name: String)(mk: => DataFrame): Unit = {
      // warm once, then two timed runs (min), reporting wall + cpu
      try runToNoop(mk) catch { case e: Throwable => println(s"PIECE $name FAILED: $e"); return }
      val readings = (1 to 2).map { _ =>
        val c0 = cpuSec; val t0 = System.nanoTime()
        runToNoop(mk)
        ((System.nanoTime() - t0) / 1e9, cpuSec - c0)
      }
      val best = readings.minBy(_._1)
      println(f"PIECE $name%-28s wall=${best._1}%6.2f cpu=${best._2}%7.2f")
    }

    spark.range(1000000L).selectExpr("sum(id)").collect()

    piece("scan_text")(docs.select(col("doc_id"), col("text")))
    piece("norm_text")(docs.select(col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("n")))
    piece("tokens")(docs.select(col("doc_id"), tokens(col("text")).as("t")))
    piece("shingles")(docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh")))
    piece("shingles_native")(docs.select(col("doc_id"),
      graft.functions.ShingleFunctions.shingles3(col("text")).as("sh")))
    piece("shingles_explode_hash")(docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("sg"))
      .select(col("doc_id"), xxhash64(col("sg")).as("h")))
    // the checkpointed index + probe + self-join, as d02 runs them
    piece("d02_full")(graft.dedup.Dedup.d02NgramJaccard(spark, sfDir))

    // pieces of d02 off a checkpointed index
    val inv = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("sg"))
      .select(col("doc_id"), xxhash64(col("sg")).as("h"))
      .localCheckpoint(true)
    piece("probe_anyOverCap") {
      inv.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") > 64).limit(1)
    }
    val sub = inv.repartition(col("h"))
    piece("selfjoin_pairs") {
      sub.as("a").join(sub.as("b").hint("merge"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
    }

    // --- d20 decomposition --------------------------------------------
    import org.apache.spark.sql.expressions.Window
    val inv20 = docs
      .select(col("doc_id"), graft.functions.ShingleFunctions.shingles3(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("sg"))
      .select(col("doc_id"), col("n"), xxhash64(col("sg")).as("h"))
      .localCheckpoint(true)
    val wDf = Window.partitionBy(col("h"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    piece("d20_df_window")(inv20.withColumn("df", count(lit(1)).over(wDf)))
    piece("d20_both_windows")(inv20
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("pos", row_number().over(wDoc)))
    val prefix20 = inv20
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("n") - ceil(col("n") * 0.5) + 1)
      .select(col("doc_id"), col("h"), col("n"))
      .repartition(col("h"))
    piece("d20_prefix_selfjoin") {
      prefix20.as("a").join(prefix20.as("b").hint("merge"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")) >=
              ceil(greatest(col("a.n"), col("b.n")) * 0.5))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .distinct()
    }
    piece("d20_full")(graft.dedup.Dedup.d20PrefixJoin(spark, sfDir))
    piece("d22_full")(graft.dedup.Dedup.d22DfCapIndex(spark, sfDir))

    // per-stage cpu attribution for one d20 run
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) {
          stageCpu.merge(e.stageId,
            (e.taskMetrics.executorCpuTime, e.taskMetrics.executorRunTime),
            (a, b) => (a._1 + b._1, a._2 + b._2))
          ()
        }
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageNames.put(e.stageInfo.stageId,
          e.stageInfo.name.take(60) + " ntasks=" + e.stageInfo.numTasks)
        ()
      }
    })
    runToNoop(graft.dedup.Dedup.d20PrefixJoin(spark, sfDir))
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stageCpu.asScala.toSeq.sortBy(-_._2._1).take(15).foreach { case (sid, (cpu, run)) =>
      println(f"STAGE $sid%4d cpu=${cpu / 1e9}%7.2f run=${run / 1e3}%7.2f  ${stageNames.getOrDefault(sid, "?")}")
    }
    spark.stop()
  }
}
