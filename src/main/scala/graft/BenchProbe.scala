package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the bench floor (VERDICT r5 items 1-2): times a few
  * target queries at three points in a Bench-shaped session — cold/solo,
  * after the full sf0.001 warm-up loop, and after the x01/x02 rows at the
  * target SF — to separate plan cost from run-order/session-state effects.
  *
  * Usage: runMain graft.BenchProbe [sfDir] [q1,q2,...]
  */
object BenchProbe {
  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targets =
      (if (args.length > 1) args(1).split(",").toSeq
       else Seq("p01_validate_events", "p03_enrich_events", "p05_derive_partitions",
                "p07_upsert", "p08_scd2")).filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(name: String): Seq[Double] = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      runToNoop(SparkEntry.queries(name)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def report(tag: String, record: Boolean = false): Unit = targets.foreach { n =>
      val ts = time(n)
      if (record) mins(n) = ts.min
      println(f"PROBE $tag $n min=${ts.min}%.3f runs=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    report("cold")
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try runToNoop(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    report("after-warmup-loop", record = true)
    Seq("x01_pipeline_e2e", "x02_catalog_sql").foreach { n =>
      SparkEntry.queries.get(n).foreach(fn => runToNoop(fn(spark, sfDir)))
    }
    report("after-x01-x02")
    // Probe adjudication artifact (VERDICT r11 item 3): the solo
    // steady-state mins, as a file sfsweep.py consumes via --probe-lo/-hi
    // so an "episodic in-session swing, solo reads linear" adjudication is
    // a FILE DIFF, not a prose claim. Merged per-SF so probes for
    // different query sets accumulate into one artifact.
    try {
      val sfName = new java.io.File(sfDir).getName
      val p = java.nio.file.Paths.get(s"tmp/probe_$sfName.json")
      java.nio.file.Files.createDirectories(p.getParent)
      val prev: Map[String, Double] =
        if (java.nio.file.Files.exists(p))
          """"([^"]+)"\s*:\s*([0-9.]+)""".r
            .findAllMatchIn(java.nio.file.Files.readString(p))
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filter(_._1 != "sf").toMap
        else Map.empty
      val merged = prev ++ mins
      val body = merged.toSeq.sortBy(_._1)
        .map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
      java.nio.file.Files.writeString(p, s"""{"sf":"$sfName",$body}""")
      println(s"PROBE wrote $p (${merged.size} queries)")
    } catch { case e: Throwable =>
      System.err.println(s"PROBE artifact write failed: $e")
    }
    spark.stop()
  }
}
