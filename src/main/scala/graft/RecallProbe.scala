package graft
import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (VERDICT r5 item 4): measures s04 PQ recall@k per
  * (codes-per-subspace, refine-depth) at a given SF, so the contract
  * floor is set from data rather than hope.
  *
  * Usage: runMain graft.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = Similarity.s01BruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).cache()
    exact.count()
    for ((codes, refine) <- Seq((16, 200), (16, 500), (32, 200), (32, 500))) {
      val t0 = System.nanoTime()
      val a = Similarity.s04PqTopK(spark, sfDir, codes, refine)
        .select(col("query_id"), col("neighbor_id"))
      val r = exact
        .join(a.withColumn("hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / Similarity.TopK)
          .as("recall"))
        .agg(min(col("recall")).as("worst"), avg(col("recall")).as("mean"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"RECALL codes=$codes%-3d refine=$refine%-4d worst=${r.getDouble(0)}%.2f " +
        f"mean=${r.getDouble(1)}%.2f time=$dt%.1fs")
    }
    // Hard-regime sweep (VERDICT r10 item 7): IVF recall on the planted
    // corpus as the mixing weight alpha shrinks toward the isotropic
    // boundary — sets s22's floor from measured degradation.
    for (alpha <- Seq(0.35, 0.30, 0.25, 0.20, 0.15, 0.10)) {
      val hc = graft.similarity.Planted.plantedCorpus(spark, sfDir, alpha)
        .select(col("vec_id"), col("embedding"))
      val ex = Similarity.bruteTopKOn(hc)
        .select(col("query_id"), col("neighbor_id"))
      val a = Similarity.ivfTopKOn(hc, Similarity.fitCoarse(hc))
        .select(col("query_id"), col("neighbor_id"))
      val r = ex
        .join(a.withColumn("hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / Similarity.TopK)
          .as("recall"))
        .agg(min(col("recall")).as("worst"), avg(col("recall")).as("mean"))
        .head()
      println(f"HARD-IVF alpha=$alpha%.2f worst=${r.getDouble(0)}%.2f " +
        f"mean=${r.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}
