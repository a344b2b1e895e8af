package graft

import graft.functions.VectorFunctions.cosine
import graft.similarity.{Planted, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The planted-structure contracts' premises, re-measured (the floors in
  * [[Planted]] are pinned against these bands — if the corpus generator
  * or the construction drifts, this spec localizes which premise broke
  * before the contract rows go red). */
class PlantedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pc = Planted.plantedCorpus(spark, sf)

  private def pairBands(df: DataFrame): Map[Boolean, (Double, Double)] = {
    val a = df.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("label").as("la"))
    val b = df.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("label").as("lb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .groupBy((col("la") === col("lb")).as("same"))
      .agg(min("cos").as("mn"), max("cos").as("mx"))
      .as[(Boolean, Double, Double)].collect()
      .map { case (s, mn, mx) => s -> (mn, mx) }.toMap
  }

  test("planted corpus: unit norms, tight within-label band, separated cross-label band") {
    val norms = pc
      .select(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")).as("n2"))
      .agg(min("n2"), max("n2")).as[(Double, Double)].head()
    assert(math.abs(norms._1 - 1.0) < 1e-3 && math.abs(norms._2 - 1.0) < 1e-3, norms)
    val bands = pairBands(pc)
    val (wMin, _) = bands(true)
    val (_, xMax) = bands(false)
    // measured 0.955 / 0.387 at sf0.001-sf0.1; assert with slack so the
    // spec pins the REGIME (tight clusters, wide gap), not the digits
    assert(wMin > 0.9, s"within-label min $wMin")
    assert(xMax < 0.45, s"cross-label max $xMax")
  }

  test("planted corpus: every exact top-k neighbor is same-label (the cluster premise)") {
    val exact = Similarity.bruteTopKOn(pc.select(col("vec_id"), col("embedding")))
    val lbl = pc.select(col("vec_id"), col("label"))
    val purity = exact
      .join(lbl.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), "query_id")
      .join(lbl.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .agg(sum(when(col("label") === col("qlabel"), 0).otherwise(1)).as("impure"))
      .as[Long].head()
    assert(purity == 0L, s"$purity cross-label exact neighbors")
  }

  test("s17-s20: planted-regime recall is 1.0 for every query (floor 0.9 has margin)") {
    for ((nm, fn) <- Planted.queries if nm.startsWith("s")) {
      val rows = fn(spark, sf)
        .select(col("query_id"), col("n_results"), col("recall_ok"))
        .as[(Long, Long, Boolean)].collect()
      assert(rows.length == Similarity.NumQueries, s"$nm: ${rows.length} rows")
      assert(rows.forall(r => r._2 == Similarity.TopK && r._3), s"$nm: ${rows.mkString(",")}")
    }
    // the floor's margin: the LSH row's measured per-query recall (the
    // weakest family on the isotropic corpus) is exactly 1.0 here
    val exact = Similarity.bruteTopKOn(pc.select(col("vec_id"), col("embedding")))
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.lshTopKOn(pc.select(col("vec_id"), col("embedding")))
      .select(col("query_id"), col("neighbor_id"))
    val worst = exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("hit"), lit(0))) * lit(1.0) / Similarity.TopK).as("r"))
      .agg(min("r")).as[Double].head()
    assert(worst == 1.0, s"worst planted LSH recall $worst")
  }

  test("s22: the hard-regime floor is measured-tight and provably bites (starved index fails it)") {
    val hc = Planted.plantedCorpus(spark, sf, Planted.HardAlpha)
      .select(col("vec_id"), col("embedding"))
    val exact = Similarity.bruteTopKOn(hc)
      .select(col("query_id"), col("neighbor_id"))
    def worstOf(approx: DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("hit"), lit(0))) * lit(1.0) / Similarity.TopK)
          .as("r"))
        .agg(min("r")).as[Double].head()
    val trained = Similarity.fitCoarse(hc)
    val working = worstOf(Similarity.ivfTopKOn(hc, trained))
    // green at this SF, and the floor is not vacuous slack (the
    // cross-SF proximity claim — 0.80/0.80/0.70 measured vs floor 0.7 —
    // lives in the HardFloor scaladoc; here we guard a 0.2 band)
    assert(working >= Planted.HardFloor && working <= Planted.HardFloor + 0.2 + 1e-9,
      s"measured worst-query recall $working vs floor ${Planted.HardFloor}")
    // the same contract with a STARVED index (nprobe 1 — the classic
    // misconfiguration: probe only the query's own cell while the hard
    // clusters fragment across 2-3 cells each) must FAIL the floor:
    // near the boundary the harness distinguishes a well-configured
    // index from a broken one — the property the 1.0-recall
    // tight-regime rows cannot demonstrate. (A geometry-consistent
    // quantizer can't be "randomed" into failure: Voronoi assignment +
    // Voronoi probing is self-consistent for ANY centroids, so the
    // realistic breakage is the serving knob, not the codebook.)
    val starvedWorst = worstOf(Similarity.ivfTopKOn(hc, trained, probe = 1))
    assert(starvedWorst < Planted.HardFloor,
      s"starved index worst-query recall $starvedWorst cleared the floor")
  }

  test("d19: planted pairs sit above tau, background below; recovery is exact") {
    val row = Planted.d19PlantedNearDup(spark, sf)
      .as[(Long, Long, Boolean, Long)].head()
    // driver corpora are isotropic: the true background census is 0
    assert(row._1 > 0 && row._2 == row._1 && row._3 && row._4 == 0L, row)
    // band check: every planted (orig, copy) pair clears tau with margin
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val copies = e.filter(col("vec_id") % Planted.CopyMod === 0)
    val orig = copies.select(col("vec_id").as("a"), col("embedding").as("ea"))
    // rebuild the copy construction independently of the operator: same
    // formula, asserted against the operator's own claimed band
    val nudged = copies
      .withColumn("k", pmod(col("vec_id") / Planted.CopyMod,
        lit(Similarity.Dim.toLong)).cast("int"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding"))))
      .select(col("vec_id").as("a"),
        transform(col("embedding"),
          (x, i) => x + when(i === col("k"), col("nrm") * lit(Planted.CopyDelta))
            .otherwise(lit(0.0))).as("eb"))
    val band = orig.join(nudged, "a")
      .select(cosine(col("ea"), col("eb")).as("cos"))
      .agg(min("cos")).as[Double].head()
    assert(band > Planted.NearDupTau + 0.03, s"planted band min $band")
  }
}
