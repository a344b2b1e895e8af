package graft

import graft.queries.PipelineQueries
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic laws for the round-5 corpus-curation operators: the funnel's
  * monotone stage algebra, the shard shuffle's permutation properties,
  * the bigram top-k's per-group bounds, and the cluster profile's
  * contract booleans. Plan shapes live in [[PlanSpec]]. */
class CorpusOpsSpec extends SparkSpec {

  test("p10: funnel stages are monotone non-increasing and the dedup stage removes rows") {
    val rows = PipelineQueries.p10Funnel(spark, sf)
      .orderBy(col("stage_idx")).collect()
    assert(rows.length == 5)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    counts.sliding(2).foreach { case Array(a, b) => assert(a >= b, counts.mkString(",")) }
    // the re-ingestion model guarantees real duplicates: dedup < ingested
    assert(counts.last < counts.head, counts.mkString(","))
  }

  test("p11: shard shuffle is a permutation — every doc exactly once, positions contiguous per shard") {
    val docs = Tables.documents(spark, sf).count()
    val out = PipelineQueries.p11ShardShuffle(spark, sf)
    assert(out.count() == docs)
    assert(out.select(col("doc_id")).distinct().count() == docs)
    val bad = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"), countDistinct(col("pos")).as("d"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("d") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString(";"))
  }

  test("p11: the permutation is deterministic across runs and seed-sensitive") {
    val a = PipelineQueries.p11ShardShuffle(spark, sf).collect()
    val b = PipelineQueries.p11ShardShuffle(spark, sf).collect()
    assert(a.sameElements(b))
    // a different seed must re-deal at least one doc's slot
    import org.apache.spark.sql.expressions.Window
    val other = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.HashGate.seededHex(col("doc_id"), "43").as("h"))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 2), 16, 10).cast("int")
          % PipelineQueries.NumShuffleShards).cast("int"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos")).collect()
    assert(!a.sameElements(other))
  }

  test("t11: at most k bigrams per language, counts non-increasing in rank") {
    val out = TextAnalysis.t11NgramTopK(spark, sf).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= TextAnalysis.NgramTopK, lang)
      val ns = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n"))
      ns.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$lang: ${ns.mkString(",")}")
        case _ => ()
      }
    }
  }

  test("s05: contract booleans hold and the corpus is fully assigned") {
    val row = Similarity.s05ClusterProfile(spark, sf).head()
    assert(row.getAs[Long]("n_vectors") == Tables.embeddings(spark, sf).count())
    assert(row.getAs[Boolean]("clusters_ok"))
    assert(row.getAs[Boolean]("sep_ok"))
  }
}
