package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.MultimodalQueries
import graft.queries.{BehaviorQueries, ControlPlaneQueries, ExtendedQueries, PipelineQueries, RelationalQueries}
import graft.similarity.Similarity
import graft.streaming.StreamReplay
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every module's query surface; each
  * module keeps its own map so operators, tests, and oracles live together.
  */
object SparkEntry {

  /** Flagship query (SURVEY §2.3 multi-way join, TPC-H Q5 shape) on
    * sf0.001; the driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q03JoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExtendedQueries.queries ++
      PipelineQueries.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ StreamReplay.queries ++
      MultimodalQueries.queries ++ ControlPlaneQueries.queries ++
      graft.quality.Expectations.queries ++ BehaviorQueries.queries ++
      graft.similarity.Planted.queries

  /** Like-for-like bench-cut tags (VERDICT r6 item 2) — the single source
    * of truth scripts/duckbench.py derives the batch cut from (it used to
    * guess by name prefix). Every `queries` key is tagged:
    *
    *  - "batch":    Spark and the DuckDB oracle do equivalent data work —
    *                these rows ARE the like-for-like 2× comparison.
    *  - "e2e":      the Spark side runs checkpointed streaming /
    *                orchestration / multi-format I/O machinery that the
    *                oracle merely RESTATES as batch SQL (st* replays, x*
    *                pipeline runs, k01's real CSV+ORC write-read legs vs a
    *                parquet-only rollup) — correctness rows, not a
    *                throughput comparison.
    *  - "contract": the oracle evaluates a near-zero recall/band/bound
    *                check while Spark runs the full pipeline (ANN recall
    *                contracts s02-s05/s09, d04's Hamming bound, g07's
    *                approx-profile tolerance band) — charging those as
    *                "equivalent" compares a pipeline to a boolean.
    *
    * Keys absent from this map default to "batch". */
  def benchTags: Map[String, String] = {
    val e2e = queries.keys.filter(k => k.startsWith("st") || k.startsWith("x"))
      .map(_ -> "e2e").toMap +
      ("k01_format_roundtrip" -> "e2e") + ("k02_bucketed_join" -> "e2e") +
      ("k03_json_roundtrip" -> "e2e") + ("k04_schema_evolution" -> "e2e") +
      ("k05_dpp_prune" -> "e2e") + ("k06_file_layout" -> "e2e") +
      // k07 writes a deliberately fragmented 1300-file lake and
      // physically compacts it against a one-GROUP-BY oracle — k01's rule
      ("k07_compaction" -> "e2e") +
      // p30 lands three real parquet write/read cycles plus bookmark
      // audit writes against a one-GROUP-BY oracle — the k01 rule
      ("p30_bookmark_ingest" -> "e2e") +
      // m06/m07 run a real PNG / WAV encode+decode per row against
      // closed-form arithmetic oracles — pipeline-vs-restated-facts,
      // the k01 rule
      ("m06_image_decode" -> "e2e") + ("m07_audio_decode" -> "e2e")
    val contract = Seq("s02_topk_lsh", "s03_topk_ivf", "s04_topk_pq",
      "s05_cluster_profile", "s09_topk_ivfsq", "s12_filtered_ivf",
      "s15_ivf_append", "s16_jl_project", "d04_simhash", "g07_profile_approx",
      // planted-regime recall contracts: full index pipelines vs a
      // boolean-stating oracle — contract rows by construction
      "s17_planted_lsh", "s18_planted_ivf", "s19_planted_pq",
      "s20_planted_jl", "s22_planted_hard", "d19_planted_neardup",
      // s21 runs BOTH the exact panel vote and the IVF pipeline against
      // an oracle that restates only the exact side — contract
      "s21_ivf_vote",
      // t23 TRAINS a model (100 LBFGS passes) against a one-GROUP-BY
      // oracle — a pipeline-vs-boolean comparison, not like-for-like
      "g14_heavy_hitters", "t23_trained_classifier",
      // g20 builds KMV/theta sketches on the Spark side and checks
      // driver-side estimates against the exact plain-SQL overlap; g21
      // runs MLlib FP-Growth (training-style work) against a brute-force
      // itemset oracle — both pipeline-vs-boolean, not like-for-like
      "g20_sketch_overlap", "g21_frequent_sets")
      .map(_ -> "contract").toMap
    val batch = queries.keys.map(_ -> "batch").toMap
    batch ++ e2e ++ contract
  }

  /** Oracle COST class (VERDICT r10 item 5) — about the DuckDB oracle,
    * not the engine: rows whose oracle is deliberately brute-force
    * (all-pairs censuses, recursive-CTE closures over the pair graph,
    * panel-free cross joins) scale quadratically in the ORACLE even
    * where the engine side is bucketed/bounded. duckbench excludes them
    * above a scale threshold (--skip-quadratic) so the like-for-like
    * ratio artifact stays finishable at stress SFs; correctness runs
    * (selfcheck at sf0.01) still execute every oracle. Measured at
    * sf0.3 / threads=16: these nine are 10-57 s each — 242 s of the
    * oracle run's ~5.5 min total. Keys absent default to "linear". */
  def oracleCost: Map[String, String] = Seq(
    "d05_embedding_neardup",  // exact all-pairs cosine census (the one honest O(N^2))
    "d07_dup_clusters",       // recursive reach CTE over the pair graph
    "d09_canonical_select",   // d07's closure + quality argmax
    "d18_soft_dedup",         // d07's closure + weights
    "g10_cluster_sizes",      // d07's closure + size census
    "d15_containment",        // one-sided shingle-pair census (no J floor)
    "d16_edit_refine",        // levenshtein over the full pair census
    "s11_knn_graph",          // all-pairs kNN edge census
    "s13_knn_classify",       // full-holdout x labeled cross join
    "g11_class_tightness",    // within-class all-pairs statistics
    "p34_skyline",            // NOT EXISTS dominance census (all-pairs)
    "d21_prefix_hostile",     // oracle pays the full boilerplate Σ df² (fixed slice)
    "d22_dfcap_index",        // same hostile census, cap-free, at τ = 0.6
    "d23_lsh_hostile")        // same hostile census again (shared oracle)
    .map(_ -> "quadratic").toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ExtendedQueries.oracleSql ++
      PipelineQueries.oracleSql ++ TextAnalysis.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ StreamReplay.oracleSql ++
      MultimodalQueries.oracleSql ++ ControlPlaneQueries.oracleSql ++
      graft.quality.Expectations.oracleSql ++ BehaviorQueries.oracleSql ++
      graft.similarity.Planted.oracleSql
}
