package graft

import graft.multimodal.{Multimodal, MultimodalQueries}
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema: opaque binary payload + typed metadata struct") {
    val ds = Multimodal.syntheticCorpus(spark, 10)
    val schema = ds.toDF().schema
    assert(schema("data").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    // metadata filter must not require touching payload bytes
    assert(ds.filter($"meta.kind" === "image").count() == 10)
  }

  test("decode is deterministic, batched, and preserves row count + shape") {
    val ds = Multimodal.syntheticCorpus(spark, 100, width = 16, height = 8).repartition(4)
    val dec = Multimodal.decode(ds)
    assert(dec.count() == 100)
    val first = dec.filter(_.media_id == 0L).head()
    assert(first.pixels.length == 16 * 8)
    assert(first.pixels.forall(p => p >= 0f && p <= 1f))
    // same input → same pixels (stub codec is pure)
    val again = Multimodal.decode(ds).filter(_.media_id == 0L).head()
    assert(first.pixels.sameElements(again.pixels))
  }

  test("decode plan is narrow - no shuffle between scan and decode") {
    val ds = Multimodal.syntheticCorpus(spark, 50)
    val plan = Multimodal.decode(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize resamples to the target shape") {
    val ds = Multimodal.syntheticCorpus(spark, 5, width = 32, height = 32)
    val resized = Multimodal.resize(Multimodal.decode(ds), 8, 4)
    val r = resized.head()
    assert(r.width == 8 && r.height == 4 && r.pixels.length == 32)
  }

  test("feature extraction pools to grid x grid and values stay in range") {
    val ds = Multimodal.syntheticCorpus(spark, 20)
    val feats = Multimodal.features(Multimodal.decode(ds), grid = 4)
    assert(feats.count() == 20)
    val f = feats.head()
    assert(f.feature.length == 16)
    assert(f.feature.forall(v => v >= 0f && v <= 1f))
  }

  test("frame sampling emits duration/interval frames for videos only") {
    val vids = Multimodal.syntheticCorpus(spark, 3, kind = "video")
    val imgs = Multimodal.syntheticCorpus(spark, 3, kind = "image")
    val frames = Multimodal.sampleFrames(vids.union(imgs), everyMs = 2000L)
    // 10 s / 2 s = 5 frames per video, none per image
    assert(frames.count() == 15)
    val f0 = frames.filter(f => f.media_id == 0L && f.frame_idx == 0).head()
    val f1 = frames.filter(f => f.media_id == 0L && f.frame_idx == 1).head()
    assert(f0.tMs == 0L && f1.tMs == 2000L)
    assert(!f0.pixels.sameElements(f1.pixels)) // frames differ deterministically
  }

  test("decode -> features -> ANN retrieval composes end-to-end") {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // media features feed the same similarity kernels as text embeddings
    val feats = Multimodal.features(
      Multimodal.decode(Multimodal.syntheticCorpus(spark, 50)), grid = 4)
      .toDF("media_id", "feature")
    val q = feats.filter($"media_id" < 2)
      .select($"media_id".as("query_id"), $"feature".as("qf"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"media_id")
    val topk = feats.join(broadcast(q), $"media_id" =!= $"query_id")
      .withColumn("cos", VectorFunctions.cosine($"qf", $"feature"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
    assert(topk.count() == 10) // 2 queries × top-5
    assert(topk.select(min("cos")).head().getDouble(0) > -1.0)
  }

  test("media round-trips through parquet with binary + struct intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Multimodal.syntheticCorpus(spark, 10).write.parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media").as[MediaRecord]
    assert(back.count() == 10)
    val orig = Multimodal.syntheticCorpus(spark, 10).filter(_.media_id == 3L).head()
    val rt = back.filter(_.media_id == 3L).head()
    assert(rt.data.sameElements(orig.data) && rt.meta == orig.meta)
  }

  test("m01/m02 driver queries: meta accounting and frame math hold at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val m01 = MultimodalQueries.m01MediaMeta(spark, d).collect()
    assert(m01.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    // payload bytes must equal the source text bytes, summed per kind
    val totalBytes = m01.map(_.getLong(2)).sum
    val expectBytes = graft.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"text".cast("binary"))))
      .head().getLong(0)
    assert(totalBytes == expectBytes)
    // every video yields floor(duration/cadence) frames of width*height px
    val m02 = MultimodalQueries.m02FrameSample(spark, d).collect()
    assert(m02.nonEmpty)
    m02.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1 + id % 30, s"n_frames for $id")
      assert(r.getLong(2) == (id % 30) * 1000, s"last_t_ms for $id")
      val w = 16 * (1 + id % 4)
      assert(r.getLong(3) == w * w, s"px_per_frame for $id")
    }
  }

  test("m05: the VLM pack matches a plain-Scala rebuild; the reject lane bites; tokens conserve") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val got = MultimodalQueries.m05VlmPack(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // rebuild per-item costs in plain Scala (tokenizer reused from the
    // engine — its content is t01's oracle's problem)
    val items = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
      .map { case (id, toks) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val w = if (kind == "audio") 0L else 16L * (1 + id % 4)
        val p = (w / MultimodalQueries.PatchPx) * (w / MultimodalQueries.PatchPx)
        val media = kind match {
          case "image" => p
          case "video" => (1000L * (1 + id % 30) / MultimodalQueries.FrameEveryMs) * p
          case _       => 0L
        }
        (id, kind, toks.size.toLong, media)
      }
    val expect = items.groupBy(_._2).flatMap { case (kind, ks) =>
      var off = 0L
      val lanes = ks.sortBy(_._1).map { case (_, _, t, m) =>
        val total = t + m
        if (total > MultimodalQueries.VlmSeqLen) (-1L, t, m)
        else { val seq = off / MultimodalQueries.VlmSeqLen; off += total; (seq, t, m) }
      }
      lanes.groupBy(_._1).map { case (seq, xs) =>
        (kind, seq) -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
      }
    }
    assert(got == expect)
    // the reject lane is non-empty (a contract that never bites is weak
    // evidence) and rejects are exactly the over-budget items
    assert(got.keys.exists(_._2 == -1L), "no oversize sample was rejected")
    // conservation: every item lands in exactly one lane
    assert(got.values.map(_._1).sum == items.length.toLong)
    assert(got.values.map(_._2).sum == items.map(_._3).sum)
    assert(got.values.map(_._3).sum == items.map(_._4).sum)
  }
}
