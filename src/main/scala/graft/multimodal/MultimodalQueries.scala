package graft.multimodal

import graft.Tables
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable multimodal queries (north-star [N], SURVEY §2.7/§8;
  * the reference's nested-metadata contract — README:176-179 — is the
  * typed-meta-beside-payload pattern these queries exercise).
  *
  * The container ships no real media, so the corpus is derived
  * DETERMINISTICALLY from the `documents` table: payload = the text's
  * UTF-8 bytes, metadata a fixed function of `doc_id`. That makes the
  * media schema (opaque binary + typed meta), the metadata-only
  * aggregation path, and the frame-sampling kernel all statable as plain
  * SQL facts a DuckDB oracle can check — turning the multimodal module
  * from spec-only coverage into hard CORRECTNESS rows. The pixel CONTENT
  * of the stub decode stays spec-tested (MultimodalSpec): an independent
  * engine can't re-derive it, but every count, shape, and byte-length
  * fact about the pipeline can be.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic media corpus over `documents`: one media item per doc.
    * kind cycles image/audio/video by doc_id; dimensions, sample rate and
    * duration are fixed functions of doc_id so an oracle can restate them.
    * The typed-map boundary (row → case class with byte payload) is the
    * media ingestion edge — everything downstream stays columnar. */
  def fromDocuments(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val w = if (kind == "audio") 0 else (16 * (1 + id % 4)).toInt
        MediaRecord(id, text.getBytes("UTF-8"),
          MediaMeta(kind, w, w,
            sampleRate = if (kind == "audio") 16000 else 0,
            durationMs = if (kind == "video") 1000L * (1 + id % 30) else 0L))
      }
  }

  /** m01: per-kind metadata + payload accounting. The group/agg runs on
    * `meta.*` (columnar, prunable) and `length(data)` — the payload is
    * never decoded; this is the "filter and account 100 TB of media by
    * metadata without touching bytes beyond length" path. */
  def m01MediaMeta(s: SparkSession, d: String): DataFrame =
    fromDocuments(s, d).toDF()
      .groupBy(col("meta.kind").as("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(length(col("data"))).cast("long").as("total_bytes"),
        round(avg(col("meta.width")), 4).as("avg_width"),
        max(col("meta.durationMs")).as("max_duration_ms"))
      .orderBy(col("kind"))

  /** Frame-sampling cadence for m02 (one frame per second). */
  val FrameEveryMs = 1000L

  /** m02: frame-sampling accounting — runs the REAL sampling kernel
    * ([[Multimodal.sampleFrames]]: per-video schedule + per-frame stub
    * decode) and reports per-video frame count, last frame timestamp and
    * decoded raster size. Every number is a fixed function of doc_id, so
    * the oracle re-states them without re-running the decode. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame = {
    val frames = Multimodal.sampleFrames(fromDocuments(s, d), FrameEveryMs)
    frames.toDF()
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        max(col("tMs")).as("last_t_ms"),
        first(size(col("pixels"))).cast("long").as("px_per_frame"))
      .orderBy(col("media_id"))
  }

  /** m03 re-ingestion model: every tenth asset arrives a second time
    * under a fresh id (offset past every real id) — the "same bytes,
    * different object key" duplication a media lake actually sees. */
  val ReingestMod = 10L
  val ReingestOffset = 10000000L

  /** m03: media content dedup — exact dedup of the media corpus by
    * payload hash: `md5` over the OPAQUE binary column, no decode, no
    * metadata trust (the same asset re-ingested under a different id or
    * kind collapses to one copy). The corpus is the base media plus a
    * deterministic re-ingested subset ([[ReingestMod]]); the per-item
    * hash is computed on the scan and only (fp, media_id) pairs shuffle
    * to the keep-first rollup — the 100 TB story is identical to d01:
    * fingerprints travel, payloads never do. Output: every duplicated
    * payload with its kept (minimum = original) id and copy count. */
  def m03MediaDedup(s: SparkSession, d: String): DataFrame = {
    val m = fromDocuments(s, d).toDF()
      .select(md5(col("data")).as("fp"), col("media_id"))
    val reingested = m.filter(col("media_id") % ReingestMod === 0)
      .withColumn("media_id", col("media_id") + ReingestOffset)
    m.unionByName(reingested)
      .groupBy(col("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("keep_id"))
  }

  /** m04 shard budget: small enough that every modality spans multiple
    * shards at the test SFs (payloads average ~250 B). */
  val ShardBytes = 4096L

  /** m04: byte-budget shard packing — the media-lake counterpart of t08's
    * token packing: within each modality, payloads pack greedily in
    * media_id order into fixed-byte shards (training-loader shards, tar
    * archives, object-store multiparts are all this shape); an item's
    * shard is the budget-quotient of the bytes packed BEFORE it. The
    * window rides (kind, media_id, n_bytes) tuples ONLY — payloads are
    * reduced to `length(data)` on the scan and never shuffle (m01's
    * account-without-touching-bytes argument, applied to layout). Output
    * is the shard manifest: items and bytes per (kind, shard). */
  def m04ShardPack(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    fromDocuments(s, d).toDF()
      .select(col("media_id"), col("meta.kind").as("kind"),
        length(col("data")).cast("long").as("n_bytes"))
      .withColumn("prior", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      // ShardBytes is a power of two, so the double division is exact
      .withColumn("shard", floor(col("prior") / ShardBytes.toDouble).cast("long"))
      .groupBy(col("kind"), col("shard"))
      .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("sum_bytes"))
      .orderBy(col("kind"), col("shard"))
  }

  /** m05 sequence budget, in token units. Small enough that the
    * oversize-drop lane bites on this corpus: a 30-frame video at the
    * largest raster carries 480 patch tokens before its caption. */
  val VlmSeqLen = 512L

  /** ViT patch edge — raster dims are multiples of 16 by construction. */
  val PatchPx = 16L

  /** m05: multimodal sequence packing — the VLM-training shard layout
    * problem. An interleaved training sample costs caption tokens PLUS
    * vision tokens derived from typed metadata: image = (w/[[PatchPx]])
    * ·(h/[[PatchPx]]) ViT patches; video = sampled frames (m02's
    * cadence) × patches per frame; audio in this corpus carries no
    * duration, so it costs caption only. Whole samples pack into
    * fixed-[[VlmSeqLen]] sequences — an image cannot straddle two
    * sequences, so unlike p21 the packer is whole-item (t08's
    * first-fit-by-offset rule), and a sample whose TOTAL cost exceeds
    * the budget is dropped to a reject lane (seq_id = −1) instead of
    * packed: the real packer's behavior is resize-or-reject, never
    * split. Costing reads METADATA ONLY (m01's account-without-
    * touching-bytes argument — the only payload access is the caption
    * decode); the pack window rides (kind, media_id, counts) tuples;
    * the manifest accounts text and vision tokens separately — the
    * vision:text ratio per shard is the number a VLM data board
    * actually watches. */
  def m05VlmPack(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val costed = fromDocuments(s, d).toDF()
      .select(col("media_id"), col("meta.kind").as("kind"),
        size(graft.text.TextAnalysis.tokens(decode(col("data"), "UTF-8")))
          .cast("long").as("text_tok"),
        expr(s"""CASE meta.kind
                 WHEN 'image' THEN (meta.width div $PatchPx)
                                 * (meta.height div $PatchPx)
                 WHEN 'video' THEN (meta.durationMs div $FrameEveryMs)
                                 * (meta.width div $PatchPx)
                                 * (meta.height div $PatchPx)
                 ELSE 0 END""").cast("long").as("media_tok"))
      .withColumn("total", col("text_tok") + col("media_tok"))
    val kept = costed.filter(col("total") <= VlmSeqLen)
      .withColumn("prior", coalesce(sum(col("total")).over(w), lit(0L)))
      .select(col("kind"), expr(s"prior div $VlmSeqLen").as("seq_id"),
        col("text_tok"), col("media_tok"))
    val dropped = costed.filter(col("total") > VlmSeqLen)
      .select(col("kind"), lit(-1L).as("seq_id"),
        col("text_tok"), col("media_tok"))
    kept.unionByName(dropped)
      .groupBy(col("kind"), col("seq_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("text_tok")).as("text_tokens"),
        sum(col("media_tok")).as("vision_tokens"))
      .orderBy(col("kind"), col("seq_id"))
  }

  /** m06: REAL image decode (round 14 — VERDICT r13 item 5). Every
    * image-kind doc becomes an actual PNG: a synthetic gray raster
    * (pixel i = (doc_id·31 + i) mod 256, dims from the m01 metadata
    * contract) is ENCODED with the JDK's PNG writer and DECODED back
    * with [[Multimodal.decodeGrayPng]] (ImageIO) inside one
    * mapPartitions — a narrow, shuffle-free stage, the m-family's
    * decode-scales-with-executors story, now with real codec work in
    * it. The emitted columns are exact integers over the DECODED
    * samples: dims, first pixel, full-raster sum, and the
    * position-weighted checksum Σ(i+1)·pᵢ — an order-sensitive,
    * doc-dependent full-traversal digest, so one flipped or moved byte
    * anywhere in the round trip breaks the hash. The oracle restates
    * every column in closed form (raster widths are multiples of 16, so
    * n = w² is a multiple of 256 and the mod-256 ramp sums telescope:
    * Σpᵢ = (n/256)·32640, Σ(i+1)·pᵢ = 32640·c·(128(c−1)+1) + c·K(s)
    * with c = n/256, K(s) = 5559680 − 32640·s + 128·s(s−1), s = the
    * first pixel — verified against brute force for all s, n). A hash
    * match therefore PROVES the engine-side encode→decode round trip is
    * bit-exact — DuckDB never decodes an image, it checks ours. */
  def m06ImageDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (16 * (1 + id % 4)).toInt
          val png = Multimodal.encodeGrayPng(w, w,
            i => ((id * 31 + i) % 256).toInt)
          val (dw, dh, px) = Multimodal.decodeGrayPng(png)
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < px.length) {
            sum += px(i); wsum += (i + 1).toLong * px(i); i += 1
          }
          (id, dw.toLong, dh.toLong, px.length.toLong, px(0).toLong, sum, wsum)
        }
      }
      .toDF("media_id", "width", "height", "n_px", "first_px",
        "sum_px", "wsum_px")
      .orderBy(col("media_id"))
  }

  /** m07: REAL audio decode (round 14 — m06's audio sibling). Every
    * audio-kind doc (doc_id % 3 = 1, the m01 metadata contract) becomes
    * an actual RIFF/WAVE stream: a synthetic 16-bit PCM ramp (sample i =
    * ((doc_id·17 + i) mod 256) − 128, n = 256·(4 + doc_id mod 13)
    * samples at the contract's 16 kHz) is ENCODED with the JDK's WAV
    * writer and DECODED back with [[Multimodal.decodePcmWav]]
    * (`javax.sound.sampled`) inside one mapPartitions — narrow,
    * shuffle-free, decode-scales-with-executors. Emitted columns are
    * exact integers over the DECODED samples: rate, count, first
    * sample, full sum, and the position-weighted checksum Σ(i+1)·vᵢ —
    * order-sensitive over the whole stream, so one flipped, dropped, or
    * byte-swapped sample anywhere in the container round trip breaks
    * the hash. The oracle restates every column in closed form: with
    * vᵢ = mᵢ − 128 the m06 telescoping sums gain only a shift term
    * (Σvᵢ = cyc·32640 − 128n; Σ(i+1)vᵢ = m06's wsum − 128·n(n+1)/2).
    * DuckDB never decodes audio — a hash match proves OUR container
    * round trip (including WAV's little-endian 16-bit wire format) is
    * bit-exact. */
  def m07AudioDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (256L * (4 + id % 13)).toInt
          val wav = Multimodal.encodePcmWav(16000,
            Array.tabulate(n)(i => (((id * 17 + i) % 256) - 128).toInt))
          val (rate, xs) = Multimodal.decodePcmWav(wav)
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < xs.length) {
            sum += xs(i); wsum += (i + 1).toLong * xs(i); i += 1
          }
          (id, rate.toLong, xs.length.toLong, xs(0).toLong, sum, wsum)
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "first_s", "sum_s",
        "wsum_s")
      .orderBy(col("media_id"))
  }

  val queries: Map[String, Q] = Map(
    "m01_media_meta"   -> m01MediaMeta _,
    "m02_frame_sample" -> m02FrameSample _,
    "m03_media_dedup"  -> m03MediaDedup _,
    "m04_shard_pack"   -> m04ShardPack _,
    "m05_vlm_pack"     -> m05VlmPack _,
    "m06_image_decode" -> m06ImageDecode _,
    "m07_audio_decode" -> m07AudioDecode _,
  )

  val oracleSql: Map[String, String] = Map(
    // the meta functions of doc_id restated in SQL; text is ASCII in the
    // synthetic corpus but octet_length(encode()) is the byte-exact form
    "m01_media_meta" -> """
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             round(avg(CASE WHEN doc_id % 3 = 1 THEN 0
                            ELSE 16 * (1 + doc_id % 4) END), 4) AS avg_width,
             CAST(max(CASE WHEN doc_id % 3 = 2 THEN 1000 * (1 + doc_id % 30)
                           ELSE 0 END) AS BIGINT) AS max_duration_ms
      FROM documents GROUP BY 1 ORDER BY kind""",
    // sampleFrames emits floor(duration/cadence) frames at k*cadence and
    // decodes width×height rasters — restated directly from doc_id
    "m02_frame_sample" -> """
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 30 AS BIGINT) AS n_frames,
             CAST((doc_id % 30) * 1000 AS BIGINT) AS last_t_ms,
             CAST((16 * (1 + doc_id % 4)) * (16 * (1 + doc_id % 4)) AS BIGINT)
               AS px_per_frame
      FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""",
    // the payload IS the text's UTF-8 bytes, so md5 over the binary
    // equals DuckDB's md5 over the source string; the union restates the
    // deterministic re-ingested subset
    "m03_media_dedup" -> s"""
      SELECT fp, keep_id, n_copies FROM (
        SELECT md5(text) AS fp, min(id) AS keep_id,
               count(*) AS n_copies
        FROM (
          SELECT doc_id AS id, text FROM documents
          UNION ALL
          SELECT doc_id + $ReingestOffset AS id, text FROM documents
          WHERE doc_id % $ReingestMod = 0)
        GROUP BY 1)
      WHERE n_copies > 1 ORDER BY keep_id""",
    // m04: the same greedy exclusive-cumsum cut restated; octet_length of
    // the encoded text is the byte-exact payload size
    "m04_shard_pack" -> s"""
      WITH m AS (
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      c AS (
        SELECT kind, media_id, n_bytes,
               CAST(coalesce(sum(n_bytes) OVER (PARTITION BY kind
                 ORDER BY media_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS prior
        FROM m)
      SELECT kind, CAST(floor(prior / $ShardBytes.0) AS BIGINT) AS shard,
             count(*) AS n_items,
             CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      FROM c
      GROUP BY kind, shard
      ORDER BY kind, shard""",
    // m05: the meta functions of doc_id + the tokenizer restated; the
    // window (filter-then-cumsum) evaluates after WHERE in both engines,
    // so dropped items consume no pack space in either
    "m05_vlm_pack" -> s"""
      WITH m AS (
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CASE WHEN doc_id % 3 = 1 THEN 0
                    ELSE 16 * (1 + doc_id % 4) END AS w,
               CASE WHEN doc_id % 3 = 2 THEN 1000 * (1 + doc_id % 30)
                    ELSE 0 END AS dur,
               CAST(len(${graft.text.TextAnalysis.ToksSql}) AS BIGINT)
                 AS text_tok
        FROM documents),
      c AS (
        SELECT media_id, kind, text_tok,
               CAST(CASE kind
                 WHEN 'image' THEN (w // $PatchPx) * (w // $PatchPx)
                 WHEN 'video' THEN (dur // $FrameEveryMs)
                                 * (w // $PatchPx) * (w // $PatchPx)
                 ELSE 0 END AS BIGINT) AS media_tok
        FROM m),
      t AS (SELECT *, text_tok + media_tok AS total FROM c),
      kept AS (
        SELECT kind, text_tok, media_tok,
               CAST(coalesce(sum(total) OVER (PARTITION BY kind
                 ORDER BY media_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // $VlmSeqLen AS BIGINT) AS seq_id
        FROM t WHERE total <= $VlmSeqLen),
      lanes AS (
        SELECT kind, seq_id, text_tok, media_tok FROM kept
        UNION ALL
        SELECT kind, CAST(-1 AS BIGINT) AS seq_id, text_tok, media_tok
        FROM t WHERE total > $VlmSeqLen)
      SELECT kind, seq_id, count(*) AS n_items,
             CAST(sum(text_tok) AS BIGINT) AS text_tokens,
             CAST(sum(media_tok) AS BIGINT) AS vision_tokens
      FROM lanes GROUP BY kind, seq_id ORDER BY kind, seq_id""",
    // m06: the decoded-sample facts in closed form (see the Scaladoc
    // derivation; 5559680 = sum(m^2, m<256), 32640 = sum(m, m<256)) —
    // DuckDB never decodes a PNG, it checks that OUR encode->decode
    // round trip reproduced the synthetic raster bit-exactly
    "m06_image_decode" -> """
      WITH img AS (
        SELECT doc_id,
               CAST(16 * (1 + doc_id % 4) AS BIGINT) AS w,
               CAST((doc_id * 31) % 256 AS BIGINT) AS s
        FROM documents WHERE doc_id % 3 = 0),
      c AS (
        SELECT doc_id, w, s, w * w AS n, (w * w) // 256 AS cyc FROM img)
      SELECT doc_id AS media_id, w AS width, w AS height, n AS n_px,
             s AS first_px,
             CAST(cyc * 32640 AS BIGINT) AS sum_px,
             CAST(32640 * cyc * (128 * (cyc - 1) + 1)
                  + cyc * (5559680 - 32640 * s + 128 * s * (s - 1))
                  AS BIGINT) AS wsum_px
      FROM c ORDER BY media_id""",
    // m07: the decoded-sample facts in closed form — the m06 telescoping
    // identities shifted by -128 per sample (see the Scaladoc
    // derivation); DuckDB never decodes a WAV, it checks that OUR
    // encode->decode container round trip reproduced the PCM stream
    // bit-exactly
    "m07_audio_decode" -> """
      WITH au AS (
        SELECT doc_id,
               CAST(256 * (4 + doc_id % 13) AS BIGINT) AS n,
               CAST((doc_id * 17) % 256 AS BIGINT) AS s
        FROM documents WHERE doc_id % 3 = 1),
      c AS (
        SELECT doc_id, n, s, n // 256 AS cyc FROM au)
      SELECT doc_id AS media_id, CAST(16000 AS BIGINT) AS sample_rate,
             n AS n_samples, s - 128 AS first_s,
             CAST(cyc * 32640 - 128 * n AS BIGINT) AS sum_s,
             CAST(32640 * cyc * (128 * (cyc - 1) + 1)
                  + cyc * (5559680 - 32640 * s + 128 * s * (s - 1))
                  - 128 * n * (n + 1) // 2
                  AS BIGINT) AS wsum_s
      FROM c ORDER BY media_id""",
  )
}
