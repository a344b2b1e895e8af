package graft

import graft.model.PipelineConfig
import graft.orchestrate.{Flow, PipelineRunner}
import graft.quality.Quality
import graft.quality.Quality.Check
import graft.state.StateLog
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws (SURVEY §5.3): quality-score range and
  * monotonicity, retry bound, and the JSON→validate→parquet round trip.
  * Raw ScalaCheck generators sampled under fixed seeds (the
  * scalatest-scalacheck bridge is not in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministically draw n samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallDoubles = Gen.listOfN(12, Gen.chooseNum(-100.0, 100.0))

  test("quality score is always in [0,1]") {
    samples(smallDoubles, 8).foreach { xs =>
      val score = Quality.batchScore(xs.toDF("v"), Seq(Check("pos", col("v") > 0)))
      assert(score >= 0.0 && score <= 1.0, s"score $score for $xs")
    }
  }

  test("corrupting rows never raises the score (gate monotonicity)") {
    samples(Gen.zip(smallDoubles, Gen.chooseNum(0, 11)), 8).foreach { case (xs, k) =>
      val checks = Seq(Check("pos", col("v") > 0))
      val base = Quality.batchScore(xs.toDF("v"), checks)
      val corrupted = xs.zipWithIndex.map { case (x, i) => if (i < k) -1.0 else x }
      val worse = Quality.batchScore(corrupted.toDF("v"), checks)
      assert(worse <= base + 1e-12, s"$worse > $base after corrupting $k of $xs")
    }
  }

  test("retry wrapper attempts at most maxRetries times then fails") {
    samples(Gen.chooseNum(1, 6), 6).foreach { failures =>
      val stateLog = new StateLog(spark,
        java.nio.file.Files.createTempDirectory("graft-prop").toString + "/state")
      val runner = new PipelineRunner(stateLog, PipelineConfig(retryBackoffMs = 1L))
      var attempts = 0
      val flow = Flow.Task("flaky", { df =>
        attempts += 1
        if (attempts <= failures) sys.error("boom")
        df
      }, Flow.Succeed())
      val out = runner.run("p", flow, Seq(1).toDF("x"))
      if (failures >= 3) assert(!out.isSuccess && attempts == 3)
      else assert(out.isSuccess && attempts == failures + 1)
    }
  }

  test("KMV sketch: set-algebra estimates land within their bands on known ground truth") {
    import graft.functions.Aggregators
    val k = Aggregators.KmvSketch.DefaultK
    val kmv = udaf(new Aggregators.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaLong)
    // A = [0, 50k), B = [30k, 80k): |A∩B| = 20k, |A∪B| = 80k — both far
    // past K, so the FULL-sketch estimators (not the exact degenerate)
    // are what's exercised; hashes via the same xxhash64 the row uses
    val rows = (0L until 50000L).map(("A", _)) ++
      (30000L until 80000L).map(("B", _))
    val sk = rows.toDF("s", "v")
      .select(col("s"), xxhash64(col("v")).as("h"))
      .groupBy(col("s")).agg(kmv(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val (a, b) = (sk("A"), sk("B"))
    assert(a.length == k && b.length == k)
    val estA = Aggregators.KmvSketch.estimate(a, k)
    val estI = Aggregators.KmvSketch.intersectEstimate(a, b, k)
    val estU = Aggregators.KmvSketch.unionEstimate(a, b, k)
    assert(math.abs(estA - 50000) <= 5000, s"estA=$estA")
    assert(math.abs(estI - 20000) <= 3000, s"estI=$estI")
    assert(math.abs(estU - 80000) <= 8000, s"estU=$estU")
    // undersampled regime degenerates to EXACT set arithmetic
    val small = (0L until 100L).map(("C", _)) ++ (50L until 150L).map(("D", _))
    val sk2 = small.toDF("s", "v")
      .select(col("s"), xxhash64(col("v")).as("h"))
      .groupBy(col("s")).agg(kmv(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(Aggregators.KmvSketch.estimate(sk2("C"), k) == 100.0)
    assert(Aggregators.KmvSketch.intersectEstimate(sk2("C"), sk2("D"), k) == 50.0)
    assert(Aggregators.KmvSketch.unionEstimate(sk2("C"), sk2("D"), k) == 150.0)
  }

  test("incremental dedup: survivors are unique, first-of-fp, and disjoint from history") {
    import graft.dedup.Dedup
    // docs with deliberate duplicate texts across and within halves
    val texts = Gen.listOfN(24, Gen.chooseNum(0, 7).map(k => s"doc body $k"))
    samples(texts, 6).foreach { ts =>
      val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val history = docs.filter($"doc_id" % 2 === 0)
      val batch = docs.filter($"doc_id" % 2 === 1)
      val historyFp = history.select(md5(
        graft.text.TextAnalysis.normText($"text")).as("fp"))
      val out = Dedup.incrementalExactDedup(batch, historyFp)
        .select($"doc_id", $"fp").collect()
      val histSet = historyFp.as[String].collect().toSet
      // no survivor's fingerprint is in history
      assert(out.forall(r => !histSet.contains(r.getString(1))))
      // fingerprints are unique among survivors
      assert(out.map(_.getString(1)).distinct.length == out.length)
      // each survivor is the FIRST batch doc with its fingerprint
      val batchFps = batch.select($"doc_id",
        md5(graft.text.TextAnalysis.normText($"text")).as("fp"))
        .as[(Long, String)].collect()
      out.foreach { r =>
        val firstId = batchFps.filter(_._2 == r.getString(1)).map(_._1).min
        assert(r.getLong(0) == firstId)
      }
      // survivors + history cover every distinct batch fingerprint not seen before
      val expected = batchFps.map(_._2).distinct.filterNot(histSet.contains).toSet
      assert(out.map(_.getString(1)).toSet == expected)
    }
  }

  test("snapshot diff: diff(A, A) is all-unchanged; dropping k keys yields exactly k removed") {
    import graft.transform.Transform
    val rows = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 18L), Gen.alphaStr.map(_.take(6))))
    samples(Gen.zip(rows, Gen.chooseNum(0, 5)), 6).foreach { case (xs, k) =>
      val a = xs.distinctBy(_._1).toDF("id", "payload")
      val fp = md5(concat_ws("|", col("payload")))
      val self = Transform.snapshotDiff(a, a, "id", fp)
        .groupBy("category").count().as[(String, Long)].collect().toMap
      assert(self.keySet == Set("unchanged"), self.toString)
      val keys = xs.map(_._1).distinct
      val dropped = keys.take(k).toSet
      val b = a.filter(!col("id").isin(dropped.toSeq: _*))
      val d = Transform.snapshotDiff(a, b, "id", fp)
        .groupBy("category").count().as[(String, Long)].collect().toMap
      assert(d.getOrElse("removed", 0L) == dropped.size, d.toString)
      assert(d.getOrElse("unchanged", 0L) == keys.length - dropped.size, d.toString)
      assert(!d.contains("added") && !d.contains("changed"), d.toString)
    }
  }

  test("chunking: chunks tile the token stream — reconstruction is exact") {
    val S = graft.text.TextAnalysis.ChunkStride
    val C = graft.text.TextAnalysis.ChunkSize
    samples(Gen.chooseNum(1, 300), 10).foreach { n =>
      val toks = (1 to n).map(i => s"w$i")
      val starts = 1 to math.max(n, 1) by S
      val chunks = starts.map(st => toks.slice(st - 1, st - 1 + C))
      // the law t13 relies on: chunk i's first S tokens, plus the last
      // chunk's tail, reconstruct the document exactly
      val rebuilt = chunks.init.flatMap(_.take(S)) ++ chunks.last
      assert(rebuilt == toks, s"n=$n")
      assert(chunks.length == (math.max(n, 1) - 1) / S + 1)
      assert(chunks.forall(c => c.nonEmpty && c.length <= C))
    }
  }

  test("valid rows survive the JSON → validate → parquet round trip unchanged") {
    import graft.validate.SchemaValidator
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val gen = Gen.listOfN(8, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(-10.0, 10.0)))
    samples(gen, 5).filter(_.nonEmpty).foreach { rows =>
      val distinct = rows.distinctBy(_._1)
      val raw = distinct.map { case (i, v) => s"""{"id": $i, "v": $v}""" }.toDS()
      val parsed = SchemaValidator.parseJson(raw, schema)
      val (valid, _) = SchemaValidator.route(parsed)
      val dir = java.nio.file.Files.createTempDirectory("graft-rt").toString + "/out"
      valid.select("id", "v").write.parquet(dir)
      val back = spark.read.parquet(dir).as[(Long, Double)].collect().toSet
      assert(back == distinct.toSet)
    }
  }

  /** Random instance generator for the as-of family: small key space and
    * timestamp range force collisions, equal timestamps, and empty-side
    * keys — the edge geometry hand-written cases under-sample. */
  private val asOfInstances = for {
    nl <- Gen.chooseNum(0, 12)
    nr <- Gen.chooseNum(0, 12)
    left <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 20L)))
    right <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 20L)))
  } yield (left.zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) },
           right.zipWithIndex.map { case ((k, t), i) => (1000L + i, s"k$k", t) })

  test("as-of family: backward/forward/nearest each match their brute-force definition") {
    import graft.operators.Joins
    samples(asOfInstances, 12).foreach { case (ls, rs) =>
      val left = ls.toDF("id", "k", "ts")
      val right = rs.toDF("rid", "k", "ts")
      def runOp(f: => org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        f.select("id", "m").as[(Long, Option[Long])].collect().toMap
      val back = runOp(Joins.asOf(left, right, "k", col("ts"), col("ts"),
        Seq(col("rid").as("m")), col("rid")))
      val fwd = runOp(Joins.asOfForward(left, right, "k", col("ts"), col("ts"),
        Seq(col("rid").as("m")), col("rid")))
      val near = runOp(Joins.asOfNearest(left, right, "k", col("ts"), col("ts"),
        Seq(col("rid").as("m")), col("rid")))
      val byKey = rs.groupBy(_._2)
      ls.foreach { case (id, k, t) =>
        val cands = byKey.getOrElse(k, Nil)
        val b = cands.filter(_._3 <= t) match {
          case Nil => None
          case cs => val mt = cs.map(_._3).max
            Some(cs.filter(_._3 == mt).map(_._1).max) // greatest tie wins
        }
        val f = cands.filter(_._3 >= t) match {
          case Nil => None
          case cs => val mt = cs.map(_._3).min
            Some(cs.filter(_._3 == mt).map(_._1).min) // smallest tie wins
        }
        val n = (b, f) match {
          case (None, None) => None
          case (Some(x), None) => Some(x)
          case (None, Some(y)) => Some(y)
          case (Some(x), Some(y)) =>
            val bg = t - cands.filter(_._1 == x).head._3
            val fg = cands.filter(_._1 == y).head._3 - t
            if (bg <= fg) Some(x) else Some(y) // equal distance prefers backward
        }
        assert(back(id) == b, s"backward id=$id ls=$ls rs=$rs")
        assert(fwd(id) == f, s"forward id=$id ls=$ls rs=$rs")
        assert(near(id) == n, s"nearest id=$id ls=$ls rs=$rs")
      }
    }
  }
}
