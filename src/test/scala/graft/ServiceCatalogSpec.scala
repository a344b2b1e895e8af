package graft

import graft.catalog.CatalogSync
import graft.model._
import graft.service.PipelineService
import graft.sink.Sinks
import graft.state.StateLog

import java.nio.file.Files
import scala.concurrent.ExecutionContext.Implicits.global

class ServiceCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("service start/status/await/list lifecycle") {
    val stateLog = new StateLog(spark, Files.createTempDirectory("graft-svc").toString + "/state")
    val svc = new PipelineService(spark, stateLog)
    val id = svc.start { _ => PipelineOutcome.Succeeded(1.0) }
    // read-your-writes: status visible immediately after start
    assert(svc.status(id).isDefined)
    assert(svc.await(id) == Some(PipelineOutcome.Succeeded(1.0)))
    val failing = svc.start { _ => throw new RuntimeException("exploded") }
    svc.await(failing)
    // journaled failure surfaces in status (allow the recover hook to land)
    eventually(svc.status(failing).exists(_.status == PipelineStatus.Failed))
    assert(svc.list().count() >= 2)
  }

  test("update journals new detail without perturbing lifecycle state") {
    val stateLog = new StateLog(spark, Files.createTempDirectory("graft-upd").toString + "/state")
    val svc = new PipelineService(spark, stateLog)
    val id = svc.start { _ => PipelineOutcome.Succeeded(1.0) }
    svc.await(id)
    val statusBefore = svc.status(id).get.status
    assert(svc.update(id, "priority=high"))
    val after = svc.status(id).get
    assert(after.status == statusBefore)
    assert(after.detail == "updated: priority=high")
    assert(!svc.update("no-such-id", "x"))
  }

  test("cancel marks a running pipeline cancelled") {
    val stateLog = new StateLog(spark, Files.createTempDirectory("graft-svc2").toString + "/state")
    val svc = new PipelineService(spark, stateLog)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val id = svc.start { _ => gate.await(); PipelineOutcome.Succeeded(1.0) }
    assert(svc.cancel(id))
    gate.countDown()
    eventually(svc.status(id).exists(_.status == PipelineStatus.Cancelled))
    assert(!svc.cancel("nonexistent"))
  }

  test("catalog stats: ANALYZE feeds the CBO exact row counts and column min/max/nulls") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-stats").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"), (5L, null))
      .toDF("k", "s")
    df.write.parquet(s"$root/t")
    val table = "graft_stats_spec"
    CatalogSync.register(spark, table, s"$root/t", partitionCols = Seq.empty)
    try {
      val cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        // before ANALYZE the planner has only file sizes, no row count
        assert(CatalogSync.plannerRowCount(spark, table).isEmpty)
        CatalogSync.analyze(spark, table, columns = Seq("k", "s"))
        assert(CatalogSync.plannerRowCount(spark, table).contains(BigInt(5)))
        val ks = CatalogSync.columnStats(spark, table, "k")
        assert(ks("min").toLong == 1L && ks("max").toLong == 5L)
        assert(ks("num_nulls").toLong == 0L && ks("distinct_count").toLong == 5L)
        val ss = CatalogSync.columnStats(spark, table, "s")
        assert(ss("num_nulls").toLong == 1L)
      } finally spark.conf.set("spark.sql.cbo.enabled", cbo)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("service drives the full reference pipeline end-to-end") {
    import graft.orchestrate.ReferencePipeline
    import graft.quality.Quality.Check
    import graft.transform.Transform
    import graft.validate.SchemaValidator.Rule
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-svc-e2e").toString
    val layout = PipelineLayout(root)
    val stateLog = new StateLog(spark, layout.state)
    val svc = new PipelineService(spark, stateLog)
    val spec = ReferencePipeline.Spec(
      rules = Seq(Rule("value_le_300", col("value") <= 300.0)),
      transform = Transform.derivePartitions("ts"),
      checks = Seq(Check("value_nonneg", col("value") >= 0)))
    val id = svc.start { pipelineId =>
      ReferencePipeline.run(pipelineId, Tables.events(spark, sf), spec, layout, stateLog,
        PipelineConfig(retryBackoffMs = 1L))
    }
    assert(svc.await(id).exists(_.isSuccess))
    assert(svc.status(id).exists(_.status == PipelineStatus.Succeeded))
    assert(spark.read.parquet(layout.processed).count() > 0)
  }

  test("HTTP facade: start/status/list/update/cancel over real HTTP round-trips") {
    import graft.service.PipelineHttpServer
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import java.net.URI
    val stateLog = new StateLog(spark, Files.createTempDirectory("graft-http").toString + "/state")
    val svc = new PipelineService(spark, stateLog)
    val gate = new java.util.concurrent.CountDownLatch(1)
    // a real pipeline body journals its own terminal state (as
    // ReferencePipeline.run does); "quick" mirrors that contract
    val server = new PipelineHttpServer(svc, Map(
      "quick"   -> ((id: String) => {
        stateLog.append(id, "pipeline", PipelineStatus.Succeeded)
        PipelineOutcome.Succeeded(1.0)
      }),
      "blocked" -> ((_: String) => { gate.await(); PipelineOutcome.Succeeded(1.0) })
    )).start()
    val base = s"http://127.0.0.1:${server.boundPort}/pipelines"
    val client = HttpClient.newHttpClient()
    def send(method: String, url: String, body: String = ""): (Int, String) = {
      val b = HttpRequest.newBuilder(URI.create(url))
      val req = (method match {
        case "GET"    => b.GET()
        case "DELETE" => b.DELETE()
        case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
      }).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // POST by registered name → 202 with an id
      val (c1, b1) = send("POST", base, """{"pipeline": "quick"}""")
      assert(c1 == 202 && b1.contains("\"id\""), s"$c1 $b1")
      val id = b1.split("\"").apply(3)
      eventually(send("GET", s"$base/$id")._2.contains(PipelineStatus.Succeeded))
      // unknown pipeline name → 404
      assert(send("POST", base, """{"pipeline": "nope"}""")._1 == 404)
      // GET list (no filter) sees the run; status filter narrows
      val (c2, b2) = send("GET", base)
      assert(c2 == 200 && b2.contains(id), s"$c2 $b2")
      val (c3, b3) = send("GET", s"$base?status=${PipelineStatus.Succeeded}")
      assert(c3 == 200 && b3.contains(id))
      assert(!send("GET", s"$base?status=${PipelineStatus.Failed}")._2.contains(id))
      // PUT updates detail without perturbing lifecycle state
      assert(send("PUT", s"$base/$id", """{"detail": "priority=high"}""")._1 == 200)
      val after = send("GET", s"$base/$id")._2
      assert(after.contains("updated: priority=high") &&
        after.contains(PipelineStatus.Succeeded), after)
      assert(send("PUT", s"$base/no-such-id", """{"detail": "x"}""")._1 == 404)
      // DELETE cancels a running pipeline; 404 on a finished/unknown one
      val (c4, b4) = send("POST", base, """{"pipeline": "blocked"}""")
      assert(c4 == 202)
      val blockedId = b4.split("\"").apply(3)
      assert(send("DELETE", s"$base/$blockedId")._1 == 200)
      gate.countDown()
      eventually(send("GET", s"$base/$blockedId")._2.contains(PipelineStatus.Cancelled))
      assert(send("DELETE", s"$base/$id")._1 == 404)
      // GET on an unknown id → 404
      assert(send("GET", s"$base/does-not-exist")._1 == 404)
    } finally server.stop()
  }

  test("catalog register + partition pruning + crawler sync") {
    val root = Files.createTempDirectory("graft-cat").toString
    val events = Tables.events(spark, sf)
    Sinks.writePartitioned(events.limit(500), s"$root/tbl")
    CatalogSync.register(spark, "graft_processed", s"$root/tbl")
    val n0 = spark.table("graft_processed").count()
    assert(n0 == 500)
    // partition filter prunes at the metastore level
    val pruned = spark.table("graft_processed").filter("year = 2024 AND month = 1 AND day = 1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(!scan.contains("year=2025"))
    // crawler pass: new partitions appear after sync
    Sinks.writePartitioned(events.limit(600), s"$root/tbl")
    CatalogSync.sync(spark, "graft_processed")
    assert(spark.table("graft_processed").count() == 1100)
    spark.sql("DROP TABLE IF EXISTS graft_processed")
  }

  test("crawler sync merges newly-appeared columns (schema evolution)") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = Files.createTempDirectory("graft-cat-evolve").toString
    val events = Tables.events(spark, sf)
    Sinks.writePartitioned(events.limit(200), s"$root/tbl")
    CatalogSync.register(spark, "graft_evolve", s"$root/tbl")
    assert(!spark.table("graft_evolve").columns.contains("quality"))
    // a later producer starts shipping an extra column in new files
    Sinks.writePartitioned(events.limit(300).withColumn("quality", lit(0.9)), s"$root/tbl")
    CatalogSync.sync(spark, "graft_evolve")
    val t = spark.table("graft_evolve")
    assert(t.columns.contains("quality"))
    // new rows carry the value, old rows read NULL — both by name
    assert(t.filter(col("quality").isNotNull).count() == 300)
    assert(t.count() == 500)
    spark.sql("DROP TABLE IF EXISTS graft_evolve")
  }

  private def eventually(cond: => Boolean, timeoutMs: Long = 10000): Unit = {
    val end = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(50)
    assert(cond)
  }
}
