package graft.service

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model.{PipelineOutcome, PipelineStateRow}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP facade over [[PipelineService]] — the reference's REST control
  * plane (`GET/POST /pipelines`, `GET/PUT/DELETE /pipelines/{id}`,
  * SDP.py:478-485, README:168-191) bound to the in-JVM verbs. Built on
  * the JDK's `com.sun.net.httpserver` (no extra dependency) and json4s
  * (already on Spark's classpath): the control plane serves a handful
  * of requests a minute, so a single dispatch thread is the right size
  * — all heavy work already runs async inside `PipelineService.start`.
  *
  * HTTP cannot ship a function body, so runs are started BY NAME
  * against a registry of pipeline factories (`name → id =>
  * PipelineOutcome`), the analog of the reference deploying named state
  * machines and starting executions of them.
  *
  * Routes:
  *  - `POST /pipelines` body `{"pipeline": <name>, "priority": <pool>}`
  *    → 202 `{"id": ...}` | 404 unknown name
  *  - `GET /pipelines[?status=RUNNING]` → 200 array of latest-state rows
  *  - `GET /pipelines/{id}` → 200 state row | 404
  *  - `PUT /pipelines/{id}` body `{"detail": ...}` → 200 | 404
  *  - `DELETE /pipelines/{id}` → 200 (was running) | 404
  */
final class PipelineHttpServer(
    service: PipelineService,
    registry: Map[String, String => PipelineOutcome],
    port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/pipelines", handle _)
  server.setExecutor(null)

  def start(): PipelineHttpServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
  /** Actual port after binding (0 requests an ephemeral one). */
  def boundPort: Int = server.getAddress.getPort

  private def handle(x: HttpExchange): Unit =
    try {
      val id = x.getRequestURI.getPath.stripPrefix("/pipelines").stripPrefix("/")
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      val (code, json) = (x.getRequestMethod, id) match {
        case ("POST", "")   => post(body)
        case ("GET", "")    => listAll(Option(x.getRequestURI.getQuery))
        case ("GET", id)    => getStatus(id)
        case ("PUT", id)    => put(id, body)
        case ("DELETE", id) => delete(id)
        case (m, _)         => 405 -> JObject("error" -> JString(s"unsupported method $m"))
      }
      val bytes = JsonMethods.compact(JsonMethods.render(json)).getBytes(UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(code, bytes.length.toLong)
      x.getResponseBody.write(bytes)
    } catch {
      case e: Throwable =>
        // a control-plane handler must never take the server down with it
        val msg = JsonMethods.compact(JsonMethods.render(
          JObject("error" -> JString(Option(e.getMessage).getOrElse(e.getClass.getName)))))
        try {
          x.sendResponseHeaders(500, msg.length.toLong)
          x.getResponseBody.write(msg.getBytes(UTF_8))
        } catch { case _: Throwable => () }
    } finally x.close()

  private def field(body: String, name: String): Option[String] =
    JsonMethods.parseOpt(body).flatMap(j => (j \ name) match {
      case JString(s) => Some(s)
      case _          => None
    })

  private def post(body: String): (Int, JValue) = {
    val name = field(body, "pipeline").getOrElse("")
    registry.get(name) match {
      case None => 404 -> JObject("error" -> JString(s"unknown pipeline '$name'"))
      case Some(factory) =>
        val priority = field(body, "priority").getOrElse("normal")
        val id = service.start(factory, priority)
        202 -> JObject("id" -> JString(id))
    }
  }

  private def listAll(query: Option[String]): (Int, JValue) = {
    val statusFilter = query.flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith("status=") => kv.stripPrefix("status=")
    })
    val rows = service.list(statusFilter).collect().map { r =>
      rowJson(PipelineStateRow(
        r.getAs[String]("pipeline_id"), r.getAs[String]("timestamp"),
        r.getAs[String]("stage"), r.getAs[String]("status"),
        r.getAs[String]("detail")))
    }
    200 -> JArray(rows.toList)
  }

  private def getStatus(id: String): (Int, JValue) =
    service.status(id) match {
      case Some(row) => 200 -> rowJson(row)
      case None      => 404 -> JObject("error" -> JString("not found"))
    }

  private def put(id: String, body: String): (Int, JValue) = {
    val detail = field(body, "detail").getOrElse("")
    if (service.update(id, detail)) 200 -> JObject("updated" -> JBool(true))
    else 404 -> JObject("error" -> JString("not found"))
  }

  private def delete(id: String): (Int, JValue) =
    if (service.cancel(id)) 200 -> JObject("cancelled" -> JBool(true))
    else 404 -> JObject("error" -> JString("not running"))

  private def rowJson(row: PipelineStateRow): JValue = JObject(
    "pipeline_id" -> JString(row.pipeline_id),
    "timestamp"   -> JString(row.timestamp),
    "stage"       -> JString(row.stage),
    "status"      -> JString(row.status),
    "detail"      -> JString(row.detail))
}
