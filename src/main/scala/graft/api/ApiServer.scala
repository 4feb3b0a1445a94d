package graft.api

import java.net.InetSocketAddress
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Minimal HTTP layer over [[DataService]] — the engine-side counterpart of
  * the reference's Flask app (/root/reference/api/server.py:43-85): the same
  * five GET routes serving the same result shapes as JSON. Built on the
  * JDK's `com.sun.net.httpserver` and the Jackson Scala module Spark already
  * ships, so no dependency is added; case classes (with Options as
  * null-or-value) serialize directly.
  *
  * Not a production web tier — it exists so a user of "the platform" can
  * point the reference dashboard at the Spark engine. The heavy lifting per
  * request is a Spark job; real deployments would cache or pre-materialize
  * (the reference recomputes per request too, data_service.py).
  */
class ApiServer(spark: SparkSession, port: Int = 0) {

  private val service = new DataService(spark)
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def route(path: String)(body: () => Any): Unit =
    server.createContext(path, (exchange: HttpExchange) => {
      val (status, payload) =
        try (200, mapper.writeValueAsBytes(body()))
        catch {
          case e: Exception =>
            (500, mapper.writeValueAsBytes(Map("error" -> e.getMessage)))
        }
      try {
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        exchange.sendResponseHeaders(status, payload.length)
        exchange.getResponseBody.write(payload)
      } finally exchange.close()
    })

  route("/api/health")(() =>
    Map("status" -> "ok", "models" -> Seq("var", "il", "mev", "transfers")))
  route("/api/var")(() => service.varData())
  route("/api/il")(() => service.ilData())
  route("/api/mev")(() => service.mevData())
  route("/api/transfers")(() => service.transferData())

  def start(): Unit = server.start()

  /** The actual bound port (useful with port = 0 in tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object ApiServer {
  /** `graft.api.ApiServer <port>` — stand-alone entry point. */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-api")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new ApiServer(spark, port)
    srv.start()
    println(s"graft api listening on :${srv.boundPort}")
    Thread.currentThread().join()
  }
}
