package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.catalog.Graft
import graft.format.TableMetadata
import graft.objects.{FileLocations, Json, NamespaceDef, TableDef}
import graft.storage.StorageOps
import graft.txn.Transaction

/** Read-only HTTP façade over a graft warehouse — the out-of-process
  * access path the reference exposes as an Iceberg REST catalog
  * (docker/gravitino/, README.md "REST catalog"). Built on the JDK's
  * own HTTP server: zero extra dependencies, good enough for a
  * metadata-plane protocol whose payloads are a few KB of JSON.
  *
  * Read endpoints (GET, JSON):
  *   /v1/config                          → CatalogDef
  *   /v1/namespaces                      → {"namespaces": [..]}
  *   /v1/namespaces/{ns}                 → NamespaceDef
  *   /v1/namespaces/{ns}/tables          → {"tables": [..]}
  *   /v1/namespaces/{ns}/tables/{t}      → TableDef
  *   /v1/namespaces/{ns}/views           → {"views": [..]}
  *   /v1/namespaces/{ns}/views/{v}       → ViewDef
  *
  * Write endpoints (metadata plane only — data files ride Spark):
  *   POST   /v1/namespaces               {"name":.., "properties":{..}}
  *   POST   /v1/namespaces/{ns}/tables   {"name":.., "schemaJson":..}
  *   DELETE /v1/namespaces/{ns}          (RESTRICT)
  *   DELETE /v1/namespaces/{ns}/tables/{t}
  *
  * Every request runs in its own transaction against the latest
  * committed root: reads are each a consistent snapshot, writes are
  * single auto-commit transactions decided by the same optimistic
  * root race as in-process writers — two HTTP clients (or an HTTP
  * client racing a Spark session) resolve exactly like two sessions.
  */
class CatalogHttpServer(storage: StorageOps, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Starts serving; returns the bound port. */
  def start(): Int = {
    server.createContext("/v1", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // single-threaded is fine for metadata
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try {
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      ex.getRequestMethod match {
        case "GET" => handleGet(ex, parts)
        case "POST" => handlePost(ex, parts)
        case "DELETE" => handleDelete(ex, parts)
        case _ => reply(ex, 405, """{"error":"unsupported method"}""")
      }
    } catch {
      case _: NoSuchElementException =>
        reply(ex, 404, """{"error":"object not found"}""")
      case e: IllegalArgumentException =>
        reply(ex, 400, s"""{"error":${Json.writeString(e.getMessage)}}""")
      case e: Exception =>
        reply(ex, 500, s"""{"error":${Json.writeString(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

  private def handleGet(ex: HttpExchange, parts: List[String]): Unit = {
    {
      val body = withReadTxn { txn =>
        parts match {
          case List("v1", "config") =>
            val root = graft.tree.TreeOps.findLatestRoot(storage).get
            try Some(Json.writeString(Graft.catalogDef(storage, root)))
            finally root.close()
          case List("v1", "namespaces") =>
            Some(listJson("namespaces", Graft.showNamespaces(storage, txn)))
          case List("v1", "namespaces", ns) =>
            Some(Json.writeString(Graft.describeNamespace(storage, txn, ns)))
          case List("v1", "namespaces", ns, "tables") =>
            Some(listJson("tables", Graft.showTables(storage, txn, ns)))
          case List("v1", "namespaces", ns, "tables", t) =>
            Some(Json.writeString(Graft.describeTable(storage, txn, ns, t)))
          case List("v1", "namespaces", ns, "views") =>
            Some(listJson("views", Graft.showViews(storage, txn, ns)))
          case List("v1", "namespaces", ns, "views", v) =>
            Some(Json.writeString(Graft.describeView(storage, txn, ns, v)))
          case _ => None
        }
      }
      body match {
        case Some(json) => reply(ex, 200, json)
        case None => reply(ex, 404, """{"error":"no such route"}""")
      }
    }
  }

  private def requestBody(ex: HttpExchange): Array[Byte] =
    ex.getRequestBody.readAllBytes()

  private def inWriteTxn(f: Transaction => Unit): Unit = {
    val txn = Graft.beginTransaction(storage)
    try { f(txn); Graft.commitTransaction(storage, txn); () }
    finally txn.close()
  }

  private def handlePost(ex: HttpExchange, parts: List[String]): Unit =
    parts match {
      case List("v1", "namespaces") =>
        val d = Json.read(requestBody(ex), classOf[NamespaceDef])
        inWriteTxn(txn => Graft.createNamespace(storage, txn, d))
        reply(ex, 201, Json.writeString(d))
      case List("v1", "namespaces", ns, "tables") =>
        val req = Json.read(requestBody(ex), classOf[CreateTableRequest])
        require(req.name != null && req.schemaJson != null,
          "table create needs name and schemaJson")
        val metaPath = FileLocations.tableMetadataPath(ns, req.name)
        TableMetadata.write(storage, metaPath, TableMetadata.empty(req.schemaJson))
        inWriteTxn(txn => Graft.createTable(storage, txn,
          TableDef(req.name, ns, metadataLocation = metaPath,
            properties = Option(req.properties).getOrElse(Map.empty))))
        reply(ex, 201, s"""{"created":${Json.writeString(req.name)}}""")
      case _ => reply(ex, 404, """{"error":"no such route"}""")
    }

  private def handleDelete(ex: HttpExchange, parts: List[String]): Unit =
    parts match {
      case List("v1", "namespaces", ns) =>
        inWriteTxn(txn => Graft.dropNamespace(storage, txn, ns, cascade = false))
        reply(ex, 200, s"""{"dropped":${Json.writeString(ns)}}""")
      case List("v1", "namespaces", ns, "tables", t) =>
        inWriteTxn(txn => Graft.dropTable(storage, txn, ns, t))
        reply(ex, 200, s"""{"dropped":${Json.writeString(t)}}""")
      case _ => reply(ex, 404, """{"error":"no such route"}""")
    }

  private def withReadTxn[T](f: Transaction => T): T = {
    val txn = Graft.beginTransaction(storage)
    try f(txn) finally txn.close()
  }

  private def listJson(field: String, names: Seq[String]): String =
    s"""{"$field":${Json.writeString(names)}}"""

  private def reply(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

/** POST /v1/namespaces/{ns}/tables request body. */
final case class CreateTableRequest(
    name: String = null,
    schemaJson: String = null,
    properties: Map[String, String] = null)
