package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.objects.Json
import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Server-side scan planning over REST: the client's filter prunes
  * against native per-file stats on the server; surviving tasks carry
  * the delete files that apply to them; refusals and conservative
  * fallbacks behave per the inclusive-evaluation contract.
  */
class IcebergPlanSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("graft-iplan").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.ipl", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ipl.warehouse", warehouse)
    .getOrCreate()

  private def storage = spark.sessionState.catalogManager.catalog("ipl")
    .asInstanceOf[GraftCatalog].storage

  private val client = HttpClient.newHttpClient()

  private def postPlan(port: Int, ns: String, t: String,
      body: String): (Int, String) = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$port/v1/iceberg/namespaces/$ns/tables/$t/plan"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def withServer[A](f: Int => A): A = {
    val server = new CatalogHttpServer(storage)
    val port = server.start()
    try f(port) finally server.stop()
  }

  test("range filter prunes files by min/max stats; survivors reconstruct") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns1")
    spark.sql("CREATE TABLE ipl.ns1.rng (k BIGINT, v DOUBLE)")
    // 4 files with DISJOINT k ranges → stats pruning has something to cut
    spark.range(1000).select(col("id").as("k"), (col("id") * 1.5).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .writeTo("ipl.ns1.rng").append()

    withServer { port =>
      val (c0, full) = postPlan(port, "ns1", "rng", "{}")
      assert(c0 == 200, full)
      val fullTasks = Json.mapper.readTree(full).get("file-scan-tasks")
      assert(fullTasks.size() == 4)

      val (c1, resp) = postPlan(port, "ns1", "rng",
        """{"filter":{"type":"lt","term":"k","value":100}}""")
      assert(c1 == 200, resp)
      val node = Json.mapper.readTree(resp)
      assert(node.path("plan-status").asText() == "completed")
      val tasks = node.get("file-scan-tasks")
      assert(tasks.size() < 4 && tasks.size() >= 1,
        s"expected pruning, got ${tasks.size()} tasks")
      assert(node.path("pruned-data-files").asInt() == 4 - tasks.size())
      // reconstruct from the returned files only + residual filter
      val paths = (0 until tasks.size()).map(i =>
        tasks.get(i).get("data-file").get("file-path").asText())
      val got = spark.read.parquet(paths: _*).filter(col("k") < 100).count()
      assert(got == 100)
      // every surviving task echoes the residual
      assert((0 until tasks.size()).forall(i =>
        tasks.get(i).has("residual-filter")))
    }
  }

  test("identity partition values prune exactly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns2")
    spark.sql("""CREATE TABLE ipl.ns2.part (k BIGINT, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO ipl.ns2.part VALUES
      (1, 'eu'), (2, 'us'), (3, 'eu'), (4, 'ap')""")
    withServer { port =>
      val (c, resp) = postPlan(port, "ns2", "part",
        """{"filter":{"type":"eq","term":"region","value":"eu"}}""")
      assert(c == 200, resp)
      val tasks = Json.mapper.readTree(resp).get("file-scan-tasks")
      val paths = (0 until tasks.size()).map(i =>
        tasks.get(i).get("data-file").get("file-path").asText())
      assert(paths.nonEmpty && paths.forall(_.contains("region=eu")),
        s"non-eu files survived: $paths")
    }
  }

  test("pending position deletes ride the tasks as delete-file references") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns3")
    spark.sql("""CREATE TABLE ipl.ns3.mor (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read',
                     'graft.merge.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO ipl.ns3.mor SELECT id, 'x' FROM range(100)")
    // MERGE upsert → pending position-delete object
    spark.sql("""MERGE INTO ipl.ns3.mor t
      USING (SELECT id AS k, 'upd' AS v FROM range(10)) s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    withServer { port =>
      val (c, resp) = postPlan(port, "ns3", "mor", "{}")
      assert(c == 200, resp)
      val node = Json.mapper.readTree(resp)
      val dels = node.get("delete-files")
      assert(dels.size() >= 1, resp)
      assert((0 until dels.size()).exists(i =>
        dels.get(i).path("content").asText() == "position-deletes"))
      // the ORIGINAL data file references the delete; the delta file
      // written by the merge (same sequence) must NOT
      val tasks = node.get("file-scan-tasks")
      val refCounts = (0 until tasks.size()).map { i =>
        (tasks.get(i).get("data-file").get("file-path").asText(),
          tasks.get(i).get("delete-file-references").size())
      }
      assert(refCounts.exists(_._2 > 0), s"no task references deletes: $refCounts")
    }
  }

  test("conservative fallbacks and refusals") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns4")
    spark.sql("CREATE TABLE ipl.ns4.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO ipl.ns4.t VALUES (1, 'a'), (2, NULL)")
    withServer { port =>
      val total = Json.mapper.readTree(
        postPlan(port, "ns4", "t", "{}")._2)
        .get("file-scan-tasks").size()
      // unknown column term → conservative keep, not an error
      val (c1, r1) = postPlan(port, "ns4", "t",
        """{"filter":{"type":"eq","term":"nope","value":1}}""")
      assert(c1 == 200)
      assert(Json.mapper.readTree(r1).get("file-scan-tasks").size() == total)
      // is-null keeps only files whose null count admits a null
      val (c2, r2) = postPlan(port, "ns4", "t",
        """{"filter":{"type":"is-null","term":"s"}}""")
      assert(c2 == 200)
      val nullTasks = Json.mapper.readTree(r2).get("file-scan-tasks").size()
      assert(nullTasks >= 1 && nullTasks <= total)
      if (total == 2) assert(nullTasks == 1,
        "null-count pruning should cut the no-null file")
      // impossible range on a stats-covered column → zero tasks
      val (c3, r3) = postPlan(port, "ns4", "t",
        """{"filter":{"type":"gt","term":"k","value":1000}}""")
      assert(c3 == 200)
      assert(Json.mapper.readTree(r3).get("file-scan-tasks").size() == 0, r3)
      // malformed expression type → 400
      val (c4, _) = postPlan(port, "ns4", "t",
        """{"filter":{"type":"starts-with-banana","term":"s","value":"x"}}""")
      assert(c4 == 400)
      // unknown snapshot → 400
      val (c5, _) = postPlan(port, "ns4", "t", """{"snapshot-id": 999999}""")
      assert(c5 == 400)
    }
  }

  private def httpGet(port: Int, path: String): (Int, String) = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def httpDelete(port: Int, path: String): Int =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()

  private def postTasks(port: Int, ns: String, t: String,
      token: String): (Int, String) = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$port/v1/iceberg/namespaces/$ns/tables/$t/tasks"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"plan-task":"$token"}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("async plan: submitted → poll plan-id → paged task fetches → cancel") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns6")
    spark.sql("""CREATE TABLE ipl.ns6.big (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.plan.page-size' = '3',
                                'graft.plan.async-threshold' = '5')""")
    spark.range(1000)
      .select(col("id").as("k"), (col("id") * 1.0).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .writeTo("ipl.ns6.big").append()
    withServer { port =>
      // past the async threshold: the response is submitted + plan-id,
      // never a task inventory in the POST body
      val (c, resp) = postPlan(port, "ns6", "big", "{}")
      assert(c == 200, resp)
      val n = Json.mapper.readTree(resp)
      assert(n.path("plan-status").asText() == "submitted")
      val planId = n.path("plan-id").asText()
      assert(planId.nonEmpty)

      // poll: completed, tasks addressed by opaque plan-task tokens
      // (8 files / page-size 3 → 3 pages), nothing inline
      val base = s"/v1/iceberg/namespaces/ns6/tables/big/plan/$planId"
      val (gc, gresp) = httpGet(port, base)
      assert(gc == 200, gresp)
      val plan = Json.mapper.readTree(gresp)
      assert(plan.path("plan-status").asText() == "completed")
      assert(!plan.has("file-scan-tasks"))
      val tokens = plan.get("plan-tasks")
      assert(tokens != null && tokens.size() == 3, gresp)
      assert(plan.path("pruned-data-files").asInt() == 0)

      // fetch every page: sizes 3+3+2, paths disjoint, union complete,
      // and the data reconstructs from the paged inventory alone
      val paths = (0 until tokens.size()).flatMap { i =>
        val (tc, tresp) = postTasks(port, "ns6", "big",
          tokens.get(i).asText())
        assert(tc == 200, tresp)
        val page = Json.mapper.readTree(tresp)
        val ts = page.get("file-scan-tasks")
        assert(ts.size() <= 3 && ts.size() > 0)
        assert(page.has("delete-files"), "pages are self-contained")
        (0 until ts.size()).map(j =>
          ts.get(j).get("data-file").get("file-path").asText())
      }
      assert(paths.size == 8 && paths.distinct.size == 8)
      assert(spark.read.parquet(paths: _*).count() == 1000)

      // bogus token → 400 (malformed) / unknown page → 404
      assert(postTasks(port, "ns6", "big", "notatoken")._1 == 400)
      // unknown plan id → 404
      assert(httpGet(port,
        "/v1/iceberg/namespaces/ns6/tables/big/plan/nope")._1 == 404)

      // cancel: poll flips to cancelled, page fetches refuse
      assert(httpDelete(port, base) == 204)
      val (cc, cresp) = httpGet(port, base)
      assert(cc == 200 &&
        Json.mapper.readTree(cresp).path("plan-status").asText() == "cancelled")
      assert(postTasks(port, "ns6", "big", tokens.get(0).asText())._1 == 400)
    }
  }

  test("plan store is byte-bounded: pages spill to storage, survive " +
      "cache eviction and a fresh server process") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns8")
    spark.sql("""CREATE TABLE ipl.ns8.spill (k BIGINT)
                 TBLPROPERTIES ('graft.plan.page-size' = '2',
                                'graft.plan.async-threshold' = '5')""")
    spark.range(600).select(col("id").as("k"))
      .repartitionByRange(12, col("k")).sortWithinPartitions("k")
      .writeTo("ipl.ns8.spill").append()
    val prevBound = IcebergPlan.maxPageCacheBytes
    // a single task page serializes to well over 1 KB: a 4 KB bound
    // forces eviction while plans are still being registered
    IcebergPlan.maxPageCacheBytes = 4096
    try withServer { port =>
      val (c, resp) = postPlan(port, "ns8", "spill", "{}")
      assert(c == 200, resp)
      val planId = Json.mapper.readTree(resp).path("plan-id").asText()
      val (gc, gresp) = httpGet(port,
        s"/v1/iceberg/namespaces/ns8/tables/spill/plan/$planId")
      assert(gc == 200, gresp)
      val tokens = Json.mapper.readTree(gresp).get("plan-tasks")
      assert(tokens.size() == 6) // 12 files / page-size 2
      // the cache respects the byte bound even though 6 pages were
      // registered, and every page — cached or evicted — still serves
      assert(IcebergPlan.pageCacheResidentBytes <= 4096,
        s"resident ${IcebergPlan.pageCacheResidentBytes} past the bound")
      val total = (0 until tokens.size()).map { i =>
        val (tc, tresp) = postTasks(port, "ns8", "spill",
          tokens.get(i).asText())
        assert(tc == 200, tresp)
        Json.mapper.readTree(tresp).get("file-scan-tasks").size()
      }.sum
      assert(total == 12)
      assert(IcebergPlan.pageCacheResidentBytes <= 4096)
      // spilled artifacts exist as derived storage objects
      assert(storage.exists(s"serve/plans/$planId/plan.json"))
      assert(storage.exists(s"serve/plans/$planId/page-5.json"))
      // a fresh server process over the same storage serves the same
      // plan: poll, page fetch, cancel — nothing lived only in memory
      IcebergPlan.dropInMemoryStoreForTest()
      val (gc2, gresp2) = httpGet(port,
        s"/v1/iceberg/namespaces/ns8/tables/spill/plan/$planId")
      assert(gc2 == 200 && Json.mapper.readTree(gresp2)
        .path("plan-status").asText() == "completed", gresp2)
      assert(postTasks(port, "ns8", "spill", tokens.get(3).asText())._1 == 200)
      assert(httpDelete(port,
        s"/v1/iceberg/namespaces/ns8/tables/spill/plan/$planId") == 204)
      IcebergPlan.dropInMemoryStoreForTest()
      // cancellation is durable across processes too (marker object)
      val (cc, cresp) = httpGet(port,
        s"/v1/iceberg/namespaces/ns8/tables/spill/plan/$planId")
      assert(cc == 200 && Json.mapper.readTree(cresp)
        .path("plan-status").asText() == "cancelled", cresp)
      assert(postTasks(port, "ns8", "spill", tokens.get(0).asText())._1 == 400)

      // TTL: spilled artifacts of expired plans are swept by the next
      // registration (creation time rides in the plan id), so storage
      // does not grow forever; the fresh plan still serves
      val prevTtl = IcebergPlan.planTtlMillis
      IcebergPlan.planTtlMillis = 0L // everything existing is expired
      try {
        val (c2, resp2) = postPlan(port, "ns8", "spill", "{}")
        assert(c2 == 200, resp2)
        assert(!storage.exists(s"serve/plans/$planId/plan.json"),
          "expired plan artifacts must be swept on the register path")
        val pid2 = Json.mapper.readTree(resp2).path("plan-id").asText()
        assert(storage.exists(s"serve/plans/$pid2/plan.json"))
      } finally IcebergPlan.planTtlMillis = prevTtl
    } finally IcebergPlan.maxPageCacheBytes = prevBound
  }

  test("paginated sync plan: completed with plan-tasks under the threshold") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns7")
    spark.sql("""CREATE TABLE ipl.ns7.paged (k BIGINT)
                 TBLPROPERTIES ('graft.plan.page-size' = '2')""")
    spark.range(100).select(col("id").as("k"))
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .writeTo("ipl.ns7.paged").append()
    withServer { port =>
      // 5 files > page-size 2, below the (default) async threshold:
      // synchronous completed result, paged task inventory
      val (c, resp) = postPlan(port, "ns7", "paged", "{}")
      assert(c == 200, resp)
      val plan = Json.mapper.readTree(resp)
      assert(plan.path("plan-status").asText() == "completed")
      assert(!plan.has("file-scan-tasks"))
      val tokens = plan.get("plan-tasks")
      assert(tokens.size() == 3) // 2+2+1
      val total = (0 until tokens.size()).map { i =>
        val (tc, tresp) = postTasks(port, "ns7", "paged",
          tokens.get(i).asText())
        assert(tc == 200, tresp)
        Json.mapper.readTree(tresp).get("file-scan-tasks").size()
      }.sum
      assert(total == 5)
    }
  }

  test("snapshot-id plans the older inventory") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipl.ns5")
    spark.sql("CREATE TABLE ipl.ns5.tt (k BIGINT)")
    spark.sql("INSERT INTO ipl.ns5.tt VALUES (1)")
    val firstSnap = spark.sql(
      "SELECT min(snapshot_id) FROM ipl.ns5.`tt$snapshots`")
      .collect()(0).getLong(0)
    spark.sql("INSERT INTO ipl.ns5.tt VALUES (2)")
    withServer { port =>
      val (c, resp) = postPlan(port, "ns5", "tt",
        s"""{"snapshot-id": $firstSnap}""")
      assert(c == 200, resp)
      assert(Json.mapper.readTree(resp).get("file-scan-tasks").size() == 1)
      val (c2, resp2) = postPlan(port, "ns5", "tt", "{}")
      assert(c2 == 200)
      assert(Json.mapper.readTree(resp2).get("file-scan-tasks").size() == 2)
    }
  }
}
