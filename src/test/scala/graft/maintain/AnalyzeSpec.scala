package graft.maintain

import java.nio.file.Files

import graft.format.{Puffin, TableMetadata}
import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE: theta-sketch column NDVs persisted as a real Iceberg
  * Puffin statistics file, recorded in table metadata, served over the
  * REST payload, replaced on re-analyze, and expired with the snapshot
  * they cover. Sketches are exact below their retention threshold, so
  * every assert here is deterministic.
  */
class AnalyzeSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-anz").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.anz", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.anz.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("anz").asInstanceOf[GraftCatalog]

  private def meta(t: String): TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns1", t)
    TableMetadata.read(cat.storage, td.metadataLocation)
  }

  test("ndv per column; puffin file is real; REST metadata serves it") {
    spark.sql("CREATE NAMESPACE anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.t (k BIGINT, seg STRING, v DOUBLE)")
    spark.sql("""INSERT INTO anz.ns1.t
                 SELECT id, concat('s', id % 7), CAST(id % 131 AS DOUBLE)
                 FROM range(0, 1000, 1, 4)""")
    val rows = spark.sql(
      "CALL anz.system.analyze_table(namespace => 'ns1', table => 't')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("k" -> 1000L, "seg" -> 7L, "v" -> 131L))

    val st = meta("t").stats.get
    assert(st.blobs.map(_.ndv).sorted == Seq(7L, 131L, 1000L))
    // the file is REAL puffin: magic + footer parse, blobs are
    // standard theta compact sketches with the recorded estimates
    val pf = Puffin.read(cat.storage.read(st.path))
    assert(pf.blobs.map(_.blobType).distinct ==
      Seq("apache-datasketches-theta-v1"))
    pf.blobs.foreach { b =>
      val sk = org.apache.datasketches.theta.Sketch.wrap(
        org.apache.datasketches.memory.Memory.wrap(pf.blobData(b)))
      assert(math.round(sk.getEstimate).toString == b.properties("ndv"))
    }
    assert(pf.blobs.forall(_.fields.nonEmpty), "field ids recorded")

    // NATIVE consumption: the next scan reports the NDVs as DSv2
    // column statistics, the numbers Spark's CBO estimates with
    val scan = spark.table("anz.ns1.t").queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.head
    val colStats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val ndvByName = colStats.asScala.map { case (ref, cs) =>
      ref.fieldNames().mkString(".") -> cs.distinctCount().getAsLong
    }.toMap
    assert(ndvByName == Map("k" -> 1000L, "seg" -> 7L, "v" -> 131L))

    // served Iceberg metadata carries the spec's `statistics` entry
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns1", "t")
    val node = graft.serve.IcebergRest.tableMetadataJson(td, meta("t"),
      "loc", "dataLoc", Map(meta("t").currentSnapshotId -> "ml.avro"),
      Some("abs.puffin"))
    val stats = node.get("statistics")
    assert(stats != null && stats.size() == 1)
    assert(stats.get(0).get("statistics-path").asText() == "abs.puffin")
    assert(stats.get(0).get("blob-metadata").size() == 3)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bounds, null counts, equi-depth histograms reach Spark's CBO") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.t3 (k BIGINT, seg STRING, v DOUBLE, d DATE)")
    // v is skewed: 90% of rows sit at 1.0, the tail spreads over ~1000
    // values — exactly the shape equi-depth histograms exist for
    spark.sql("""INSERT INTO anz.ns1.t3
                 SELECT id,
                        CASE WHEN id % 10 = 0 THEN NULL
                             ELSE concat('s', id % 5) END,
                        CASE WHEN id % 10 < 9 THEN 1.0
                             ELSE CAST(id % 1000 AS DOUBLE) END,
                        DATE '2024-01-01' + CAST(id % 30 AS INT)
                 FROM range(0, 10000, 1, 4)""")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 't3')")

    // persisted: stat-string bounds (dates as epoch days), null
    // counts, 16-bin histogram with explicit height
    val byCol = meta("t3").stats.get.blobs.map(b => b.column -> b).toMap
    assert(byCol("k").min.contains("0") && byCol("k").max.contains("9999"))
    assert(byCol("k").nullCount == 0L)
    assert(byCol("seg").nullCount == 1000L)
    assert(byCol("seg").min.isEmpty && byCol("seg").max.isEmpty,
      "string bounds are not served (CBO range estimation is numeric-only)")
    assert(byCol("d").min.contains(
      java.time.LocalDate.of(2024, 1, 1).toEpochDay.toString))
    assert(byCol("d").max.contains(
      java.time.LocalDate.of(2024, 1, 30).toEpochDay.toString))
    // string widths: seg is 's0'..'s4' (2 chars) where non-null
    assert(byCol("seg").avgLen == 2L && byCol("seg").maxLen == 2L)
    assert(byCol("k").avgLen == -1L, "widths only for variable-length types")
    val vb = byCol("v")
    assert(vb.histBounds.size == Maintenance.HistogramBins + 1)
    assert(vb.histNdv.size == Maintenance.HistogramBins)
    assert(vb.histHeight == 10000.0 / Maintenance.HistogramBins)
    // skew shows in the bins: ≥ half of them are the single hot value
    assert(vb.histBounds.count(_ == 1.0.toString) >=
      Maintenance.HistogramBins / 2)

    // the operator view: `<table>$stats` lists what ANALYZE recorded
    val statRows = spark.sql(
      """SELECT column, ndv, min, max, null_count, avg_len,
                histogram_bins, covers_current
         FROM anz.ns1.`t3$stats` ORDER BY column""").collect()
    assert(statRows.map(_.getString(0)).toSeq == Seq("d", "k", "seg", "v"))
    val segRow = statRows.find(_.getString(0) == "seg").get
    assert(segRow.getLong(4) == 1000L && segRow.getLong(5) == 2L)
    val kRow = statRows.find(_.getString(0) == "k").get
    assert(kRow.getString(2) == "0" && kRow.getString(3) == "9999")
    assert(statRows.forall(_.getBoolean(7)), "stats cover the current snapshot")
    assert(statRows.find(_.getString(0) == "v").get.getInt(6) ==
      Maintenance.HistogramBins)

    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.planStats.enabled" -> "true") {
      // catalyst consumption: the optimized plan's attribute stats
      // carry what ANALYZE persisted — Spark accepted the DSv2
      // ColumnStatistics (min/max typed per column, CBO-compatible)
      val attrStats = spark.table("anz.ns1.t3")
        .queryExecution.optimizedPlan.stats.attributeStats
      def statOf(n: String) = attrStats.find(_._1.name == n).get._2
      assert(statOf("k").min.contains(0L) && statOf("k").max.contains(9999L))
      assert(statOf("k").nullCount.contains(BigInt(0)))
      val kNdv = statOf("k").distinctCount.get
      assert((kNdv - 10000).abs < BigInt(500),
        s"theta estimate within 5% of 10000, got $kNdv")
      assert(statOf("seg").nullCount.contains(BigInt(1000)))
      assert(statOf("seg").avgLen.contains(2L) &&
        statOf("seg").maxLen.contains(2L))
      assert(statOf("d").min.contains(
        java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt))
      assert(statOf("v").histogram.isDefined, "histogram reached catalyst")
      assert(statOf("v").histogram.get.bins.length ==
        Maintenance.HistogramBins)
      // date histograms bin in epoch DAYS (catalyst's internal date
      // scale, what filter literals convert to)
      val dHist = statOf("d").histogram
      assert(dHist.isDefined, "date column histogram reached catalyst")
      assert(dHist.get.bins.head.lo ==
        java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble)
      assert(dHist.get.bins.last.hi ==
        java.time.LocalDate.of(2024, 1, 30).toEpochDay.toDouble)
      // a 3-of-30-days range filter estimates near 10%
      val dEst = spark.table("anz.ns1.t3")
        .filter("d <= DATE '2024-01-03'")
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(dEst > BigInt(500) && dEst < BigInt(2000),
        s"date-range estimate should land near 1000, got $dEst")

      // filter selectivity on the skewed column: without the
      // histogram a v <= 0.5 estimate is min/max-interpolated (~0.1%
      // of range → but range is [1,999] so ~0 … use v = 1.0 equality:
      // histogram says ~90%, naive 1/ndv says ~0.1%)
      val eqEst = spark.table("anz.ns1.t3").filter("v = 1.0")
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(eqEst > BigInt(5000),
        s"histogram-driven equality estimate should see the hot value, got $eqEst")

      // range selectivity via min/max: k <= 999 is 10% of [0, 9999]
      val rngEst = spark.table("anz.ns1.t3").filter("k <= 999")
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(rngEst > BigInt(500) && rngEst < BigInt(2000),
        s"min/max range estimate should land near 1000, got $rngEst")
    }
  }

  test("file-level bounds tighten column stats after pruning") {
    // the scan merges ANALYZE stats with footer stats over the PRUNED
    // file list — a filtered scan must report the kept files' tighter
    // bounds, not the whole-table ANALYZE bounds
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.rng (k BIGINT, v DOUBLE)")
    // two range-disjoint files
    spark.sql("""INSERT INTO anz.ns1.rng
                 SELECT id, CAST(id AS DOUBLE) FROM range(0, 1000)""")
    spark.sql("""INSERT INTO anz.ns1.rng
                 SELECT id, CAST(id AS DOUBLE) FROM range(5000, 6000)""")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'rng')")
    import scala.jdk.CollectionConverters._
    def scanStats(df: org.apache.spark.sql.DataFrame) = {
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.head
      scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics().columnStats().asScala.map { case (r, cs) =>
          r.fieldNames().mkString(".") -> cs
        }.toMap
    }
    // unfiltered: ANALYZE + full file set → whole-table bounds
    val full = scanStats(spark.table("anz.ns1.rng"))
    assert(full("k").min.get == 0L && full("k").max.get == 5999L)
    // filtered to the first file: bounds tighten to the kept file
    val pruned = scanStats(spark.table("anz.ns1.rng").filter("k < 1000"))
    assert(pruned("k").min.get == 0L && pruned("k").max.get == 999L,
      s"pruned scan should report the kept file's bounds, got " +
        s"${pruned("k").min} .. ${pruned("k").max}")
    // NDV still rides along from ANALYZE (whole-snapshot)
    assert(pruned("k").distinctCount.isPresent)
  }

  test("join sizing improves with ANALYZE stats under CBO") {
    // fact↔dim with a selective dim filter: with NDVs + bounds the
    // join's output estimate is near truth; without ANALYZE the CBO
    // falls back to size-derived guesses that overshoot wildly
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.fact (fk BIGINT, m DOUBLE)")
    spark.sql("""INSERT INTO anz.ns1.fact
                 SELECT id % 100, CAST(id AS DOUBLE)
                 FROM range(0, 20000, 1, 4)""")
    spark.sql("CREATE TABLE anz.ns1.dim (k BIGINT, tag STRING)")
    spark.sql("""INSERT INTO anz.ns1.dim
                 SELECT id, concat('t', id % 4) FROM range(0, 100, 1, 1)""")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'fact')")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'dim')")
    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.planStats.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val joined = spark.table("anz.ns1.fact")
        .join(spark.table("anz.ns1.dim"),
          org.apache.spark.sql.functions.col("fk") ===
            org.apache.spark.sql.functions.col("k"))
        .where("k < 10") // 10% of dim keys → 2000 fact rows
      val est = joined.queryExecution.optimizedPlan.stats.rowCount.get
      val actual = joined.count()
      assert(actual == 2000L)
      assert(est > BigInt(400) && est < BigInt(10000),
        s"join estimate should be within ~5x of 2000 with stats, got $est")
    }
  }

  test("incremental analyze merges the delta; equals a full re-analyze") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.inc (k BIGINT, seg STRING)")
    spark.sql("""INSERT INTO anz.ns1.inc
                 SELECT id, concat('s', id % 7) FROM range(0, 1000, 1, 4)""")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'inc')")
    val firstStats = meta("inc").stats.get

    // append a DISJOINT delta (and a longer seg variant), then analyze
    // incrementally: only the delta is scanned, sketches union
    spark.sql("""INSERT INTO anz.ns1.inc
                 SELECT id, concat('seg', id % 3) FROM range(1000, 1500, 1, 2)""")
    val inc = spark.sql(
      """CALL anz.system.analyze_table(namespace => 'ns1', table => 'inc',
                                       mode => 'incremental')""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // theta is exact below its retention: merged NDVs are exact
    assert(inc == Map("k" -> 1500L, "seg" -> 10L), inc.toString)
    val st = meta("inc").stats.get
    assert(st.snapshotId != firstStats.snapshotId, "ref moved to current")
    val byCol = st.blobs.map(b => b.column -> b).toMap
    assert(byCol("k").min.contains("0") && byCol("k").max.contains("1499"))
    assert(byCol("k").nullCount == 0L)
    // widths merged: 1000×2 chars + 500×4 chars → avg 2.67 ≈ 3
    assert(byCol("seg").maxLen == 4L)
    assert(byCol("seg").avgLen == 3L, s"got ${byCol("seg").avgLen}")

    // equal to a from-scratch full analyze of the same state
    val full = spark.sql(
      "CALL anz.system.analyze_table(namespace => 'ns1', table => 'inc')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full == inc)
    val fullByCol = meta("inc").stats.get.blobs.map(b => b.column -> b).toMap
    assert(fullByCol("k").min == byCol("k").min &&
      fullByCol("k").max == byCol("k").max)

    // a rewrite breaks the additive chain: incremental falls back to a
    // FULL analyze (correct values, not a refusal)
    spark.sql("DELETE FROM anz.ns1.inc WHERE k >= 1000")
    val afterDel = spark.sql(
      """CALL anz.system.analyze_table(namespace => 'ns1', table => 'inc',
                                       mode => 'incremental')""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterDel("k") == 1000L, s"fallback full analyze, got $afterDel")
  }

  test("histograms, bounds, and widths serve over plain HTTP in the " +
      "statistics entry") {
    // the REST facade's stated audience is an EXTERNAL planner: the
    // selectivity signal Spark's CBO gets (equi-depth histogram,
    // bounds, null count, string widths) must ride the spec's
    // `statistics` blob properties over the wire, not just in-process
    val server = new graft.serve.CatalogHttpServer(cat.storage)
    val port = server.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val res = client.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(
          s"http://127.0.0.1:$port/v1/iceberg/namespaces/ns1/tables/t3"))
        .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(res.statusCode() == 200, res.body())
      val md = graft.objects.Json.mapper.readTree(res.body())
        .get("metadata")
      val stats = md.get("statistics")
      assert(stats != null && stats.size() == 1, md.toString.take(400))
      val blobs = stats.get(0).get("blob-metadata")
      val propsByField = (0 until blobs.size()).map { i =>
        blobs.get(i).get("fields").get(0).asInt() ->
          blobs.get(i).get("properties")
      }.toMap
      // t3 (from the CBO test): v is the skewed DOUBLE column, seg the
      // nullable STRING — field ids are positional (k=1,seg=2,v=3,d=4)
      val v = propsByField(3)
      assert(v.get("histogram-bounds").asText()
        .split(",").length == Maintenance.HistogramBins + 1)
      assert(v.get("histogram-ndv").asText()
        .split(",").length == Maintenance.HistogramBins)
      assert(v.get("histogram-height").asText().toDouble ==
        10000.0 / Maintenance.HistogramBins)
      assert(v.get("lower_bound") != null && v.get("upper_bound") != null)
      val seg = propsByField(2)
      assert(seg.get("null_count").asText() == "1000")
      assert(seg.get("avg_len").asText() == "2" &&
        seg.get("max_len").asText() == "2")
      val d = propsByField(4)
      assert(d.get("histogram-bounds").asText().split(",").head.toDouble ==
        java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble,
        "date histograms serve in epoch-day scale")
    } finally server.stop()
  }

  test("incremental analyze rebuilds a drifted histogram; carries an " +
      "in-range one") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.drf (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO anz.ns1.drf
                 SELECT id, CAST(id % 100 AS DOUBLE)
                 FROM range(0, 2000, 1, 4)""")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'drf')")
    val before = meta("drf").stats.get.blobs.map(b => b.column -> b).toMap
    assert(before("k").histBounds.last.toDouble == 1999.0)

    // append FAR beyond k's analyzed range (>> one bin width past
    // 1999) while v stays in range: the k histogram must rebuild, the
    // v histogram must carry over unchanged
    spark.sql("""INSERT INTO anz.ns1.drf
                 SELECT id, CAST(id % 100 AS DOUBLE)
                 FROM range(3000, 4000, 1, 2)""")
    val inc = spark.sql(
      """CALL anz.system.analyze_table(namespace => 'ns1', table => 'drf',
                                       mode => 'incremental')""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc("k") == 3000L, "NDV still merges exactly (below retention)")
    val after = meta("drf").stats.get.blobs.map(b => b.column -> b).toMap
    assert(after("k").histBounds.last.toDouble >= 3000.0,
      s"drifted histogram rebuilt to cover the appended range, " +
        s"got ${after("k").histBounds.last}")
    assert(after("k").histBounds.head.toDouble == 0.0)
    assert(after("v").histBounds == before("v").histBounds,
      "in-range column's boundaries carry over without a rescan")
    // height rescaled to the new logical row count on BOTH columns
    assert(after("v").histHeight == 3000.0 / Maintenance.HistogramBins)
    assert(after("k").histHeight == 3000.0 / Maintenance.HistogramBins)

    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.planStats.enabled" -> "true") {
      // the rebuilt histogram sizes a range filter on the NEW region
      // within 2× (1000 of 3000 rows have k >= 3000); the stale
      // carried-over histogram had no mass there at all
      val est = spark.table("anz.ns1.drf").filter("k >= 3000")
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(est > BigInt(500) && est < BigInt(2000),
        s"drift-rebuilt estimate should land near 1000, got $est")
    }
  }

  test("incremental analyze weights avgLen by LOGICAL rows under " +
      "carried-over deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.lr (k BIGINT, s STRING)")
    spark.sql("""INSERT INTO anz.ns1.lr
                 SELECT id, 'aa' FROM range(0, 1000, 1, 2)""")
    // mask half the rows; the delete set is IDENTICAL at both analyze
    // points, so the incremental path is allowed — but raw
    // Snapshot.totalRows still counts 1000
    spark.sql("DELETE FROM anz.ns1.lr WHERE k < 500")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'lr')")
    assert(meta("lr").stats.get.logicalRows == 500L)
    spark.sql("""INSERT INTO anz.ns1.lr
                 SELECT id, 'aaaaaa' FROM range(1000, 1500, 1, 1)""")
    spark.sql("""CALL anz.system.analyze_table(namespace => 'ns1',
                                               table => 'lr',
                                               mode => 'incremental')""")
    val byCol = meta("lr").stats.get.blobs.map(b => b.column -> b).toMap
    // 500 logical 2-char rows + 500 appended 6-char rows → avg 4;
    // weighting by the raw 1000-row count would give round(3.33) = 3
    assert(byCol("s").avgLen == 4L, s"got ${byCol("s").avgLen}")
    assert(meta("lr").stats.get.logicalRows == 1000L)
    // matches a from-scratch full analyze of the same state
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 'lr')")
    val fullByCol = meta("lr").stats.get.blobs.map(b => b.column -> b).toMap
    assert(fullByCol("s").avgLen == 4L)
  }

  test("re-analyze replaces; merge-on-read deletes respected; expiry drops") {
    spark.sql("""CREATE TABLE anz.ns1.t2 (k BIGINT, v STRING)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO anz.ns1.t2 SELECT id, 'x' FROM range(0, 100, 1, 2)")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 't2')")
    val first = meta("t2").stats.get
    assert(first.blobs.find(_.fields.nonEmpty).isDefined)

    // MoR delete half the keys: NDV must describe the LOGICAL table
    spark.sql("DELETE FROM anz.ns1.t2 WHERE k >= 50")
    val after = spark.sql(
      """CALL anz.system.analyze_table(namespace => 'ns1', table => 't2',
         columns => 'k')""").collect()
    assert(after.length == 1 && after(0).getLong(1) == 50L)
    val second = meta("t2").stats.get
    assert(second.snapshotId != first.snapshotId)

    // appending moves the head; expiring history drops the stats ref
    // (its covered snapshot is gone) and deletes the puffin object
    spark.sql("INSERT INTO anz.ns1.t2 VALUES (999, 'y')")
    Maintenance.expireSnapshots(cat, Identifier.of(Array("ns1"), "t2"),
      keepLast = 1)
    assert(meta("t2").stats.isEmpty, "stale stats ref must not survive")
    assert(!cat.storage.exists(second.path), "puffin object deleted")
  }
}
