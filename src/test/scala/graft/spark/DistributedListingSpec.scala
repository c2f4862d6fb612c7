package graft.spark

import java.nio.file.Files

import graft.catalog.Graft
import graft.objects.{CatalogDef, FileLocations, ObjectKeys}
import graft.storage.{LocalStorageOps, StorageConf}
import graft.tree.TreeOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog listings past driver scale (SURVEY §7.5 risk register;
  * reference ambition of billions of objects, docs/index.md:17-19):
  * `sys.objects` over a MILLION-object catalog must run as a
  * distributed scan whose driver footprint is node PATHS, never the
  * object defs themselves.
  */
class DistributedListingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("8")
    .config("spark.sql.catalog.big", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.big.warehouse",
      DistributedListingSpec.warehouse)
    .getOrCreate()

  test("1M-object catalog: sys.objects is a distributed scan over node files") {
    val n = 1000000
    val cd = CatalogDef()
    val storage = new LocalStorageOps(DistributedListingSpec.warehouse)
    Graft.createCatalog(storage, cd)

    // build the tree directly (the txn machinery would take hours for
    // 1M commits; one bulk root write is the realistic import path)
    val root = TreeOps.findLatestRoot(storage).get
    val t0 = System.nanoTime()
    TreeOps.setValue(storage, root, ObjectKeys.namespaceKey("ns", cd),
      Some("def/ns.json"), cd.order)
    (0 until n).foreach { i =>
      TreeOps.setValue(storage, root,
        ObjectKeys.tableKey("ns", f"t$i%07d", cd), Some(s"def/$i"), cd.order)
    }
    val insertSec = (System.nanoTime() - t0) / 1e9
    TreeOps.writeRoot(storage, root, 1L)
    root.close()
    val buildSec = (System.nanoTime() - t0) / 1e9
    info(f"built $n-object tree: insert=$insertSec%.1fs total=$buildSec%.1fs")

    // the subtree-cut walk holds O(cut width) paths on the driver —
    // bounded even at this tree's widest (planted) level of thousands
    // of nodes; subtree roots are walked on the executors
    val sconf = StorageConf(DistributedListingSpec.warehouse, "local")
    val latest = TreeOps.findLatestRoot(storage).get
    val cutWidth = 64
    val (ancestors, cutRoots) =
      try DistributedTraverse.subtreeCut(spark, sconf, latest.path.get,
        cutWidth, Seq.empty)
      finally latest.close()
    assert(cutRoots.size > cutWidth, "cut must land on a wide level")
    assert(ancestors.size + cutRoots.size <= cutWidth * (cd.order + 1),
      s"driver growth must be bounded by cut width × order, " +
        s"held ${ancestors.size + cutRoots.size}")

    // the listing itself runs as a distributed multi-task scan
    @volatile var maxTasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val t = js.stageInfos.map(_.numTasks).sum
        if (t > maxTasks) maxTasks = t
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val counts = spark.table("big.sys.objects")
        .groupBy("kind").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("table") == n)
      assert(counts("namespace") == 1L)
      val deadline = System.nanoTime() + 5_000_000_000L
      while (maxTasks < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(maxTasks >= 2,
        s"listing must fan out as a multi-task scan, saw $maxTasks tasks")
    } finally spark.sparkContext.removeSparkListener(listener)

    // point-filter on the distributed listing
    val one = spark.table("big.sys.objects")
      .where("kind = 'table' AND name = 't0777777'").collect()
    assert(one.length == 1 && one(0).getString(3) == "def/777777")
  }

  test("kind/namespace predicates prune the walk to a key-bounded subtree") {
    // a namespace-bounded listing must not read the whole tree: the
    // kind+namespace equality maps to one key interval, so the walk
    // touches one spine + matching leaves. 'ns' holds 1M tables, so a
    // 'namespace'-kind listing under bounds reads only a handful of
    // nodes — assert via row results AND that zero-match bounds plan
    // an empty scan.
    val df = spark.table("big.sys.objects")
      .where("kind = 'namespace' AND namespace = 'ns'")
    assert(df.count() == 1L)
    // unknown kind literal → provably-empty key range → zero partitions
    val none = spark.table("big.sys.objects").where("kind = 'function'")
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0L)
    // namespace-only predicate (three intervals: ns key + table/view
    // prefixes) still finds the namespace and all its tables
    val both = spark.table("big.sys.objects")
      .where("namespace = 'ns'").groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(both("namespace") == 1L && both("table") == 1000000L)
  }
}

object DistributedListingSpec {
  lazy val warehouse: String =
    Files.createTempDirectory("graft-bigcat").toString
}
