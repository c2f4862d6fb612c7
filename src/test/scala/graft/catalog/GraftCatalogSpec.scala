package graft.catalog

import java.nio.file.Files

import graft.objects._
import graft.storage.{DirectoryObjectStoreClient, InMemoryObjectStoreClient, LocalStorageOps, ObjectStoreOps, StorageOps}
import graft.tree.TreeOps
import graft.txn.CommitFailedException
import org.scalatest.funsuite.AnyFunSuite

/** Catalog semantics — port of the reference's abstract suite
  * (core/src/test/java/org/format/olympia/OlympiaTests.java:34-396)
  * bound to local storage, with the FIXTURES.md §1 fixtures, plus
  * commit-race conflict tests (FIXTURES.md §3).
  */
abstract class GraftCatalogContract extends AnyFunSuite {

  /** A fresh, empty storage backend for one test. */
  protected def freshStorage(): StorageOps

  /** A second handle over the SAME underlying store — "another
    * process" in the cross-process tests.
    */
  protected def reopen(s: StorageOps): StorageOps

  private def fresh(): StorageOps = {
    val s = freshStorage()
    Graft.createCatalog(s, CatalogDef())
    s
  }

  private def commitVersion(s: StorageOps): Long =
    TreeOps.findLatestRoot(s).get.version

  test("createCatalog writes v0; catalogExists") {
    val s = fresh()
    assert(Graft.catalogExists(s))
    assert(commitVersion(s) == 0L)
  }

  test("create/describe/list namespace; version advances per commit") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1", Map("k1" -> "v1")))
    Graft.commitTransaction(s, t1)
    assert(commitVersion(s) == 1L)

    val t2 = Graft.beginTransaction(s)
    assert(Graft.namespaceExists(s, t2, "ns1"))
    assert(!Graft.namespaceExists(s, t2, "nope"))
    assert(Graft.describeNamespace(s, t2, "ns1").properties == Map("k1" -> "v1"))
    assert(Graft.showNamespaces(s, t2) == Seq("ns1"))
  }

  test("duplicate namespace create fails") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t1)
    val t2 = Graft.beginTransaction(s)
    intercept[IllegalArgumentException] {
      Graft.createNamespace(s, t2, NamespaceDef("ns1"))
    }
  }

  test("alter namespace properties") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1", Map("k1" -> "v1")))
    Graft.commitTransaction(s, t1)
    val t2 = Graft.beginTransaction(s)
    Graft.alterNamespace(s, t2, NamespaceDef("ns1", Map("k1" -> "v2", "k2" -> "x")))
    Graft.commitTransaction(s, t2)
    val t3 = Graft.beginTransaction(s)
    assert(Graft.describeNamespace(s, t3, "ns1").properties("k1") == "v2")
  }

  test("table create/describe/show/drop within namespace") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.createTable(s, t1,
      TableDef("tbl1", "ns1", metadataLocation = "m1", properties = Map("k1" -> "v1")))
    Graft.createTable(s, t1,
      TableDef("tbl2", "ns1", metadataLocation = "m2", properties = Map("k2" -> "v2")))
    Graft.commitTransaction(s, t1)

    val t2 = Graft.beginTransaction(s)
    assert(Graft.showTables(s, t2, "ns1").sorted == Seq("tbl1", "tbl2"))
    assert(Graft.tableExists(s, t2, "ns1", "tbl1"))
    assert(Graft.describeTable(s, t2, "ns1", "tbl2").metadataLocation == "m2")
    Graft.dropTable(s, t2, "ns1", "tbl1")
    Graft.commitTransaction(s, t2)

    val t3 = Graft.beginTransaction(s)
    assert(Graft.showTables(s, t3, "ns1") == Seq("tbl2"))
    assert(!Graft.tableExists(s, t3, "ns1", "tbl1"))
  }

  test("create table in missing namespace fails") {
    val s = fresh()
    val t = Graft.beginTransaction(s)
    intercept[IllegalArgumentException] {
      Graft.createTable(s, t, TableDef("t", "missing", metadataLocation = "m"))
    }
  }

  test("drop namespace RESTRICT fails when non-empty; CASCADE drops tables AND views") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.createTable(s, t1, TableDef("tbl1", "ns1", metadataLocation = "m"))
    Graft.createView(s, t1, ViewDef("view1", "ns1", sqlText = "SELECT 1",
      schemaJson = "{}", referencedObjectNames = Seq("ns1.tbl1")))
    Graft.commitTransaction(s, t1)

    val t2 = Graft.beginTransaction(s)
    intercept[IllegalArgumentException] {
      Graft.dropNamespace(s, t2, "ns1", cascade = false)
    }
    val t3 = Graft.beginTransaction(s)
    Graft.dropNamespace(s, t3, "ns1", cascade = true)
    Graft.commitTransaction(s, t3)

    val t4 = Graft.beginTransaction(s)
    assert(Graft.showNamespaces(s, t4).isEmpty)
    assert(!Graft.tableExists(s, t4, "ns1", "tbl1"))
    assert(!Graft.viewExists(s, t4, "ns1", "view1"))
  }

  test("view create/replace/drop; schema binding fields round-trip") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.createView(s, t1, ViewDef("view1", "ns1", sqlText = "SELECT 1 AS x",
      schemaJson = "{\"x\":\"int\"}", properties = Map("k1" -> "v1")))
    Graft.commitTransaction(s, t1)

    val t2 = Graft.beginTransaction(s)
    assert(Graft.showViews(s, t2, "ns1") == Seq("view1"))
    assert(Graft.describeView(s, t2, "ns1", "view1").sqlText == "SELECT 1 AS x")
    Graft.createView(s, t2, ViewDef("view1", "ns1", sqlText = "SELECT 2 AS x",
      schemaJson = "{}"), replace = true)
    Graft.commitTransaction(s, t2)

    val t3 = Graft.beginTransaction(s)
    assert(Graft.describeView(s, t3, "ns1", "view1").sqlText == "SELECT 2 AS x")
    Graft.dropView(s, t3, "ns1", "view1")
    Graft.commitTransaction(s, t3)
    val t4 = Graft.beginTransaction(s)
    assert(Graft.showViews(s, t4, "ns1").isEmpty)
  }

  test("rename table keeps def, moves key (reference left this TODO)") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.createTable(s, t1, TableDef("told", "ns1", metadataLocation = "m9"))
    Graft.commitTransaction(s, t1)
    val t2 = Graft.beginTransaction(s)
    Graft.renameTable(s, t2, "ns1", "told", "tnew")
    Graft.commitTransaction(s, t2)
    val t3 = Graft.beginTransaction(s)
    assert(!Graft.tableExists(s, t3, "ns1", "told"))
    assert(Graft.describeTable(s, t3, "ns1", "tnew").metadataLocation == "m9")
  }

  test("multi-object txn is atomic: reader sees all or nothing") {
    val s = fresh()
    val t1 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t1, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t1)

    val writer = Graft.beginTransaction(s)
    Graft.createTable(s, writer, TableDef("a", "ns1", metadataLocation = "ma"))
    Graft.createTable(s, writer, TableDef("b", "ns1", metadataLocation = "mb"))
    // concurrent reader before commit sees neither
    val reader = Graft.beginTransaction(s)
    assert(Graft.showTables(s, reader, "ns1").isEmpty)
    Graft.commitTransaction(s, writer)
    // reader's snapshot still sees neither (snapshot isolation)
    assert(Graft.showTables(s, reader, "ns1").isEmpty)
    // a new txn sees both
    val after = Graft.beginTransaction(s)
    assert(Graft.showTables(s, after, "ns1").sorted == Seq("a", "b"))
  }

  test("commit race: disjoint keys rebase automatically") {
    val s = fresh()
    val t0 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t0, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t0)

    val a = Graft.beginTransaction(s)
    val b = Graft.beginTransaction(s)
    Graft.createTable(s, a, TableDef("ta", "ns1", metadataLocation = "ma"))
    Graft.createTable(s, b, TableDef("tb", "ns1", metadataLocation = "mb"))
    Graft.commitTransaction(s, a) // wins v2
    Graft.commitTransaction(s, b) // loses race, rebases onto v2 → v3
    assert(commitVersion(s) == 3L)
    val t = Graft.beginTransaction(s)
    assert(Graft.showTables(s, t, "ns1").sorted == Seq("ta", "tb"))
  }

  test("commit race: same-key create/create aborts") {
    val s = fresh()
    val t0 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t0, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t0)

    val a = Graft.beginTransaction(s)
    val b = Graft.beginTransaction(s)
    Graft.createTable(s, a, TableDef("t", "ns1", metadataLocation = "ma"))
    Graft.createTable(s, b, TableDef("t", "ns1", metadataLocation = "mb"))
    Graft.commitTransaction(s, a)
    intercept[CommitFailedException] { Graft.commitTransaction(s, b) }
  }

  test("SERIALIZABLE: pending read vs committed write conflicts; SNAPSHOT does not") {
    val s = fresh()
    val t0 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t0, NamespaceDef("ns1"))
    Graft.createTable(s, t0, TableDef("t", "ns1", metadataLocation = "m0"))
    Graft.commitTransaction(s, t0)

    // SERIALIZABLE reader-writer: reads t, writes elsewhere; a racer
    // alters t first → abort
    val ser = Graft.beginTransaction(s, Some(IsolationLevel.Serializable))
    Graft.describeTable(s, ser, "ns1", "t")
    Graft.createTable(s, ser, TableDef("other", "ns1", metadataLocation = "mo"))
    val racer = Graft.beginTransaction(s)
    Graft.alterTable(s, racer, TableDef("t", "ns1", metadataLocation = "m1"))
    Graft.commitTransaction(s, racer)
    intercept[CommitFailedException] { Graft.commitTransaction(s, ser) }

    // same shape under SNAPSHOT succeeds
    val snap = Graft.beginTransaction(s)
    Graft.describeTable(s, snap, "ns1", "t")
    Graft.createTable(s, snap, TableDef("other2", "ns1", metadataLocation = "mo2"))
    val racer2 = Graft.beginTransaction(s)
    Graft.alterTable(s, racer2, TableDef("t", "ns1", metadataLocation = "m2"))
    Graft.commitTransaction(s, racer2)
    Graft.commitTransaction(s, snap)
    assert(commitVersion(s) == 4L) // v1 ns, v2 racer, v3 racer2, v4 snap
  }

  test("distributed txn: suspend in one 'process', resume and commit in another") {
    val s = fresh()
    val t0 = Graft.beginTransaction(s)
    Graft.createNamespace(s, t0, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t0)

    val txn = Graft.beginTransaction(s)
    Graft.createTable(s, txn, TableDef("t", "ns1", metadataLocation = "m"))
    Graft.saveDistTransaction(s, txn)
    val id = txn.id
    assert(Graft.distTransactionExists(s, id))

    // "another process": fresh storage handle + reload
    val s2 = reopen(s)
    val resumed = Graft.loadDistTransaction(s2, id)
    assert(resumed.actions.nonEmpty)
    Graft.commitTransaction(s2, resumed)
    val t = Graft.beginTransaction(s2)
    assert(Graft.tableExists(s2, t, "ns1", "t"))
  }

  test("catalog time travel + rollback (roll-forward)") {
    val s = fresh()
    for (i <- 1 to 3) {
      val t = Graft.beginTransaction(s)
      Graft.createNamespace(s, t, NamespaceDef(s"ns$i"))
      Graft.commitTransaction(s, t)
    }
    val latest = TreeOps.findLatestRoot(s).get
    assert(latest.version == 3L)
    val v1 = TreeOps.findRootForVersion(s, latest, 1L)
    assert(TreeOps.traverse(s, v1).size == 1)

    Graft.rollbackTo(s, 1L)
    val after = TreeOps.findLatestRoot(s).get
    assert(after.version == 4L) // roll-forward: new version, old content
    val t = Graft.beginTransaction(s)
    assert(Graft.showNamespaces(s, t) == Seq("ns1"))
  }
}

/** The catalog contract over the local filesystem backend. */
class GraftCatalogSpec extends GraftCatalogContract {
  override protected def freshStorage(): StorageOps =
    new LocalStorageOps(Files.createTempDirectory("graft-cat").toString)
  override protected def reopen(s: StorageOps): StorageOps =
    new LocalStorageOps(s.root)
}

/** The same contract over object-store semantics: every catalog
  * mutation reduces to conditional PUT / GET / LIST — no renames, no
  * directories. A reopened handle shares the store but not the read
  * cache, like a second process against one bucket.
  */
class ObjectStoreGraftCatalogSpec extends GraftCatalogContract {
  override protected def freshStorage(): StorageOps =
    new ObjectStoreOps(new InMemoryObjectStoreClient)
  override protected def reopen(s: StorageOps): StorageOps =
    new ObjectStoreOps(s.asInstanceOf[ObjectStoreOps].client)
}

/** And over the on-disk object-store fake (the backend the Spark
  * integration suites use, where parquet jobs need real paths).
  */
class DirectoryObjectStoreGraftCatalogSpec extends GraftCatalogContract {
  override protected def freshStorage(): StorageOps =
    new ObjectStoreOps(new DirectoryObjectStoreClient(
      Files.createTempDirectory("graft-cat-os").toString))
  override protected def reopen(s: StorageOps): StorageOps =
    new ObjectStoreOps(s.asInstanceOf[ObjectStoreOps].client)
}
