package graft.objects

import java.nio.file.Files

import graft.catalog.Graft
import graft.storage.LocalStorageOps
import graft.txn.CommitFailedException
import org.scalatest.funsuite.AnyFunSuite

/** Referenced-object derivation from view SQL (the reference requires
  * at least one referenced object per view —
  * OlympiaToIceberg.java:55 — and keeps the list for invalidation)
  * plus the SERIALIZABLE consequence: creating a view over a table
  * conflicts with a concurrent drop of that table.
  */
class ViewRefsSpec extends AnyFunSuite {

  test("single relation") {
    assert(ViewRefs.referencedNames("SELECT * FROM t1") == Seq("t1"))
  }

  test("qualified and multi-relation joins, deduplicated") {
    val names = ViewRefs.referencedNames(
      "SELECT a.x FROM ns1.t1 a JOIN cat.ns2.t2 b ON a.k = b.k " +
        "JOIN ns1.t1 c ON a.k = c.k")
    assert(names == Seq("ns1.t1", "cat.ns2.t2"))
  }

  test("CTE names are definitions, not references") {
    val names = ViewRefs.referencedNames(
      "WITH c AS (SELECT * FROM base) SELECT * FROM c JOIN other USING (k)")
    assert(names.toSet == Set("base", "other"))
  }

  test("CTE exclusion is case-insensitive") {
    val names = ViewRefs.referencedNames(
      "WITH Cte1 AS (SELECT * FROM base) SELECT * FROM CTE1")
    assert(names == Seq("base"))
  }

  test("WITH nested inside a CTE body") {
    val names = ViewRefs.referencedNames(
      "WITH outer1 AS (WITH inner1 AS (SELECT * FROM deep) " +
        "SELECT * FROM inner1 JOIN mid USING (k)) SELECT * FROM outer1")
    assert(names.toSet == Set("deep", "mid"))
  }

  test("subqueries are walked: scalar, IN, EXISTS") {
    val names = ViewRefs.referencedNames(
      "SELECT (SELECT max(v) FROM s1) m FROM t WHERE k IN " +
        "(SELECT k FROM s2) AND EXISTS (SELECT 1 FROM s3 WHERE s3.k = t.k)")
    assert(names.toSet == Set("t", "s1", "s2", "s3"))
  }

  test("set operations") {
    val names = ViewRefs.referencedNames(
      "SELECT * FROM a UNION ALL SELECT * FROM b EXCEPT SELECT * FROM c")
    assert(names.toSet == Set("a", "b", "c"))
  }

  test("unparseable SQL yields an empty list, not a failure") {
    assert(ViewRefs.referencedNames("SELECT TOP 3 * FROM [t]").isEmpty ||
      ViewRefs.referencedNames("THIS IS NOT SQL").isEmpty)
  }

  test("localTableCoordinates resolves 1/2/3-part names") {
    val coords = ViewRefs.localTableCoordinates(
      Seq("t1", "ns2.t2", "cat.ns3.t3", "other.ns4.t4", "a.b.c.d"),
      viewNamespace = "ns1", currentCatalog = Some("cat"))
    assert(coords == Seq(("ns1", "t1"), ("ns2", "t2"), ("ns3", "t3")))
  }

  test("REST CreateViewRequest derives refs without a live session") {
    val body = Json.mapper.readTree(
      """{"name":"v1","schema":{"type":"struct","fields":[]},
         "view-version":{"version-id":1,"schema-id":0,"representations":
           [{"type":"sql","sql":"SELECT * FROM ns1.t1 JOIN t2 USING (k)",
             "dialect":"spark"}]}}""")
    val vd = graft.serve.IcebergViews.fromCreateRequest("ns1", body)
    assert(vd.referencedObjectNames.toSet == Set("ns1.t1", "t2"))
  }

  test("SERIALIZABLE: view create conflicts with concurrent drop of a referenced table") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-viewrefs").toString)
    Graft.createCatalog(s, CatalogDef())
    val setup = Graft.beginTransaction(s)
    Graft.createNamespace(s, setup, NamespaceDef("ns1"))
    Graft.createTable(s, setup, TableDef("t1", "ns1", metadataLocation = "m1"))
    Graft.commitTransaction(s, setup)

    val creator = Graft.beginTransaction(s,
      Some(IsolationLevel.Serializable))
    Graft.createView(s, creator, ViewDef("v1", "ns1",
      sqlText = "SELECT * FROM ns1.t1",
      schemaJson = "{\"type\":\"struct\",\"fields\":[]}",
      referencedObjectNames = ViewRefs.referencedNames("SELECT * FROM ns1.t1")))

    // another session drops the referenced table and wins the race
    val dropper = Graft.beginTransaction(s)
    Graft.dropTable(s, dropper, "ns1", "t1")
    Graft.commitTransaction(s, dropper)

    intercept[CommitFailedException] {
      Graft.commitTransaction(s, creator)
    }
  }

  test("SNAPSHOT: the same race commits (reads constrain nothing)") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-viewrefs2").toString)
    Graft.createCatalog(s, CatalogDef())
    val setup = Graft.beginTransaction(s)
    Graft.createNamespace(s, setup, NamespaceDef("ns1"))
    Graft.createTable(s, setup, TableDef("t1", "ns1", metadataLocation = "m1"))
    Graft.commitTransaction(s, setup)

    val creator = Graft.beginTransaction(s)
    Graft.createView(s, creator, ViewDef("v1", "ns1",
      sqlText = "SELECT * FROM ns1.t1",
      schemaJson = "{\"type\":\"struct\",\"fields\":[]}",
      referencedObjectNames = Seq("ns1.t1")))

    val dropper = Graft.beginTransaction(s)
    Graft.dropTable(s, dropper, "ns1", "t1")
    Graft.commitTransaction(s, dropper)

    Graft.commitTransaction(s, creator)
    val check = Graft.beginTransaction(s)
    assert(Graft.viewExists(s, check, "ns1", "v1"))
  }
}
