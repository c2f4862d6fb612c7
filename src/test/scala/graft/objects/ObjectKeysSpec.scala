package graft.objects

import org.scalatest.funsuite.AnyFunSuite

/** Port of reference TestObjectKeys.java (103 LoC) and
  * TestFileLocations.java (149 LoC) semantics.
  */
class ObjectKeysSpec extends AnyFunSuite {
  private val cd = CatalogDef()

  test("namespace key: prefix + space padding to max size") {
    val k = ObjectKeys.namespaceKey("ns1", cd)
    assert(k.startsWith("B==="))
    assert(k.length == 4 + cd.namespaceNameMaxBytes)
    assert(k == "B===" + "ns1" + " " * 97)
    assert(ObjectKeys.namespaceNameFromKey(k) == "ns1")
  }

  test("table key: prefix + padded ns + padded table; listing prefix") {
    val k = ObjectKeys.tableKey("ns1", "tbl1", cd)
    assert(k.length == 4 + 100 + 100)
    assert(k.startsWith(ObjectKeys.tableKeyNamespacePrefix("ns1", cd)))
    assert(ObjectKeys.tableNameFromKey(k, cd) == ("ns1", "tbl1"))
    // lexicographic order == hierarchy order
    val k2 = ObjectKeys.tableKey("ns1", "tbl2", cd)
    val other = ObjectKeys.tableKey("ns2", "aaa", cd)
    assert(k < k2 && k2 < other)
  }

  test("view keys sort after table keys after namespace keys") {
    assert(ObjectKeys.namespaceKey("z", cd) < ObjectKeys.tableKey("a", "a", cd))
    assert(ObjectKeys.tableKey("z", "z", cd) < ObjectKeys.viewKey("a", "a", cd))
  }

  test("name validation: empty, oversized, forbidden chars") {
    intercept[IllegalArgumentException](ObjectKeys.namespaceKey("", cd))
    intercept[IllegalArgumentException](ObjectKeys.namespaceKey("a" * 101, cd))
    intercept[IllegalArgumentException](ObjectKeys.namespaceKey("a b", cd))
    intercept[IllegalArgumentException](ObjectKeys.namespaceKey("a/b", cd))
  }

  test("root node path: 64-bit reversed binary (docs/format.md:194)") {
    // v=100 → binary ...001100100 reversed → starts 00100110
    val p100 = FileLocations.rootNodePath(100L)
    assert(p100 == "vn/" + "00100110" + "0" * 56)
    assert(FileLocations.rootNodePath(0L) == "vn/" + "0" * 64)
    assert(FileLocations.rootNodePath(1L) == "vn/1" + "0" * 63)
    // consecutive versions spread lexicographically
    assert(FileLocations.rootNodePath(2L) != FileLocations.rootNodePath(3L))
  }

  test("def paths carry object names and unique ids") {
    val p1 = FileLocations.newTableDefPath("ns1", "t1")
    val p2 = FileLocations.newTableDefPath("ns1", "t1")
    assert(p1.startsWith("def/table/") && p1.endsWith("-ns1-t1.json"))
    assert(p1 != p2)
  }

  test("json def round-trips") {
    val td = TableDef("t", "ns", metadataLocation = "m",
      previousMetadataLocation = Some("p"), properties = Map("a" -> "b"))
    val back = Json.read(Json.write(td), classOf[TableDef])
    assert(back == td)
    val vd = ViewDef("v", "ns", sqlText = "SELECT 1", schemaJson = "{}",
      referencedObjectNames = Seq("ns.t"))
    assert(Json.read(Json.write(vd), classOf[ViewDef]) == vd)
    val cdef = CatalogDef(order = 64, properties = Map("x" -> "y"))
    assert(Json.read(Json.write(cdef), classOf[CatalogDef]) == cdef)
  }
}
