package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Served Iceberg field ids must stay STABLE across schema evolution:
  * drops retire ids (later fields are NOT renumbered), renames keep
  * their id, adds allocate past the high-water mark, and a
  * drop-then-re-add gets a FRESH id (it is a new field — old data must
  * not resurrect under the old id).
  */
class IcebergFieldIdsSpec extends AnyFunSuite {

  private def ids(schema: StructType, props: Map[String, String])
      : Map[String, Int] = IcebergFieldIds.assign(schema, props)._1

  test("positional walk matches the pre-order id contract") {
    val s = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StructType(Seq(
        StructField("x", StringType), StructField("y", IntegerType)))),
      StructField("c", ArrayType(StructType(Seq(
        StructField("e", DoubleType)))))))
    // siblings first (a=1, b=2, c=3), then b's children (x=4, y=5),
    // then c's element id (6) and the element's field (e=7)
    assert(IcebergFieldIds.paths(s) ==
      Seq("a", "b", "c", "b.x", "b.y", "c.element", "c.element.e"))
    val m = ids(s, Map.empty)
    assert(m == Map("a" -> 1, "b" -> 2, "c" -> 3, "b.x" -> 4, "b.y" -> 5,
      "c.element" -> 6, "c.element.e" -> 7))
  }

  test("drop retires the id; survivors keep theirs; add allocates fresh") {
    val s0 = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", DoubleType)))
    val props1 = IcebergFieldIds.seed(s0, Map.empty)
    // drop b
    val s1 = StructType(Seq(StructField("a", LongType),
      StructField("c", DoubleType)))
    val props2 = IcebergFieldIds.persist(s1, props1)
    assert(ids(s1, props2) == Map("a" -> 1, "c" -> 3)) // c NOT renumbered
    // add d: takes 4 (past the high-water mark), not b's retired 2
    val s2 = StructType(Seq(StructField("a", LongType),
      StructField("c", DoubleType), StructField("d", IntegerType)))
    val props3 = IcebergFieldIds.persist(s2, props2)
    assert(ids(s2, props3) == Map("a" -> 1, "c" -> 3, "d" -> 4))
  }

  test("SQL evolution end-to-end: served ids survive drop + rename") {
    val warehouse = Files.createTempDirectory("graft-fid").toString
    val spark: SparkSession = graft.Verify.sessionBuilder("4")
      .config("spark.sql.catalog.fid", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.fid.warehouse", warehouse)
      .getOrCreate()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fid.ns")
    spark.sql("CREATE TABLE fid.ns.t (a BIGINT, b STRING, c DOUBLE, d INT)")
    val storage = spark.sessionState.catalogManager.catalog("fid")
      .asInstanceOf[GraftCatalog].storage
    def servedIds(): Map[String, Int] = {
      val txn = graft.catalog.Graft.beginTransaction(storage)
      try {
        val td = graft.catalog.Graft.describeTable(storage, txn, "ns", "t")
        val meta = graft.format.TableMetadata.read(storage, td.metadataLocation)
        val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
        val (node, _) = graft.serve.IcebergRest.toIcebergSchema(
          schema, td.properties)
        val it = node.get("fields").elements()
        val out = Map.newBuilder[String, Int]
        while (it.hasNext) {
          val f = it.next(); out += (f.get("name").asText() -> f.get("id").asInt())
        }
        out.result()
      } finally txn.close()
    }
    assert(servedIds() == Map("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4))
    spark.sql("ALTER TABLE fid.ns.t DROP COLUMN b")
    assert(servedIds() == Map("a" -> 1, "c" -> 3, "d" -> 4),
      "drop must not renumber later fields")
    spark.sql("ALTER TABLE fid.ns.t RENAME COLUMN c TO c2")
    assert(servedIds() == Map("a" -> 1, "c2" -> 3, "d" -> 4),
      "rename must keep its id")
    spark.sql("ALTER TABLE fid.ns.t ADD COLUMN e STRING")
    assert(servedIds() == Map("a" -> 1, "c2" -> 3, "d" -> 4, "e" -> 5))
    // re-adding a dropped name is a NEW field: fresh id, not b's 2
    spark.sql("ALTER TABLE fid.ns.t ADD COLUMN b STRING")
    assert(servedIds() == Map("a" -> 1, "c2" -> 3, "d" -> 4, "e" -> 5,
      "b" -> 6))
  }
}
