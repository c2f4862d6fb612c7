package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Nested-field schema evolution (SURVEY §2.1; the recursion the
  * reference leaves TODO — IcebergToOlympia.java:196-201). ADD /
  * DROP / RENAME / COMMENT on struct fields at any depth are
  * metadata-only: files written before the change stay byte-
  * compatible (parquet schema clipping nulls missing nested fields;
  * renamed nested fields keep their physical on-file names and the
  * scan re-labels positionally).
  */
class NestedEvolutionSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-ne").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.ne", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ne.warehouse", warehouse)
    .getOrCreate()

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ne.ns")
    spark.sql("DROP TABLE IF EXISTS ne.ns.docs")
    spark.sql("""CREATE TABLE ne.ns.docs (
      id BIGINT, meta STRUCT<lang: STRING, n: BIGINT>)""")
    spark.sql("""INSERT INTO ne.ns.docs VALUES
      (1, named_struct('lang', 'en', 'n', 10L)),
      (2, named_struct('lang', 'de', 'n', 20L))""")
  }

  test("ADD nested field: old files read NULL, new files carry it") {
    setup()
    spark.sql("ALTER TABLE ne.ns.docs ADD COLUMN meta.source STRING")
    spark.sql("""INSERT INTO ne.ns.docs VALUES
      (3, named_struct('lang', 'fr', 'n', 30L, 'source', 'web'))""")
    val rows = spark.sql(
      "SELECT id, meta.source FROM ne.ns.docs ORDER BY id").collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, None, Some("web")))
  }

  test("RENAME nested field is metadata-only; mixed files read fine") {
    spark.sql("ALTER TABLE ne.ns.docs RENAME COLUMN meta.lang TO language")
    spark.sql("""INSERT INTO ne.ns.docs VALUES
      (4, named_struct('language', 'es', 'n', 40L, 'source', 'pdf'))""")
    val langs = spark.sql(
      "SELECT meta.language FROM ne.ns.docs ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en", "de", "fr", "es"))
    // every data file on disk carries the PHYSICAL nested name
    val dataFiles = scala.jdk.javaapi.CollectionConverters.asScala(
      Files.walk(java.nio.file.Paths.get(warehouse)).iterator())
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
    val nestedNames = dataFiles.map { f =>
      spark.read.parquet(f).schema("meta").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    }
    assert(nestedNames.forall(s => s.contains("lang") && !s.contains("language")),
      s"files must keep physical nested names, saw $nestedNames")
  }

  test("filter and aggregate on the renamed nested field") {
    val n = spark.sql(
      "SELECT sum(meta.n) AS s FROM ne.ns.docs WHERE meta.language >= 'en'")
      .collect()(0).getLong(0)
    assert(n == 10L + 30L + 40L) // en, fr, es (de < en)
  }

  test("DROP nested field: stops being visible, old files still read") {
    spark.sql("ALTER TABLE ne.ns.docs DROP COLUMN meta.source")
    val fields = spark.table("ne.ns.docs").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(fields == Set("language", "n"))
    assert(spark.sql("SELECT meta.n FROM ne.ns.docs").collect().length == 4)
  }

  test("re-ADD after DROP under the SAME name must not resurrect old data") {
    // old files physically contain `source` values ('web', 'pdf');
    // the re-added logical `source` gets a fresh physical name, so
    // every row reads NULL (the field-ID problem of name mapping)
    spark.sql("ALTER TABLE ne.ns.docs ADD COLUMN meta.source STRING")
    val vals = spark.sql("SELECT meta.source FROM ne.ns.docs").collect()
    assert(vals.forall(_.isNullAt(0)),
      s"dropped data resurrected: ${vals.mkString(",")}")
    // and the fresh field is writable + readable going forward
    spark.sql("""INSERT INTO ne.ns.docs VALUES
      (5, named_struct('language', 'it', 'n', 50L, 'source', 'ocr'))""")
    val r = spark.sql(
      "SELECT meta.source FROM ne.ns.docs WHERE id = 5").collect()(0)
    assert(r.getString(0) == "ocr")
  }

  test("rename collision inside the struct is refused") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ne.ns.docs RENAME COLUMN meta.n TO language")
    }
    assert(e.getMessage.contains("already exists") ||
      e.getMessage.contains("FIELD_ALREADY_EXISTS"))
  }

  test("UPDATE and MERGE work across nested evolution") {
    spark.sql("UPDATE ne.ns.docs SET meta = named_struct(" +
      "'language', meta.language, 'n', meta.n + 100L, 'source', 'u') " +
      "WHERE id = 1")
    val r = spark.sql("SELECT meta.n, meta.source FROM ne.ns.docs WHERE id = 1")
      .collect()(0)
    assert(r.getLong(0) == 110L && r.getString(1) == "u")
  }

  test("evolution inside ARRAY<STRUCT> elements") {
    spark.sql("DROP TABLE IF EXISTS ne.ns.arr")
    spark.sql("""CREATE TABLE ne.ns.arr (
      id BIGINT, items ARRAY<STRUCT<sku: STRING, qty: BIGINT>>)""")
    spark.sql("""INSERT INTO ne.ns.arr VALUES
      (1, array(named_struct('sku', 'a', 'qty', 2L)))""")
    spark.sql("ALTER TABLE ne.ns.arr ADD COLUMN items.element.price DOUBLE")
    spark.sql("""INSERT INTO ne.ns.arr VALUES
      (2, array(named_struct('sku', 'b', 'qty', 1L, 'price', 9.5D)))""")
    val rows = spark.sql(
      "SELECT id, items[0].price FROM ne.ns.arr ORDER BY id").collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) == 9.5)
    spark.sql("ALTER TABLE ne.ns.arr RENAME COLUMN items.element.qty TO quantity")
    val q = spark.sql("SELECT sum(i.quantity) FROM ne.ns.arr " +
      "LATERAL VIEW explode(items) AS i").collect()(0).getLong(0)
    assert(q == 3L)
  }

  test("deep nesting: struct inside struct") {
    spark.sql("DROP TABLE IF EXISTS ne.ns.deep")
    spark.sql("""CREATE TABLE ne.ns.deep (
      id BIGINT, a STRUCT<b: STRUCT<c: BIGINT>>)""")
    spark.sql("INSERT INTO ne.ns.deep VALUES " +
      "(1, named_struct('b', named_struct('c', 7L)))")
    spark.sql("ALTER TABLE ne.ns.deep RENAME COLUMN a.b.c TO c2")
    spark.sql("INSERT INTO ne.ns.deep VALUES " +
      "(2, named_struct('b', named_struct('c2', 8L)))")
    assert(spark.sql("SELECT sum(a.b.c2) FROM ne.ns.deep")
      .collect()(0).getLong(0) == 15L)
  }
}
