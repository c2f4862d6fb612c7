package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Per-table parquet writer tuning (`graft.parquet.*` properties):
  * bloom filters must be physically present in written data files
  * when requested, absent otherwise, and survive the MERGE rewrite
  * path — checked at the parquet footer level, not just "the query
  * still answers".
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-blwh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.bcat", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.bcat.warehouse", warehouse)
    .getOrCreate()

  /** Bloom-filter offsets for `col` across every row group of every
    * data parquet file under the table's data dir (delete objects and
    * eq-stage files excluded).
    */
  private def bloomOffsets(tbl: String, col: String): Seq[Long] = {
    val dataDir = new java.io.File(s"$warehouse/data/ns1/$tbl/files")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .toSeq.flatMap(walk)
      else Seq(f)
    val files = walk(dataDir)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.contains("eqdelete") && !f.getName.contains("delete"))
    assert(files.nonEmpty, s"no data files under $dataDir")
    files.toSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(new Path(f.toString), new Configuration())
      val r = ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == col)
          .getOrElse(fail(s"column $col missing in ${f.getName}"))
          .getBloomFilterOffset
      } finally r.close()
    }
  }

  test("bloom property produces bloom filters in every data file") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bcat.ns1")
    spark.sql("""CREATE TABLE bcat.ns1.bl (k BIGINT, v STRING)
                 TBLPROPERTIES (
                   'graft.parquet.bloom.filter.enabled#k' = 'true',
                   'graft.parquet.bloom.filter.expected.ndv#k' = '10000')""")
    spark.sql("INSERT INTO bcat.ns1.bl SELECT id, concat('v', id) FROM range(5000)")
    spark.sql("INSERT INTO bcat.ns1.bl SELECT id + 5000, concat('v', id) FROM range(5000)")
    val kOffsets = bloomOffsets("bl", "k")
    assert(kOffsets.nonEmpty && kOffsets.forall(_ >= 0),
      s"expected bloom filters on k, offsets: $kOffsets")
    // only the requested column carries one
    assert(bloomOffsets("bl", "v").forall(_ < 0))
    // and point lookups still answer exactly
    assert(spark.sql("SELECT v FROM bcat.ns1.bl WHERE k = 7777")
      .collect().map(_.getString(0)).sameElements(Array("v2777")))
  }

  test("no property, no bloom filters") {
    spark.sql("CREATE TABLE bcat.ns1.nb (k BIGINT)")
    spark.sql("INSERT INTO bcat.ns1.nb SELECT id FROM range(100)")
    assert(bloomOffsets("nb", "k").forall(_ < 0))
  }

  test("bloom filters survive the copy-on-write MERGE rewrite") {
    spark.sql("""CREATE TABLE bcat.ns1.bm (k BIGINT, v DOUBLE)
                 TBLPROPERTIES (
                   'graft.parquet.bloom.filter.enabled#k' = 'true')""")
    spark.sql("INSERT INTO bcat.ns1.bm SELECT id, id * 1.0 FROM range(1000)")
    spark.sql("""MERGE INTO bcat.ns1.bm t
                 USING (SELECT id AS k, id * 2.0 AS v FROM range(500)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v""")
    val offsets = bloomOffsets("bm", "k")
    assert(offsets.nonEmpty && offsets.forall(_ >= 0),
      s"rewritten files lost their bloom filters: $offsets")
    assert(spark.sql("SELECT sum(v) FROM bcat.ns1.bm").collect()(0).getDouble(0)
      == (0 until 500).map(_ * 2.0).sum + (500 until 1000).map(_ * 1.0).sum)
  }

  test("bloom filters survive compaction") {
    spark.sql("""CREATE TABLE bcat.ns1.bc (k BIGINT)
                 TBLPROPERTIES (
                   'graft.parquet.bloom.filter.enabled#k' = 'true')""")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO bcat.ns1.bc SELECT id + ${i * 1000} FROM range(500)"))
    val cat = spark.sessionState.catalogManager.catalog("bcat")
      .asInstanceOf[GraftCatalog]
    graft.maintain.Maintenance.compactDataFiles(spark, cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns1"), "bc"),
      targetFiles = 1)
    // every file currently on disk (the compacted output included)
    // still carries the filter
    val offsets = bloomOffsets("bc", "k")
    assert(offsets.nonEmpty && offsets.forall(_ >= 0),
      s"compacted files lost their bloom filters: $offsets")
    assert(spark.table("bcat.ns1.bc").count() == 1500)
  }

  test("rename-safe: bloom property names the logical column") {
    spark.sql("""CREATE TABLE bcat.ns1.br (a BIGINT, b STRING)""")
    spark.sql("INSERT INTO bcat.ns1.br SELECT id, 'x' FROM range(10)")
    spark.sql("ALTER TABLE bcat.ns1.br RENAME COLUMN a TO a2")
    spark.sql("""ALTER TABLE bcat.ns1.br SET TBLPROPERTIES (
                   'graft.parquet.bloom.filter.enabled#a2' = 'true')""")
    spark.sql("INSERT INTO bcat.ns1.br SELECT id + 10, 'y' FROM range(10)")
    // the data files store the PHYSICAL name `a`; at least the
    // post-property file must carry a bloom filter on it
    assert(bloomOffsets("br", "a").exists(_ >= 0))
    assert(spark.table("bcat.ns1.br").count() == 20)
  }
}
