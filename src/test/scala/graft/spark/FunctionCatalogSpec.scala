package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog V2 functions: partition transforms and text primitives
  * resolve under `cat.system` for plain SQL, and the transform
  * functions agree EXACTLY with the write path's derived columns (one
  * definition site).
  */
class FunctionCatalogSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-fn").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.fc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.fc.warehouse", warehouse)
    .getOrCreate()

  test("text functions answer from SQL") {
    assert(spark.sql("SELECT fc.system.token_count('  a b  c ')")
      .head.getInt(0) == 3)
    val h1 = spark.sql("SELECT fc.system.simhash64('the quick brown fox')")
      .head.getLong(0)
    val h2 = spark.sql("SELECT fc.system.simhash64('the quick brown fox')")
      .head.getLong(0)
    assert(h1 == h2, "deterministic")
    assert(spark.sql("SELECT fc.system.simhash64('entirely different words')")
      .head.getLong(0) != h1)
    assert(spark.sql("SELECT fc.system.fingerprint64(NULL)").head.isNullAt(0))
  }

  test("transform functions match the Catalyst write-path expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val f = PartitionField(PartitionTransforms.Bucket, "k", 16)
    val viaSql = spark.sql("SELECT fc.system.bucket(16, CAST(42 AS BIGINT))")
      .head.getInt(0)
    val viaExpr = f.applyToLiteral(Literal(42L)).get.value
    assert(viaSql == viaExpr, "bucket: SQL function vs write-path expr")

    val d = PartitionField(PartitionTransforms.Days, "ts")
    val viaSqlDays = spark.sql(
      "SELECT fc.system.days(timestamp'2024-03-05 11:30:00')").head.getInt(0)
    val micros = java.time.Instant.parse("2024-03-05T11:30:00Z")
      .getEpochSecond * 1000000L
    val viaExprDays = d.applyToLiteral(
      Literal(micros, org.apache.spark.sql.types.TimestampType)).get.value
    assert(viaSqlDays == viaExprDays, "days: SQL function vs write-path expr")

    assert(spark.sql("SELECT fc.system.truncate(2, 'de-DE')")
      .head.getString(0) == "de")
  }

  test("SHOW FUNCTIONS lists the catalog surface") {
    val fns = spark.sql("SHOW FUNCTIONS IN fc.system")
      .collect().map(_.getString(0)).toSet
    assert(Seq("bucket", "days", "token_count", "simhash64")
      .forall(f => fns.exists(_.endsWith(f))), s"got $fns")
  }
}
