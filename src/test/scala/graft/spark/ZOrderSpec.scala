package graft.spark

import java.nio.file.Files

import graft.functions.ZOrderKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order rewrite: after `compact_table(..., sort_by =>
  * 'zorder(a,b)')` a selective filter on EITHER column prunes most
  * files from snapshot stats — the multi-dimensional layout a fact
  * table needs when queries filter sometimes by one key, sometimes by
  * the other.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-zo").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.zo", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.zo.warehouse", warehouse)
    .getOrCreate()

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def files(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        files(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        files(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.flatten.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString)
          case k: org.apache.spark.sql.graft.KeyedFilePartition =>
            k.inner.files.map(_.filePath.toString)
          case _ => Seq.empty
        }
      case other => other.children.flatMap(files)
    }
    files(df.queryExecution.executedPlan).distinct.length.toLong
  }

  // ---- normalization order properties ----

  private def word(v: Any, t: DataType): Long = ZOrderKey.normalize(v, t)
  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  test("normalization preserves order for longs, doubles, strings") {
    assert(unsignedLt(word(-5L, LongType), word(3L, LongType)))
    assert(unsignedLt(word(Long.MinValue, LongType), word(Long.MaxValue, LongType)))
    assert(unsignedLt(word(-1.5d, DoubleType), word(-0.25d, DoubleType)))
    assert(unsignedLt(word(-0.25d, DoubleType), word(0.0d, DoubleType)))
    assert(unsignedLt(word(0.0d, DoubleType), word(1e300d, DoubleType)))
    import org.apache.spark.unsafe.types.UTF8String
    assert(unsignedLt(word(UTF8String.fromString("apple"), StringType),
      word(UTF8String.fromString("banana"), StringType)))
  }

  test("interleaved key sorts first by joint locality, not one column") {
    // (0,0) < (1,1) in z-order; (0, big) interleaves ABOVE (1, small)'s
    // prefix region — verify basic Morton behavior: sorting the four
    // quadrant corners groups quadrants, not raw first-column order
    val rows = Seq((0L, 0L), (0L, 1L << 40), (1L << 40, 0L), (1L << 40, 1L << 40))
    val keys = rows.map { case (a, b) =>
      val e = ZOrderKey(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b)))
      (a, b, e.eval(null).asInstanceOf[Array[Byte]].toSeq)
    }
    implicit val ord: Ordering[Seq[Byte]] =
      Ordering.by(_.map(b => (b & 0xff).toByte).toIterable.map(b => b & 0xff).toSeq
        .foldLeft("")((s, i) => s + f"$i%02x"))
    val sorted = keys.sortBy(_._3.map(b => f"${b & 0xff}%02x").mkString)
    assert(sorted.head._1 == 0L && sorted.head._2 == 0L)
    assert(sorted.last._1 == (1L << 40) && sorted.last._2 == (1L << 40))
  }

  test("z-ordered rewrite prunes on both dimensions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS zo.ns")
    spark.sql("DROP TABLE IF EXISTS zo.ns.t")
    spark.sql("CREATE TABLE zo.ns.t (a BIGINT, b BIGINT, v DOUBLE)")
    // two independent uniform keys; interleaved appends leave every
    // file spanning both full ranges
    (0 until 4).foreach { m =>
      spark.sql(s"""INSERT INTO zo.ns.t
        SELECT id * 37 % 4096 AS a, id * 91 % 4096 AS b, id * 1.0 AS v
        FROM range($m, 16384, 4, 2)""")
    }
    val before = spark.sql("SELECT sum(v) FROM zo.ns.t").head.getDouble(0)
    spark.sql(
      "CALL zo.system.compact_table('ns', 't', 16, 'zorder(a,b)')")
    assert(spark.sql("SELECT sum(v) FROM zo.ns.t").head.getDouble(0) == before,
      "rewrite must lose nothing")
    val all = plannedFiles(spark.table("zo.ns.t"))
    assert(all >= 8, s"compaction should produce many files, got $all")
    val onA = plannedFiles(spark.sql("SELECT * FROM zo.ns.t WHERE a < 256"))
    val onB = plannedFiles(spark.sql("SELECT * FROM zo.ns.t WHERE b < 256"))
    assert(onA * 2 <= all, s"filter on a must prune half+ ($onA of $all)")
    assert(onB * 2 <= all, s"filter on b must prune half+ ($onB of $all)")
  }
}
