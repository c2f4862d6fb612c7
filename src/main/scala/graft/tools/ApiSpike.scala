package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.connector.write.V1Write
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.types._

/** Dev-only compile spike: can we reach the internal parquet DSv2 table
  * and the V1 write fallback from library code?
  */
object ApiSpike {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val classic = spark.asInstanceOf[ClassicSession]
    val pt = ParquetTable(
      "spike",
      classic,
      CaseInsensitiveStringMap.empty(),
      Seq("/root/testdata/sf0.001/region.parquet"),
      None,
      classOf[ParquetFileFormat])
    val sb = pt.newScanBuilder(CaseInsensitiveStringMap.empty())
    println("scan schema: " + sb.build().readSchema())
    val v1w: V1Write = new V1Write {
      override def toInsertableRelation: InsertableRelation =
        (data, overwrite) => println(s"insert ${data.schema} overwrite=$overwrite")
    }
    println("v1write ok: " + (v1w != null))
    spark.stop()
  }
}
