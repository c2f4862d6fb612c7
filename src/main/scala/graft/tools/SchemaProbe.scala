package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print Spark-side schemas of the driver testdata. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t ==")
      println(df.schema.treeString)
      df.show(2, 60, vertical = true)
    }
    spark.stop()
  }
}
