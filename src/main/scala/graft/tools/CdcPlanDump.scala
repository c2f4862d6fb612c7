package graft.tools

import org.apache.spark.sql.connector.catalog.Identifier

/** Dev-only: dump the plan `TableChanges.between` builds for a
  * single-snapshot copy-on-write predicate DELETE — the shape the
  * MV-refresh change feeds consume. Before the predicate-delete fast
  * path this is a two-sided exceptAll diff over the rewritten rows;
  * after, one filtered scan of the replaced files.
  */
object CdcPlanDump {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-cdcdump").toString
    val spark = graft.Verify.sessionBuilder("8")
      .config("spark.sql.extensions",
        classOf[graft.spark.GraftSparkExtensions].getName)
      .config("spark.sql.catalog.cdp",
        classOf[graft.spark.GraftCatalog].getName)
      .config("spark.sql.catalog.cdp.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE cdp.ns")
    spark.sql("CREATE TABLE cdp.ns.t (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO cdp.ns.t SELECT id, concat('s', id) FROM range(0, 10000)")
    spark.sql("DELETE FROM cdp.ns.t WHERE k % 13 = 6") // snapshot 1
    val cat = spark.sessionState.catalogManager.catalog("cdp")
      .asInstanceOf[graft.spark.GraftCatalog]
    val ch = graft.spark.TableChanges.between(spark, cat,
      Identifier.of(Array("ns"), "t"), startSnapshotId = 0L)
    println("======== cdc_pred_delete ========")
    println(ch.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
