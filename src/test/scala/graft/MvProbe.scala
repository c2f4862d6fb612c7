package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale probe for materialized-view refresh (test sources
  * only): create an MV over a large orders build, append a small
  * delta, and time the INCREMENTAL refresh against a forced FULL
  * recompute — the point of incremental maintenance is that refresh
  * cost tracks the DELTA, not the table.
  *
  * Usage: Test/runMain graft.MvProbe <bigDir> <deltaDir>
  * (e.g. /tmp/sf1 /root/testdata/sf0.01)
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val big = args(0)
    val small = args(1)
    val spark = Verify.sessionBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.catalog.gp",
        classOf[graft.spark.GraftCatalog].getName)
      .config("spark.sql.catalog.gp.warehouse",
        java.nio.file.Files.createTempDirectory("graft-mvprobe").toString)
      .getOrCreate()
    def lap[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    spark.sql("CREATE NAMESPACE gp.ns")
    spark.sql("""CREATE TABLE gp.ns.ord (
                   o_orderkey BIGINT, o_orderstatus STRING,
                   o_totalprice DOUBLE, o_orderpriority STRING)""")
    lap("load_big") {
      spark.sql(s"""INSERT INTO gp.ns.ord
                    SELECT o_orderkey, o_orderstatus, o_totalprice,
                           o_orderpriority
                    FROM parquet.`$big/orders.parquet`""")
    }
    val nBig = spark.table("gp.ns.ord").count()
    lap("create_full") {
      spark.sql("""CALL gp.system.create_materialized_view(
                     namespace => 'ns', name => 'mv',
                     source_namespace => 'ns', source_table => 'ord',
                     group_by => 'o_orderstatus,o_orderpriority',
                     aggs => 'n:count:1;total:sum:CAST(o_totalprice AS DECIMAL(18,2));mx:max:o_totalprice')""")
        .show(1, truncate = false)
    }
    val nDelta = lap("append_delta") {
      spark.sql(s"""INSERT INTO gp.ns.ord
                    SELECT o_orderkey + ${nBig * 10}, o_orderstatus,
                           o_totalprice, o_orderpriority
                    FROM parquet.`$small/orders.parquet`""")
      spark.sql(s"SELECT count(*) FROM parquet.`$small/orders.parquet`")
        .head.getLong(0)
    }
    println(s"PROBE rows big=$nBig delta=$nDelta " +
      f"ratio=${nBig.toDouble / nDelta}%.0fx")
    // the scale metric: how many data files each refresh mode PLANS —
    // incremental reads only the appended delta's files, full reads
    // the table (wall time at toy scale is fixed-cost dominated; file
    // count is what grows with the table)
    val snaps = spark.sql(
      "SELECT snapshot_id FROM gp.ns.`ord$snapshots` ORDER BY snapshot_id")
      .collect().map(_.getLong(0))
    import org.apache.spark.sql.functions.{col, countDistinct}
    val deltaFiles = spark.read
      .option("start-snapshot-id", snaps(snaps.length - 2).toString)
      .table("gp.ns.ord")
      .select(countDistinct(col("_file"))).head.getLong(0)
    val fullFiles = spark.table("gp.ns.ord")
      .select(countDistinct(col("_file"))).head.getLong(0)
    println(s"PROBE files_planned full=$fullFiles incremental=$deltaFiles")
    val mode = lap("refresh_incremental") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode == "incremental", s"expected incremental, got $mode")
    // force the full path for the comparison point: delete one row so
    // the snapshot range is non-additive
    spark.sql("DELETE FROM gp.ns.ord WHERE o_orderkey = 1")
    val mode2 = lap("refresh_full_fallback") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode2 == "full", s"expected full, got $mode2")
    // CDC probe: a retractable view (count/sum + companion counts) and
    // a SPARSE copy-on-write delete — the counting-algorithm refresh
    // aggregates only the change feed (the files the delete touched),
    // paired against the full recompute the max-view takes over the
    // SAME snapshot range.
    lap("create_cdc_view") {
      spark.sql("""CALL gp.system.create_materialized_view(
                     namespace => 'ns', name => 'cmv',
                     source_namespace => 'ns', source_table => 'ord',
                     group_by => 'o_orderstatus',
                     aggs => 'n:count:1;np:count:CAST(o_totalprice AS DECIMAL(18,2));total:sum:CAST(o_totalprice AS DECIMAL(18,2))')""")
    }
    lap("sparse_delete") {
      spark.sql("DELETE FROM gp.ns.ord WHERE o_orderkey BETWEEN 100 AND 2000")
    }
    val mode3 = lap("refresh_cdc") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'cmv')""").head.getString(0)
    }
    require(mode3 == "cdc", s"expected cdc, got $mode3")
    val mode4 = lap("refresh_full_same_range") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode4 == "full", s"expected full, got $mode4")
    // truth check at scale: the CDC-merged state equals from scratch
    val cdcRows = spark.sql(
      """SELECT o_orderstatus, n, np, CAST(total AS DOUBLE)
         FROM gp.ns.cmv ORDER BY 1""")
      .collect().map(_.toString).toSeq
    val truthRows = spark.sql(
      """SELECT o_orderstatus, count(*),
                count(CAST(o_totalprice AS DECIMAL(18,2))),
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM gp.ns.ord GROUP BY 1 ORDER BY 1""")
      .collect().map(_.toString).toSeq
    require(cdcRows == truthRows, "cdc state diverged from truth")
    println("PROBE cdc_state_matches_truth true")
    // JOIN-view probe: orders ⋈ customer at sf1, then a 100×-smaller
    // fact append — the two-sided delta refresh joins ONLY the delta
    // against the dim, paired against a forced full re-join+re-agg.
    spark.sql("""CREATE TABLE gp.ns.cust (
                   c_custkey BIGINT, c_mktsegment STRING)""")
    lap("load_cust") {
      spark.sql(s"""INSERT INTO gp.ns.cust
                    SELECT c_custkey, c_mktsegment
                    FROM parquet.`$big/customer.parquet`""")
    }
    lap("create_join_view") {
      spark.sql("""CALL gp.system.create_materialized_view(
                     namespace => 'ns', name => 'jmv',
                     source_namespace => 'ns', source_table => 'ord',
                     group_by => 'c_mktsegment',
                     aggs => 'n:count:1;total:sum:CAST(o_totalprice AS DECIMAL(18,2))',
                     join_namespace => 'ns', join_table => 'cust',
                     join_on => 'o_orderkey=c_custkey')""")
    }
    spark.sql(s"""INSERT INTO gp.ns.ord
                  SELECT o_orderkey + ${nBig * 20}, o_orderstatus,
                         o_totalprice, o_orderpriority
                  FROM parquet.`$small/orders.parquet`""")
    val jmode = lap("refresh_join_delta") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'jmv')""").head.getString(0)
    }
    require(jmode == "incremental", s"expected incremental, got $jmode")
    // force full for the paired comparison: delete one fact row
    spark.sql(s"DELETE FROM gp.ns.ord WHERE o_orderkey = ${nBig * 20 + 1}")
    val jmode2 = lap("refresh_join_full") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'jmv')""").head.getString(0)
    }
    require(jmode2 == "full", s"expected full, got $jmode2")
    val jState = spark.sql(
      """SELECT c_mktsegment, n, CAST(total AS DOUBLE)
         FROM gp.ns.jmv ORDER BY 1""").collect().map(_.toString).toSeq
    val jTruth = spark.sql(
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM gp.ns.ord JOIN gp.ns.cust ON o_orderkey = c_custkey
         GROUP BY 1 ORDER BY 1""").collect().map(_.toString).toSeq
    require(jState == jTruth, "join view state diverged from truth")
    println("PROBE join_state_matches_truth true")
    spark.stop()
  }
}
