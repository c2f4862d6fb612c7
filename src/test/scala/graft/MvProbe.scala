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
    // NOT NULL group keys pin the equality-delta state table: a
    // refresh commit is then the touched groups' keys + rows, O(delta)
    spark.sql("""CREATE TABLE gp.ns.ord (
                   o_orderkey BIGINT NOT NULL, o_orderstatus STRING NOT NULL,
                   o_totalprice DOUBLE, o_orderpriority STRING NOT NULL)""")
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
    // state-write metric: files/bytes the refresh COMMITS to the view
    // table — the scale claim is that this tracks the touched groups
    // (delta-sized), while a forced full refresh writes the corpus
    // inventory snapshot (data files by path→bytes, delete objects by
    // detail→rows): the refresh's WRITE is the after-minus-before diff
    def inv(tbl: String): (Map[String, Long], Map[String, Long]) = (
      spark.sql(s"SELECT path, size_bytes FROM gp.ns.`$tbl$$files`")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      spark.sql(s"SELECT detail, n_rows FROM gp.ns.`$tbl$$deletes`")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    def written(tbl: String,
        before: (Map[String, Long], Map[String, Long])): (Long, Long, Long) = {
      val (d, del) = inv(tbl)
      val newData = d -- before._1.keySet
      val newDel = del -- before._2.keySet
      (newData.size.toLong, newData.values.sum, newDel.values.sum)
    }
    val preInc = inv("mv")
    val mode = lap("refresh_incremental") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode == "incremental", s"expected incremental, got $mode")
    val (incF, incB, incDel) = written("mv", preInc)
    println(s"PROBE state_write mode=incremental files=$incF " +
      s"bytes=$incB delete_rows=$incDel")
    // a one-row delete: min/max cannot retract, so the refresh
    // re-aggregates ONLY the touched group (group-scoped recompute)
    spark.sql("DELETE FROM gp.ns.ord WHERE o_orderkey = 1")
    val preG = inv("mv")
    val mode2 = lap("refresh_groups_one_key") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode2 == "groups", s"expected groups, got $mode2")
    val (gF, gB, gDel) = written("mv", preG)
    println(s"PROBE state_write mode=groups files=$gF bytes=$gB " +
      s"delete_rows=$gDel")

    // truth check after the group-scoped paths: state equals scratch
    val gState = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, n,
                CAST(total AS DOUBLE), mx
         FROM gp.ns.mv ORDER BY 1, 2""").collect().map(_.toString).toSeq
    val gTruth = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*),
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
                max(o_totalprice)
         FROM gp.ns.ord GROUP BY 1, 2 ORDER BY 1, 2""")
      .collect().map(_.toString).toSeq
    require(gState == gTruth, "group-scoped state diverged from truth")
    println("PROBE groups_state_matches_truth true")

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
    val preG2 = inv("mv")
    val mode4 = lap("refresh_groups_same_range") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode4 == "groups", s"expected groups, got $mode4")
    val (g2F, g2B, g2Del) = written("mv", preG2)
    println(s"PROBE state_write mode=groups(sparse_range) files=$g2F " +
      s"bytes=$g2B delete_rows=$g2Del")
    // the corpus-write comparison point: a forced FULL recompute of
    // the same view (rollback in range is unwalkable)
    spark.sql("INSERT INTO gp.ns.ord VALUES (1, 'O', 1.0, '1-URGENT')")
    val rollSnap = spark.sql(
      "SELECT max(snapshot_id) FROM gp.ns.`ord$snapshots`").head.getLong(0)
    spark.sql("INSERT INTO gp.ns.ord VALUES (2, 'O', 2.0, '1-URGENT')")
    spark.sql(s"""CALL gp.system.rollback_to_snapshot(
                    namespace => 'ns', table => 'ord',
                    snapshot_id => $rollSnap)""")
    val preF = inv("mv")
    val mode5 = lap("refresh_full_rollback") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'mv')""").head.getString(0)
    }
    require(mode5 == "full", s"expected full, got $mode5")
    val (fF, fB, fDel) = written("mv", preF)
    println(s"PROBE state_write mode=full files=$fF bytes=$fB " +
      s"delete_rows=$fDel")
    // (the 25-group view above is too small for byte comparisons to
    // mean anything — the high-cardinality probe below carries the
    // O(delta)-write requires)
    // bring cmv up to the post-rollback state too (the rollback in
    // range makes this a full recompute — asserted stale otherwise)
    spark.sql("""CALL gp.system.refresh_materialized_view(
                   namespace => 'ns', name => 'cmv')""")
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

    // HIGH-CARDINALITY state-write probe: one group PER ORDER KEY
    // (150k groups at sf0.1) — the "refresh writes the touched
    // groups, not the view" claim only shows at real group
    // cardinality. The view is equality-delta (NOT NULL integral
    // key): an incremental refresh of a 1%-sized delta and a sparse
    // CDC delete must both write a small fraction of what the forced
    // full rewrite of the same view writes.
    spark.sql("""CALL gp.system.create_materialized_view(
                   namespace => 'ns', name => 'wmv',
                   source_namespace => 'ns', source_table => 'ord',
                   group_by => 'o_orderkey',
                   aggs => 'n:count:1;np:count:CAST(o_totalprice AS DECIMAL(18,2));total:sum:CAST(o_totalprice AS DECIMAL(18,2))')""")
    spark.sql(s"""INSERT INTO gp.ns.ord
                  SELECT o_orderkey + ${nBig * 40}, o_orderstatus,
                         o_totalprice, o_orderpriority
                  FROM parquet.`$small/orders.parquet`""")
    val preWI = inv("wmv")
    val wMode = lap("wide_refresh_incremental") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'wmv')""").head.getString(0)
    }
    require(wMode == "incremental", s"expected incremental, got $wMode")
    val (wiF, wiB, wiDel) = written("wmv", preWI)
    println(s"PROBE wide_state_write mode=incremental files=$wiF " +
      s"bytes=$wiB delete_rows=$wiDel")
    spark.sql(s"DELETE FROM gp.ns.ord WHERE o_orderkey % 9973 = 17")
    val preWC = inv("wmv")
    val wMode2 = lap("wide_refresh_cdc_sparse_delete") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'wmv')""").head.getString(0)
    }
    require(wMode2 == "cdc", s"expected cdc, got $wMode2")
    val (wcF, wcB, wcDel) = written("wmv", preWC)
    println(s"PROBE wide_state_write mode=cdc files=$wcF bytes=$wcB " +
      s"delete_rows=$wcDel")
    // force the full comparison point (rollback in range is unwalkable)
    spark.sql(s"INSERT INTO gp.ns.ord VALUES (${nBig * 90}, 'O', 1.0, '1-URGENT')")
    val wRollSnap = spark.sql(
      "SELECT max(snapshot_id) FROM gp.ns.`ord$snapshots`").head.getLong(0)
    spark.sql(s"INSERT INTO gp.ns.ord VALUES (${nBig * 90 + 1}, 'O', 2.0, '1-URGENT')")
    spark.sql(s"""CALL gp.system.rollback_to_snapshot(
                    namespace => 'ns', table => 'ord',
                    snapshot_id => $wRollSnap)""")
    val preWF = inv("wmv")
    val wMode3 = lap("wide_refresh_full") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'wmv')""").head.getString(0)
    }
    require(wMode3 == "full", s"expected full, got $wMode3")
    val (wfF, wfB, wfDel) = written("wmv", preWF)
    println(s"PROBE wide_state_write mode=full files=$wfF bytes=$wfB " +
      s"delete_rows=$wfDel")
    println(f"PROBE wide_write_ratio incremental=${wfB.toDouble / wiB}%.1fx " +
      f"cdc=${wfB.toDouble / wcB}%.1fx")
    require(wiB * 4 < wfB,
      s"incremental state write ($wiB bytes) must be a small fraction " +
        s"of the full rewrite ($wfB bytes)")
    require(wcB * 4 < wfB,
      s"sparse-delete CDC state write ($wcB bytes) must be a small " +
        s"fraction of the full rewrite ($wfB bytes)")
    // wide-view truth check (exact decimal sums)
    val wState = spark.sql(
      """SELECT count(*) AS n, sum(n) AS rows,
                CAST(sum(total) AS DOUBLE) AS total FROM gp.ns.wmv""")
      .head.toString
    val wTruth = spark.sql(
      """SELECT count(DISTINCT o_orderkey) AS n, count(*) AS rows,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total FROM gp.ns.ord""").head.toString
    require(wState == wTruth,
      s"wide state diverged from truth: $wState vs $wTruth")
    println("PROBE wide_state_matches_truth true")

    // ---- hash-bucketed state: the auto-compaction fold must rewrite
    // only the buckets the pending delete keys touch — the metric is
    // carried (byte-identical) files vs rewritten files at fold time
    spark.conf.set("spark.graft.mv.state.buckets", "16")
    try spark.sql("""CALL gp.system.create_materialized_view(
                       namespace => 'ns', name => 'bmv',
                       source_namespace => 'ns', source_table => 'ord',
                       group_by => 'o_orderkey',
                       aggs => 'n:count:1;total:sum:CAST(o_totalprice AS DECIMAL(18,2))')""")
    finally spark.conf.unset("spark.graft.mv.state.buckets")
    def bmvFiles(): Set[String] = spark.sql(
      "SELECT path FROM gp.ns.`bmv$files`")
      .collect().map(_.getString(0)).toSet
    spark.conf.set("spark.graft.mv.compact-after-deletes", "3")
    val (carriedN, rewrittenN) = try {
      // each refresh touches ONE existing order key → one bucket
      (1 to 2).foreach { i =>
        spark.sql(s"""INSERT INTO gp.ns.ord
                      SELECT o_orderkey, o_orderstatus, o_totalprice,
                             o_orderpriority
                      FROM gp.ns.ord LIMIT 1""")
        spark.sql("""CALL gp.system.refresh_materialized_view(
                       namespace => 'ns', name => 'bmv')""").collect()
      }
      val before = bmvFiles()
      spark.sql("""INSERT INTO gp.ns.ord
                    SELECT o_orderkey, o_orderstatus, o_totalprice,
                           o_orderpriority
                    FROM gp.ns.ord LIMIT 1""")
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'bmv')""").collect()
      val after = bmvFiles()
      (before.intersect(after).size, after.diff(before).size)
    } finally spark.conf.unset("spark.graft.mv.compact-after-deletes")
    println(s"PROBE bucket_fold carried_files=$carriedN " +
      s"rewritten_files=$rewrittenN")
    require(carriedN > 0 && rewrittenN < carriedN,
      s"the fold must rewrite touched buckets only: " +
        s"carried=$carriedN rewritten=$rewrittenN")
    val bState = spark.sql(
      """SELECT count(*) AS n, CAST(sum(total) AS DOUBLE) AS total
         FROM gp.ns.bmv""").head.toString
    val bTruth = spark.sql(
      """SELECT count(DISTINCT o_orderkey) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total FROM gp.ns.ord""").head.toString
    require(bState == bTruth,
      s"bucketed state diverged from truth: $bState vs $bTruth")
    println("PROBE bucket_state_matches_truth true")

    // ---- n-ary (3-way star schema) at scale: a fact-side delta
    // refresh joins ONLY the delta against the dims (telescoping
    // rule); the write stays O(touched groups) and a forced full
    // recompute of the same view is the yardstick
    spark.sql("CREATE TABLE gp.ns.dstat (s STRING NOT NULL, sgrp STRING NOT NULL)")
    spark.sql("""INSERT INTO gp.ns.dstat
                 SELECT DISTINCT o_orderstatus,
                        concat('g', o_orderstatus) FROM gp.ns.ord""")
    spark.sql("CREATE TABLE gp.ns.dprio (p STRING NOT NULL, pgrp STRING NOT NULL)")
    spark.sql("""INSERT INTO gp.ns.dprio
                 SELECT DISTINCT o_orderpriority,
                        substring(o_orderpriority, 1, 1)
                 FROM gp.ns.ord""")
    lap("nary_create_full") {
      spark.sql("""CALL gp.system.create_materialized_view(
                     namespace => 'ns', name => 'nmv',
                     source_namespace => 'ns', source_table => 'ord',
                     group_by => 'sgrp,pgrp',
                     aggs => 'n:count:1;np:count:CAST(o_totalprice AS DECIMAL(18,2));total:sum:CAST(o_totalprice AS DECIMAL(18,2))',
                     join_namespace => 'ns', join_table => 'dstat',
                     join_on => 'o_orderstatus=s',
                     extra_joins => 'ns|dprio|o_orderpriority=p')""")
        .show(1, truncate = false)
    }
    spark.sql(s"""INSERT INTO gp.ns.ord
                  SELECT o_orderkey + ${nBig * 40}, o_orderstatus,
                         o_totalprice, o_orderpriority
                  FROM parquet.`$small/orders.parquet`""")
    val preNy = inv("nmv")
    val nmode = lap("nary_refresh_incremental") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'nmv')""").head.getString(0)
    }
    require(nmode == "incremental", s"expected incremental, got $nmode")
    val (nyF, nyB, nyDel) = written("nmv", preNy)
    println(s"PROBE nary_state_write mode=incremental files=$nyF " +
      s"bytes=$nyB delete_rows=$nyDel")
    spark.sql(s"DELETE FROM gp.ns.ord WHERE o_orderkey % 9973 = 11")
    val preNc = inv("nmv")
    val nmode2 = lap("nary_refresh_cdc") {
      spark.sql("""CALL gp.system.refresh_materialized_view(
                     namespace => 'ns', name => 'nmv')""").head.getString(0)
    }
    require(nmode2 == "cdc", s"expected cdc, got $nmode2")
    val (ncF, ncB, ncDel) = written("nmv", preNc)
    println(s"PROBE nary_state_write mode=cdc files=$ncF bytes=$ncB " +
      s"delete_rows=$ncDel")
    val nState = spark.sql(
      """SELECT sgrp, pgrp, n, np, CAST(total AS DOUBLE)
         FROM gp.ns.nmv ORDER BY 1, 2""").collect().map(_.toString).toSeq
    val nTruth = spark.sql(
      """SELECT sgrp, pgrp, count(*) AS n,
                count(CAST(o_totalprice AS DECIMAL(18,2))) AS np,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM gp.ns.ord JOIN gp.ns.dstat ON o_orderstatus = s
         JOIN gp.ns.dprio ON o_orderpriority = p
         GROUP BY 1, 2 ORDER BY 1, 2""").collect().map(_.toString).toSeq
    require(nState == nTruth, "n-ary view state diverged from truth")
    println("PROBE nary_state_matches_truth true")


    spark.stop()
  }
}
