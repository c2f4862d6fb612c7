package graft.spark

import graft.catalog.Graft
import graft.format.{Manifests, TableMetadata}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{DataType, StructType}

/** Row-level change capture between two table snapshots, computed from
  * the snapshots' file-inventory diff — no change journal is written
  * on the commit path (commits stay O(delta)); the diff is derived on
  * demand, the way Iceberg's changelog scan derives changes from
  * manifests.
  *
  * Cost model at 100 TB: the diff touches only files ADDED or REMOVED
  * in the range — a copy-on-write UPDATE that rewrote 10 files makes
  * this a 20-file job, never a table scan. For an append-only range
  * the removed set is empty and the result is a plain scan of the new
  * files (no shuffle at all); only genuine rewrites pay the exceptAll
  * shuffle, and only over the rewritten files' rows (unchanged rows in
  * rewritten files cancel multiset-wise, surfacing exactly the
  * modified rows).
  */
object TableChanges {

  val ChangeTypeColumn = "_change_type"

  /** Snapshots of `(start, end]` on the MAIN parent chain, oldest
    * first. Snapshot ids are GLOBAL across main + branches, so an
    * id-interval filter could pull a concurrent BRANCH commit into a
    * main range and emit its changes as main-lineage ones — walk the
    * endpoint's parent chain instead. Only when the chain is broken
    * (a mid-chain snapshot expired) or the start is not an ancestor
    * does this fall back to the interval view, the historical
    * behavior.
    */
  private[spark] def mainLineage(storage: graft.storage.StorageOps,
      meta: TableMetadata, start: Long, end: Long)
      : Seq[graft.format.Snapshot] = {
    var acc = List.empty[graft.format.Snapshot]
    var cur = end
    var reached = cur == start
    while (!reached && cur >= 0) {
      meta.findSnapshot(storage, cur) match {
        case Some(s) => acc = s :: acc; cur = s.parentId
        case None => cur = -2L // broken chain: fall back below
      }
      reached = cur == start
    }
    if (reached || (start < 0 && cur == -1L)) acc
    else meta.allSnapshots(storage)
      .filter(s => s.id > start && s.id <= end)
  }

  /** Changed rows in `(startSnapshotId, endSnapshotId]` of `ns.table`:
    * the table's columns plus [[ChangeTypeColumn]] (`insert` /
    * `delete`; an update surfaces as delete(old) + insert(new)).
    * `startSnapshotId = -1` means "since table creation";
    * `endSnapshotId = -1` means "through the current snapshot".
    */
  def between(spark: SparkSession, cat: GraftCatalog, ident: Identifier,
      startSnapshotId: Long = -1L, endSnapshotId: Long = -1L): DataFrame = {
    val storage = cat.storage
    val ns = ident.namespace()(0)
    val txn = Graft.beginTransaction(storage)
    val (meta, dataRoot) =
      try {
        val td = Graft.describeTable(storage, txn, ns, ident.name())
        (TableMetadata.read(storage, td.metadataLocation),
          storage.absolute(
            graft.objects.FileLocations.tableDataDir(ns, ident.name())))
      } finally txn.close()
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val endId =
      if (endSnapshotId >= 0) endSnapshotId else meta.currentSnapshotId
    def inventory(id: Long): Map[String, graft.format.DataFileEntry] =
      if (id < 0) Map.empty
      else Manifests.filesOf(storage,
        meta.findSnapshot(storage, id).getOrElse(throw new IllegalArgumentException(
          s"no such snapshot on ${ident.name()}: $id (expired?)")))
        .map(f => f.path -> f).toMap
    val startInv = inventory(startSnapshotId)
    val endInv = inventory(endId)
    val added = (endInv -- startInv.keySet).values.toSeq
    val removed = (startInv -- endInv.keySet).values.toSeq
    def scan(files: Seq[graft.format.DataFileEntry]): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).option("basePath", dataRoot)
        .parquet(files.map(f => storage.absolute(f.path)): _*)
    // A rollback RESTORES a historic snapshot's entire state — possibly
    // including pending merge-on-read deletes. The file-diff derivation
    // below is wrong across one: restored files scanned raw would emit
    // logically-deleted rows as inserts, and an un-delete rollback (the
    // restored delete list a subset of the parent's) has no file diff
    // at all. Ranges containing a rollback therefore diff the two
    // ENDPOINT snapshots logically, each read with its own residuals
    // applied — a 2-snapshot scan, the honest net-change answer.
    val rangeSnaps = TableChanges.mainLineage(
      storage, meta, startSnapshotId, endId)
    if (rangeSnaps.exists(_.operation == "rollback")) {
      def liveRows(id: Long): DataFrame =
        if (id < 0)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else {
          val snap = meta.findSnapshot(storage, id).getOrElse(
            throw new IllegalArgumentException(
              s"no such snapshot on ${ident.name()}: $id (expired?)"))
          MorDeletes.readEntries(spark, schema, Some(dataRoot),
            Manifests.filesOf(storage, snap)
              .map(f => (storage.absolute(f.path), f)),
            snap.deletes,
            snap.posDeletes.map(p => storage.absolute(p.path)),
            eqDeletes = snap.eqDeletes.map(p => (storage.absolute(p.path), p)))
        }
      val startLive = liveRows(startSnapshotId)
      val endLive = liveRows(endId)
      return endLive.exceptAll(startLive)
        .withColumn(ChangeTypeColumn, lit("insert"))
        .unionAll(startLive.exceptAll(endLive)
          .withColumn(ChangeTypeColumn, lit("delete")))
    }
    val inserts = scan(added)
    val deletes = scan(removed)
    // merge-on-read deletes are file-invisible (the commit only adds a
    // predicate) — surface their rows by scanning the PARENT inventory
    // for predicate matches, with the parent's own residuals applied
    // (a row two stacked deletes both match is emitted once, by the
    // first)
    val morDeleted: Option[DataFrame] = {
      val dfs = rangeSnaps.flatMap { s =>
        meta.findSnapshot(storage, s.parentId).toSeq.flatMap { parent =>
          val prior = parent.deletes.toSet
          val parentEq = parent.eqDeletes.map(p =>
            (storage.absolute(p.path), p))
          val predDfs = s.deletes.filterNot(prior).map { pred =>
            val parentFiles = Manifests.filesOf(storage, parent)
              .map(f => (storage.absolute(f.path), f))
            MorDeletes.readEntries(spark, schema, Some(dataRoot),
              parentFiles, parent.deletes,
              parent.posDeletes.map(p => storage.absolute(p.path)),
              eqDeletes = parentEq)
              .filter(org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.expr(pred.sql), lit(false)))
          }
          // position deltas: rows a NEW delete object names are the
          // range's deletes — read only the referenced parent files
          // (with the parent's own residuals applied so an already-
          // deleted row is never re-emitted) and semi-join on the
          // (file, pos) row id
          val priorPos = parent.posDeletes.map(_.path).toSet
          // a delete-object rewrite (minor compaction) re-commits the
          // SAME logical deletes under new paths — correct even without
          // this guard (the parent's residuals exclude every position
          // the rewritten objects name, so the semi-join is empty), but
          // skipping it avoids reading the referenced files at all
          val newPos =
            if (s.operation == "rewrite-deletes") Seq.empty
            else s.posDeletes.filterNot(p => priorPos(p.path))
          val posDfs =
            if (newPos.isEmpty) Seq.empty
            else {
              val refRel = newPos.flatMap(_.dataFiles).toSet
              val parentFiles = Manifests.filesOf(storage, parent)
                .filter(f => refRel(f.path))
                .map(f => (storage.absolute(f.path), f))
              val survivors = MorDeletes.readEntries(spark, schema,
                Some(dataRoot), parentFiles, parent.deletes,
                parent.posDeletes.map(p => storage.absolute(p.path)),
                exposePos = true, eqDeletes = parentEq)
              val dels = MorDeletes.maybeBroadcast(
                spark.read.parquet(newPos.map(p =>
                  storage.absolute(p.path)): _*),
                newPos.map(_.sizeBytes).sum)
              Seq(survivors.join(dels,
                survivors(MorDeletes.GFile) === dels("file") &&
                  survivors(MorDeletes.GPos) === dels("pos"), "left_semi")
                .drop(MorDeletes.GFile, MorDeletes.GPos))
            }
          // streaming upserts: rows of strictly-older parent files
          // whose key tuple is in a NEW equality-delete object are the
          // range's deletes — read only files the delete can reach
          // (entry.seq < delete.seq), with the parent's own residuals
          // applied, then null-safe semi-join on the key columns
          val priorEq = parent.eqDeletes.map(_.path).toSet
          val newEq = s.eqDeletes.filterNot(p => priorEq(p.path))
          val eqDfs = newEq.map { d =>
            import org.apache.spark.sql.functions.col
            val parentFiles = Manifests.filesOf(storage, parent)
              .filter(_.seq < d.seq)
              .map(f => (storage.absolute(f.path), f))
            val survivors = MorDeletes.readEntries(spark, schema,
              Some(dataRoot), parentFiles, parent.deletes,
              parent.posDeletes.map(p => storage.absolute(p.path)),
              eqDeletes = parentEq)
            val keys = MorDeletes.maybeBroadcast(
              spark.read.parquet(storage.absolute(d.path))
                .select(d.cols.map(col): _*)
                .toDF(d.cols.map("__eqk_" + _): _*), d.sizeBytes)
            survivors.join(keys,
              d.cols.map(c => survivors(c) <=> keys("__eqk_" + c))
                .reduce(_ && _),
              "left_semi")
          }
          predDfs ++ posDfs ++ eqDfs
        }
      }
      dfs.reduceOption(_ unionAll _)
    }
    // single-snapshot COMPLETE-PREDICATE delete: the deleted rows are
    // exactly the replaced files' rows where the recorded predicate is
    // TRUE, and the rewrite adds no rows — ONE scan of the removed
    // files (with predicate pushdown) instead of two exceptAll
    // shuffles over every rewritten row. Requires the parent to carry
    // no pending merge-on-read residuals (a raw removed-file scan
    // would otherwise also surface previously-deleted rows the
    // rewrite applied) and an un-renamed schema (the predicate speaks
    // physical names, the scan reads logical).
    val predDeleteOnly = rangeSnaps match {
      case Seq(s) =>
        s.operation == "delete" && s.deleteSql.nonEmpty &&
        meta.findSnapshot(storage, s.parentId).exists(p =>
          p.deletes.isEmpty && p.posDeletes.isEmpty && p.eqDeletes.isEmpty) &&
        ColumnMapping.renames(schema).isEmpty
      case _ => false
    }
    val base =
      if (removed.isEmpty)
        // append-only range: the new files ARE the inserts — no shuffle
        inserts.withColumn(ChangeTypeColumn, lit("insert"))
      else if (predDeleteOnly)
        deletes.filter(org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.expr(rangeSnaps.head.deleteSql),
            lit(false)))
          .withColumn(ChangeTypeColumn, lit("delete"))
      else
        inserts.exceptAll(deletes).withColumn(ChangeTypeColumn, lit("insert"))
          .unionAll(
            deletes.exceptAll(inserts).withColumn(ChangeTypeColumn, lit("delete")))
    morDeleted.map(d =>
      base.unionAll(d.withColumn(ChangeTypeColumn, lit("delete"))))
      .getOrElse(base)
  }
}
