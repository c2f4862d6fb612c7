package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.Job
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat

import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, JoinedRow}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.write.BatchWrite
import org.apache.spark.sql.execution.datasources.{FilePartition, WriteJobDescription}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.{FileBatchWrite, FileWriterFactory}
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Access seam for `private[sql]` Spark internals the graft connector
  * builds on (the standard connector-shim pattern — a small file in the
  * `org.apache.spark.sql` namespace; everything here is thin glue over
  * Spark's own write/read machinery, no behavior of its own).
  */
object SparkInternals {

  /** A user-facing [[org.apache.spark.sql.Column]] over a raw Catalyst
    * expression (the classic-session bridge is `private[sql]`).
    */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)


  /** Unwrap the `private[sql]` operation wrapper Spark puts around a
    * table inside ReplaceData / WriteDelta relations, so catalog rules
    * can match the connector's own Table underneath.
    */
  def unwrapRowLevelTable(t: org.apache.spark.sql.connector.catalog.Table)
      : org.apache.spark.sql.connector.catalog.Table = t match {
    case rlot: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      rlot.table
    case other => other
  }

  /** A real DSv2 [[BatchWrite]] producing parquet under `outDir` —
    * exactly the files `DataFrame.write.parquet` would produce, but
    * drivable from a connector write path (ReplaceData has no V1
    * fallback). `partCols` nonempty ⇒ Hive-style `col=value` dynamic
    * partition layout (those columns are not stored in the files).
    */
  def parquetBatchWrite(
      spark: SparkSession,
      schema: StructType,
      partCols: Seq[String],
      outDir: String,
      queryId: String,
      hadoopOpts: Map[String, String] = Map.empty): BatchWrite = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    job.setOutputKeyClass(classOf[Void])
    job.setOutputValueClass(classOf[InternalRow])
    FileOutputFormat.setOutputPath(job, new Path(outDir))
    // per-table parquet writer tuning (bloom filters, dictionary,
    // page/row-group sizing) rides the job conf into prepareWrite's
    // SerializableConfiguration — executor-side writers all see it
    hadoopOpts.foreach { case (k, v) => job.getConfiguration.set(k, v) }

    val allAttrs: Seq[AttributeReference] = DataTypeUtils.toAttributes(schema)
    val partAttrs = partCols.map { c =>
      allAttrs.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"partition column $c not in $schema"))
    }
    val dataAttrs = allAttrs.filterNot(partAttrs.contains)

    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty, StructType(dataAttrs.map(a =>
        org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))

    val committer = FileCommitProtocol.instantiate(
      spark.sessionState.conf.fileCommitProtocolClass,
      jobId = queryId,
      outputPath = outDir)

    val description = new WriteJobDescription(
      uuid = queryId,
      serializableHadoopConf = new SerializableConfiguration(job.getConfiguration),
      outputWriterFactory = factory,
      allColumns = allAttrs,
      dataColumns = dataAttrs,
      partitionColumns = partAttrs,
      bucketSpec = None,
      path = outDir,
      customPartitionLocations = Map.empty,
      maxRecordsPerFile = spark.sessionState.conf.maxRecordsPerFile,
      timeZoneId = spark.sessionState.conf.sessionLocalTimeZone,
      statsTrackers = Seq.empty)

    committer.setupJob(job)
    new FileBatchWrite(job, description, committer)
  }

  /** Wrap a [[org.apache.spark.sql.connector.write.DataWriterFactory]]
    * so every incoming row (laid out as `input`) is extended with
    * `extraOf(attrs)` computed columns before the delegate writes it —
    * how hidden partition-transform directory columns are derived
    * on the EXECUTOR, row-by-row through codegen'd projection, without
    * the logical plan ever seeing them.
    */
  def derivingWriterFactory(
      delegate: org.apache.spark.sql.connector.write.DataWriterFactory,
      input: StructType,
      extraOf: Seq[AttributeReference] => Seq[Expression])
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val attrs = DataTypeUtils.toAttributes(input)
    val extra = extraOf(attrs)
    new DerivingWriterFactory(delegate, attrs, extra)
  }

  /** Normalized filesystem path of a one-file [[FilePartition]]. */
  def partitionFilePath(p: InputPartition): String = p match {
    case fp: FilePartition =>
      require(fp.files.length == 1, s"expected a single-file partition: $fp")
      fp.files.head.toPath.toUri.getPath
    case pd: PosDeletePartition => pd.dataFile
    case other =>
      throw new IllegalStateException(s"expected FilePartition, got $other")
  }

  /** Regroup a delegated parquet [[Batch]]'s input partitions by
    * partition-key value: one [[InputPartition]] per distinct value
    * tuple, each reporting its key ([[HasPartitionKey]]) — the physical
    * half of storage-partitioned joins. Keys come from `keyOf`
    * (normalized file path → key values), i.e. from the SNAPSHOT's own
    * per-file partition values — not from the delegate's
    * `PartitionedFile.partitionValues`, which Spark projects down to
    * the REQUIRED partition columns (hidden transform columns are
    * never required, so their values would be gone). Returns None when
    * any file can't be keyed (pre-partitioning or imported files), so
    * callers fall back to the plain scan.
    */
  def keyGroupedPartitions(delegate: Batch,
      keyOf: String => Option[Seq[Any]])
      : Option[Array[InputPartition]] = {
    val files = Array.newBuilder[org.apache.spark.sql.execution.datasources.PartitionedFile]
    delegate.planInputPartitions().foreach {
      case fp: FilePartition => files ++= fp.files
      case _ => return None
    }
    val all = files.result()
    // group by VALUE-equal keys (UTF8String / boxed primitives)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.datasources.PartitionedFile]]
    all.foreach { f =>
      val k = keyOf(f.toPath.toUri.getPath).getOrElse(return None)
      groups.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer()) += f
    }
    Some(groups.toSeq.zipWithIndex.map { case ((key, fs), i) =>
      KeyedFilePartition(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          key.toArray),
        FilePartition(i, fs.toArray)): InputPartition
    }.toArray)
  }

  /** Reader factory unwrapping [[KeyedFilePartition]] before the
    * delegated parquet reader sees it.
    */
  def keyUnwrappingFactory(delegate: PartitionReaderFactory): PartitionReaderFactory =
    new PartitionReaderFactory {
      private def unwrap(p: InputPartition): InputPartition = p match {
        case k: KeyedFilePartition => k.inner
        case other => other
      }
      override def supportColumnarReads(p: InputPartition): Boolean =
        delegate.supportColumnarReads(unwrap(p))
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        delegate.createReader(unwrap(p))
      override def createColumnarReader(p: InputPartition)
          : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
        delegate.createColumnarReader(unwrap(p))
    }

  /** Rewrap a delegated parquet [[Batch]] so every partition holds
    * splits of exactly ONE file, and every row carries that file's path
    * as an appended string column (ordinal `tagOrdinal`, i.e. after the
    * delegate's columns). This is what lets `_file` be a per-row
    * metadata column over a scan we otherwise delegate wholesale to
    * Spark's parquet reader — and what group-based row-level operations
    * use to identify the files a row belongs to.
    */
  def fileTaggedBatch(delegate: Batch, tagOrdinal: Int): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val out = Array.newBuilder[InputPartition]
      var i = 0
      delegate.planInputPartitions().foreach {
        case fp: FilePartition =>
          // one file per partition; splits of a file may share one
          fp.files.groupBy(_.filePath).values.foreach { splits =>
            out += FilePartition(i, splits)
            i += 1
          }
        case pd: PosDeletePartition => out += pd // already single-file
        case other =>
          throw new IllegalStateException(s"expected FilePartition, got $other")
      }
      out.result()
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FileTaggedReaderFactory(delegate.createReaderFactory(), tagOrdinal)
  }

  /** Project delegate rows from `actual` layout to `wanted` — the same
    * field set in a different order. A delegated parquet scan returns
    * requested DATA fields in request order but moves Hive-partition
    * fields to the END ([[org.apache.spark.sql.execution.datasources.v2.FileScan]]
    * `readSchema = readDataSchema ++ readPartitionSchema`); merge-on-read
    * wrappers do per-ordinal row work, so the delegate's rows are
    * restored to the requested order here first. Columnar-capable: the
    * reorder is a pure column permutation of the delegate's batches.
    */
  def reorderedBatch(delegate: Batch, actual: StructType,
      wanted: StructType): Batch = {
    val attrs = DataTypeUtils.toAttributes(actual)
    val byName = attrs.map(a => a.name -> a).toMap
    val outAttrs = wanted.fields.toIndexedSeq.map(f => byName(f.name))
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        delegate.planInputPartitions()
      override def createReaderFactory(): PartitionReaderFactory =
        new ReorderingReaderFactory(delegate.createReaderFactory(), attrs,
          outAttrs)
    }
  }

  /** Row-exact residual filtering over a delegated batch: every row is
    * tested against `cond` (bound to `inputSchema`'s attributes) and
    * survivors are projected to the first `keepN` columns. This is the
    * merge-on-read delete read path — parquet's own pushdown is
    * row-group granular, so exactness must come from here. Columnar
    * batches stay columnar: [[RowFilteredReaderFactory]] evaluates the
    * residual per batch and remaps survivors through a
    * [[SelectedColumnVector]] selection vector; only files with
    * PENDING deletes pay the evaluation at all, and a
    * rewrite/compaction removes even that.
    */
  def filteredProjectedBatch(delegate: Batch, cond: Expression,
      inputSchema: StructType, keepN: Int): Batch = {
    val attrs = inputSchema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val bound = cond.transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        attrs.find(_.name == u.nameParts.last).getOrElse(
          throw new IllegalArgumentException(
            s"unknown column in residual predicate: ${u.nameParts.mkString(".")}"))
      case a: AttributeReference =>
        attrs.find(_.name == a.name).getOrElse(a)
    }
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        delegate.planInputPartitions()
      override def createReaderFactory(): PartitionReaderFactory =
        new RowFilteredReaderFactory(delegate.createReaderFactory(), bound,
          attrs, keepN)
    }
  }

  /** The data-schema field name Spark's parquet readers (vectorized
    * and row-based alike) recognize as the generated row-index column:
    * a LongType field with this name is filled with each row's
    * position within its file — correct even under predicate pushdown
    * and row-group skipping, because positions derive from row-group
    * metadata, not from counting returned rows. This is the same
    * mechanism `_metadata.row_index` lowers to in Spark's v1 file
    * source path.
    */
  val RowIndexColumn = "_tmp_metadata_row_index"

  /** NULLABLE on purpose: the parquet readers treat a non-nullable
    * absent column as an error; a nullable one with this name is
    * row-index-generated instead.
    */
  def rowIndexField: org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(RowIndexColumn,
      org.apache.spark.sql.types.LongType)

  /** One equality-delete object as the scan applies it: absolute
    * object path, its key column names, and where those columns sit in
    * the read schema (`ordinals`/`types` resolved driver-side so the
    * executor reader is pure ordinal work).
    */
  case class EqDeleteSpec(abs: String, cols: Seq[String],
      ordinals: Array[Int],
      types: Array[org.apache.spark.sql.types.DataType])

  /** Apply equality deletes to a delegated batch: every reader in the
    * group loads the objects' key sets executor-side
    * ([[graft.format.EqDeleteFiles.keySet]], soft-cached per JVM) and
    * drops rows whose key tuple matches any of them; survivors project
    * to the first `keepN` columns (dropping key columns that were read
    * only for the filter). Partitions pass through untouched so
    * file-granular wrappers above still see FilePartitions.
    */
  def eqDeleteFilteredBatch(delegate: Batch,
      specs: Seq[EqDeleteSpec],
      conf: SerializableConfiguration,
      inputSchema: StructType,
      keepN: Int,
      keepMatches: Boolean = false): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      delegate.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      new EqDeleteReaderFactory(delegate.createReaderFactory(), specs.toArray,
        conf, inputSchema, keepN, keepMatches)
  }

  /** Apply position deletes to a delegated batch: partitions are
    * regrouped one-file-per-partition, each covered file's partition
    * carries the ABS paths of the delete objects referencing it, and
    * the executor-side reader loads that file's deleted-position set
    * ([[graft.format.PosDeleteFiles.positionsFor]]) and drops matching
    * rows by the row-index column at `rixOrdinal`. Survivors project
    * to the first `keepN` columns (dropping the row-index column when
    * `_pos` wasn't itself requested). Delete sets load WHERE the data
    * file is read — a 1000-executor scan never routes positions
    * through the driver.
    */
  def posDeleteFilteredBatch(delegate: Batch,
      deletesFor: String => Seq[String],
      conf: SerializableConfiguration,
      inputSchema: StructType,
      rixOrdinal: Int,
      keepN: Int): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val out = Array.newBuilder[InputPartition]
      var i = 0
      delegate.planInputPartitions().foreach {
        case fp: FilePartition =>
          fp.files.groupBy(_.filePath).values.foreach { splits =>
            val single = FilePartition(i, splits)
            val path = partitionFilePath(single)
            val dels = deletesFor(path)
            out += (if (dels.isEmpty) single
              else PosDeletePartition(single, path, dels.toArray))
            i += 1
          }
        case other =>
          throw new IllegalStateException(s"expected FilePartition, got $other")
      }
      out.result()
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PosDeleteReaderFactory(delegate.createReaderFactory(), conf,
        inputSchema, rixOrdinal, keepN)
  }

  /** Change-capture read of one snapshot's DELETED rows over the
    * PARENT's files: a row is emitted iff it (a) survived the parent's
    * own residuals — `cond` (parent predicate keep AND optionally the
    * new delete predicate) evaluates true and its row-index is in none
    * of the parent's pending delete sets (`parentDelsFor`) — and (b) is
    * actually deleted by THIS snapshot: when `newDelsFor` yields
    * objects for the file, the row-index must be in their union
    * (position-delta CDC); with no new objects the new predicate inside
    * `cond` is the deletion test (predicate-delete CDC). Survivors
    * project to the first `keepN` columns. Partitions are single-file;
    * delete sets load where the file is read.
    */
  def cdcDeleteBatch(delegate: Batch,
      cond: Expression,
      parentDelsFor: String => Seq[String],
      newDelsFor: String => Seq[String],
      conf: SerializableConfiguration,
      inputSchema: StructType,
      rixOrdinal: Int,
      keepN: Int,
      requireNewDels: Boolean): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val out = Array.newBuilder[InputPartition]
      var i = 0
      delegate.planInputPartitions().foreach {
        case fp: FilePartition =>
          fp.files.groupBy(_.filePath).values.foreach { splits =>
            val single = FilePartition(i, splits)
            val path = partitionFilePath(single)
            val newDels = newDelsFor(path)
            // position-delta CDC: a referenced-file list can overshoot
            // (other groups' files); a file no new object names emits
            // nothing — skip it at planning
            if (!requireNewDels || newDels.nonEmpty) {
              out += CdcPartition(single, path,
                parentDelsFor(path).toArray, newDels.toArray)
              i += 1
            }
          }
        case other =>
          throw new IllegalStateException(s"expected FilePartition, got $other")
      }
      out.result()
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new CdcDeleteReaderFactory(delegate.createReaderFactory(), cond, conf,
        inputSchema, rixOrdinal, keepN)
  }

  /** Append constant columns (e.g. `_change_type`, the commit snapshot
    * id) to every row of the delegate. Columnar-capable: constants ride
    * [[ConstantColumnVector]]s, so an append-only change-feed range
    * (plain file scans + tags — the common CDC read) stays vectorized.
    */
  def constantTaggedBatch(delegate: Batch, values: Seq[Any]): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      delegate.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory = {
      val inner = delegate.createReaderFactory()
      val tagVals = values.toArray
      // only tag types the columnar reader can render as constant
      // vectors; anything else (a future tag type) falls back to the
      // row reader instead of throwing at executor runtime
      val columnarTags = tagVals.forall {
        case _: UTF8String | _: java.lang.Long => true
        case _ => false
      }
      new PartitionReaderFactory {
        override def supportColumnarReads(p: InputPartition): Boolean =
          columnarTags && inner.supportColumnarReads(p)
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
          val tag = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(tagVals)
          val r = inner.createReader(p)
          new PartitionReader[InternalRow] {
            private val joined = new JoinedRow
            override def next(): Boolean = r.next()
            override def get(): InternalRow = joined(r.get(), tag)
            override def close(): Unit = r.close()
          }
        }
        override def createColumnarReader(p: InputPartition)
            : PartitionReader[ColumnarBatch] = {
          val r = inner.createColumnarReader(p)
          new PartitionReader[ColumnarBatch] {
            private var batch: ColumnarBatch = _
            override def next(): Boolean = {
              val has = r.next()
              if (has) {
                val b = r.get()
                val consts = tagVals.map {
                  case s: UTF8String =>
                    val v = new ConstantColumnVector(b.numRows(), StringType)
                    v.setUtf8String(s)
                    v: ColumnVector
                  case l: java.lang.Long =>
                    val v = new ConstantColumnVector(b.numRows(),
                      org.apache.spark.sql.types.LongType)
                    v.setLong(l)
                    v: ColumnVector
                  case other => throw new IllegalStateException(
                    s"unsupported constant tag type: $other")
                }
                batch = new ColumnarBatch(
                  Array.tabulate[ColumnVector](b.numCols())(b.column) ++ consts,
                  b.numRows())
              }
              has
            }
            override def get(): ColumnarBatch = batch
            override def close(): Unit = r.close()
          }
        }
      }
    }
  }

  /** A parquet DSv2 scan builder whose file index is served ENTIRELY
    * from the snapshot's commit-time stats — no existence checks, no
    * listing, no per-file HEAD requests. `ParquetTable`'s own path
    * (`DataSource.checkAndGlobPathIfNecessary` + `InMemoryFileIndex`
    * listing) costs O(files) filesystem calls per scan construction;
    * at 100 TB against an object store that is the planning
    * bottleneck. Safe because graft data files are immutable-by-name
    * (UUID names) — a manifest-recorded (path, size) can never go
    * stale. Partition-column parsing (`basePath` in `options`) and
    * schema handling match `FileTable`: `schema` is the full physical
    * schema, data schema excludes the Hive-partition columns.
    */
  def parquetScanBuilder(
      spark: SparkSession,
      files: Seq[(String, Long)], // (absolute path, exact size)
      physSchema: StructType,
      partCols: Seq[String],
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
      // per-file partition-layout roots (the dir whose CHILDREN are the
      // Hive `col=value` levels). When every file has one, the
      // partition spec is parsed against this set — files from SEVERAL
      // roots (a zero-copy fork or registered table reading another
      // table's dir alongside its own fresh commits) resolve partition
      // values correctly, which a single `basePath` option cannot do.
      partRoots: Option[Seq[String]] = None)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    import scala.jdk.CollectionConverters._
    // the index consults its cache under QUALIFIED paths (scheme +
    // authority); qualification is string work on the driver, no I/O
    val hadoopConf = spark.sessionState
      .newHadoopConfWithOptions(options.asCaseSensitiveMap.asScala.toMap)
    def qualify(abs: String): Path = {
      val raw = new Path(abs)
      raw.getFileSystem(hadoopConf).makeQualified(raw)
    }
    val statuses = files.map { case (abs, size) =>
      val p = qualify(abs)
      p -> Array(new org.apache.hadoop.fs.FileStatus(
        size, false, 1, 128L << 20, 0L, p))
    }.toMap
    val cache = new org.apache.spark.sql.execution.datasources.FileStatusCache {
      override def getLeafFiles(path: Path)
          : Option[Array[org.apache.hadoop.fs.FileStatus]] = statuses.get(path)
      override def putLeafFiles(path: Path,
          leafFiles: Array[org.apache.hadoop.fs.FileStatus]): Unit = ()
      override def invalidateAll(): Unit = ()
    }
    // explicit partition spec from the snapshot's own layout knowledge:
    // no directory inference, no single-base-path assumption
    val partSpec = partRoots.filter(_ => partCols.nonEmpty).map { roots =>
      val partSchema = StructType(
        partCols.map(c => physSchema(physSchema.fieldIndex(c))))
      val leafDirs = statuses.keys.map(_.getParent).toSet.toIndexedSeq
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      // one parse PER root (Spark's parser rejects several base dirs
      // in one call as "conflicting structures"), merged after — the
      // column set is pinned by partSchema so the merge is sound
      val qRoots = roots.map(qualify)
      val byRoot = leafDirs.groupBy(d => qRoots.find(r =>
        d.toString == r.toString || d.toString.startsWith(r.toString + "/"))
        .getOrElse(throw new IllegalStateException(
          s"data file dir $d under none of the layout roots $qRoots")))
      val parsed = byRoot.toSeq.map { case (root, dirs) =>
        org.apache.spark.sql.execution.datasources.GraftPartitioning
          .parse(dirs, Set(root), partSchema, tz)
      }
      org.apache.spark.sql.execution.datasources.PartitionSpec(
        parsed.head.partitionColumns, parsed.flatMap(_.partitions))
    }
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      spark, statuses.keys.toIndexedSeq,
      options.asCaseSensitiveMap.asScala.toMap, Some(physSchema), cache,
      partSpec, None)
    val dataSchema = StructType(
      physSchema.fields.filterNot(f => partCols.contains(f.name)))
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      spark, index, physSchema, dataSchema, options)
  }

  /** Concatenate several batches into one: partitions are tagged with
    * their source batch and the factory dispatches per partition. Used
    * when one logical scan needs per-file-group reader behavior (e.g.
    * distinct pending-delete residuals per group).
    */
  def concatBatches(batches: Seq[Batch]): Batch = new Batch {
    private lazy val planned: Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, i) =>
        b.planInputPartitions().map(p => TaggedPartition(i, p): InputPartition)
      }.toArray
    override def planInputPartitions(): Array[InputPartition] = planned
    override def createReaderFactory(): PartitionReaderFactory = {
      val fs = batches.map(_.createReaderFactory()).toArray
      // Spark refuses a scan MIXING columnar and row partitions, so
      // the combined factory answers uniformly: columnar iff EVERY
      // planned partition's sub-factory can serve it (one row-only
      // group — e.g. a $file tag — drops the whole scan to rows)
      val allColumnar = planned.forall {
        case t: TaggedPartition => fs(t.idx).supportColumnarReads(t.inner)
        case _ => false
      }
      new DispatchingReaderFactory(fs, allColumnar)
    }
  }

  /** Unload every loaded state-store provider (`private[sql]`) — used
    * by the termination listener that releases stopped streaming
    * queries' providers (see graft.spark.GraftStateStoreUnloadListener).
    */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}

private class DerivingWriterFactory(
    delegate: org.apache.spark.sql.connector.write.DataWriterFactory,
    attrs: Seq[AttributeReference],
    extra: Seq[Expression])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val inner = delegate.createWriter(partitionId, taskId)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(attrs ++ extra, attrs)
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = inner.write(proj(r))
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
        inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}

/** A partition carrying the index of the sub-batch it came from. */
case class TaggedPartition(idx: Int, inner: InputPartition)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private class DispatchingReaderFactory(
    factories: Array[PartitionReaderFactory],
    // uniform verdict computed over ALL planned partitions by the
    // caller — Spark refuses a scan mixing columnar and row partitions
    allColumnar: Boolean) extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = allColumnar
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val t = p.asInstanceOf[TaggedPartition]
    factories(t.idx).createReader(t.inner)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val t = p.asInstanceOf[TaggedPartition]
    factories(t.idx).createColumnarReader(t.inner)
  }
}

/** Filters rows by a bound predicate and projects survivors to the
  * first `keepN` attributes (predicate-only columns are read but not
  * returned).
  */
private class RowFilteredReaderFactory(
    delegate: PartitionReaderFactory,
    cond: Expression,
    attrs: IndexedSeq[AttributeReference],
    keepN: Int) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(p)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val inner = delegate.createColumnarReader(p)
    val pred = org.apache.spark.sql.catalyst.expressions.Predicate
      .create(cond, attrs)
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        while (inner.next()) {
          val b = inner.get()
          val total = b.numRows()
          val sel = new Array[Int](total)
          var n = 0
          var i = 0
          while (i < total) {
            if (pred.eval(b.getRow(i))) { sel(n) = i; n += 1 }
            i += 1
          }
          if (n > 0) {
            batch =
              if (n == total) SelectedColumnVector.project(b, keepN)
              else SelectedColumnVector.select(b,
                java.util.Arrays.copyOf(sel, n), n, keepN)
            return true
          }
        }
        false
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    val pred = org.apache.spark.sql.catalyst.expressions.Predicate
      .create(cond, attrs)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(attrs.take(keepN), attrs)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (pred.eval(r)) { row = r; return true }
        }
        false
      }
      override def get(): InternalRow = proj(row)
      override def close(): Unit = inner.close()
    }
  }
}

/** One file's partition in a change-capture delete read: the data file
  * plus the PARENT's delete objects referencing it (rows already gone
  * before the change) and the NEW snapshot's objects (the rows being
  * deleted — what CDC emits).
  */
case class CdcPartition(inner: FilePartition, dataFile: String,
    parentDels: Array[String], newDels: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Emits exactly the rows [[SparkInternals.cdcDeleteBatch]] specifies.
  * Columnar-capable: survivors remap through a selection-vector view
  * ([[SelectedColumnVector]]) like the merge-on-read scan factories,
  * so deriving deleted rows for a change feed stays vectorized.
  */
private class CdcDeleteReaderFactory(
    delegate: PartitionReaderFactory,
    cond: Expression,
    conf: SerializableConfiguration,
    inputSchema: StructType,
    rixOrdinal: Int,
    keepN: Int) extends PartitionReaderFactory {

  private def innerOf(p: InputPartition): InputPartition = p match {
    case cp: CdcPartition => cp.inner
    case other => other
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(innerOf(p))

  private def deleteSets(cp: CdcPartition)
      : (java.util.HashSet[java.lang.Long], java.util.HashSet[java.lang.Long]) = (
    if (cp.parentDels.isEmpty) null
    else graft.format.PosDeleteFiles.positionsFor(
      cp.parentDels.toSeq, cp.dataFile, conf.value),
    if (cp.newDels.isEmpty) null
    else graft.format.PosDeleteFiles.positionsFor(
      cp.newDels.toSeq, cp.dataFile, conf.value))

  private def attrs = inputSchema.fields.toIndexedSeq.map(f =>
    AttributeReference(f.name, f.dataType, f.nullable)())

  /** cond was authored against caller-side attributes (serialized by
    * value) — rebind by NAME to this reader's attrs before binding by
    * ordinal.
    */
  private def boundPred(as: IndexedSeq[AttributeReference])
      : org.apache.spark.sql.catalyst.expressions.BasePredicate = {
    val bound = cond.transform {
      case a: AttributeReference => as.find(_.name == a.name).getOrElse(a)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        as.find(_.name == u.nameParts.last).getOrElse(
          throw new IllegalArgumentException(
            s"unknown column in change predicate: ${u.nameParts.mkString(".")}"))
    }
    org.apache.spark.sql.catalyst.expressions.Predicate.create(bound, as)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val cp = p.asInstanceOf[CdcPartition]
    val inner = delegate.createColumnarReader(cp.inner)
    val (parentSet, newSet) = deleteSets(cp)
    val pred = boundPred(attrs)
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        while (inner.next()) {
          val b = inner.get()
          val total = b.numRows()
          val rixCol = b.column(rixOrdinal)
          val sel = new Array[Int](total)
          var n = 0
          var i = 0
          while (i < total) {
            val rix = rixCol.getLong(i)
            if ((parentSet == null || !parentSet.contains(rix)) &&
                (newSet == null || newSet.contains(rix)) &&
                pred.eval(b.getRow(i))) {
              sel(n) = i; n += 1
            }
            i += 1
          }
          if (n > 0) {
            batch =
              if (n == total) SelectedColumnVector.project(b, keepN)
              else SelectedColumnVector.select(b,
                java.util.Arrays.copyOf(sel, n), n, keepN)
            return true
          } // nothing deleted in this batch: keep draining the delegate
        }
        false
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CdcPartition]
    val inner = delegate.createReader(cp.inner)
    val (parentSet, newSet) = deleteSets(cp)
    val as = attrs
    val pred = boundPred(as)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(as.take(keepN), as)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          val rix = r.getLong(rixOrdinal)
          if (pred.eval(r) &&
              (parentSet == null || !parentSet.contains(rix)) &&
              (newSet == null || newSet.contains(rix))) {
            row = r; return true
          }
        }
        false
      }
      override def get(): InternalRow = proj(row)
      override def close(): Unit = inner.close()
    }
  }
}

/** One covered file's partition in a position-delete read: the single
  * data file plus the delete objects that reference it.
  */
case class PosDeletePartition(inner: FilePartition, dataFile: String,
    deleteFiles: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Drops rows whose row-index is in the partition's deleted-position
  * set; uncovered partitions pass through (minus the projection).
  * Files with PENDING position deletes keep the COLUMNAR read when the
  * delegate offers one — survivors remap through a selection-vector
  * view ([[SelectedColumnVector]]); a rewrite/compaction returns them
  * to the plain vectorized path.
  */
private class PosDeleteReaderFactory(
    delegate: PartitionReaderFactory,
    conf: SerializableConfiguration,
    inputSchema: StructType,
    rixOrdinal: Int,
    keepN: Int) extends PartitionReaderFactory {

  private def innerOf(p: InputPartition): InputPartition = p match {
    case pd: PosDeletePartition => pd.inner
    case other => other
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(innerOf(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val (inner, dels) = p match {
      case pd: PosDeletePartition =>
        (delegate.createColumnarReader(pd.inner),
          graft.format.PosDeleteFiles.positionsFor(
            pd.deleteFiles.toSeq, pd.dataFile, conf.value))
      case other => (delegate.createColumnarReader(other), null)
    }
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        while (inner.next()) {
          val b = inner.get()
          if (dels == null) {
            batch = SelectedColumnVector.project(b, keepN)
            return true
          }
          val total = b.numRows()
          val rix = b.column(rixOrdinal)
          val sel = new Array[Int](total)
          var n = 0
          var i = 0
          while (i < total) {
            if (!dels.contains(rix.getLong(i))) { sel(n) = i; n += 1 }
            i += 1
          }
          if (n > 0) {
            batch =
              if (n == total) SelectedColumnVector.project(b, keepN)
              else SelectedColumnVector.select(b,
                java.util.Arrays.copyOf(sel, n), n, keepN)
            return true
          } // a fully-deleted batch: keep draining the delegate
        }
        false
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (inner, dels) = p match {
      case pd: PosDeletePartition =>
        (delegate.createReader(pd.inner),
          graft.format.PosDeleteFiles.positionsFor(
            pd.deleteFiles.toSeq, pd.dataFile, conf.value))
      case other => (delegate.createReader(other), null)
    }
    val attrs = inputSchema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val proj =
      if (keepN == attrs.length) null
      else org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(attrs.take(keepN), attrs)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (dels == null || !dels.contains(r.getLong(rixOrdinal))) {
            row = r; return true
          }
        }
        false
      }
      override def get(): InternalRow = if (proj == null) row else proj(row)
      override def close(): Unit = inner.close()
    }
  }
}

/** A [[ColumnVector]] view remapping row ids through a selection array
  * (the surviving row indices of a merge-on-read filter): `get*(i)`
  * reads `child.get*(sel(i))`. Children wrap lazily with the SAME
  * selection, so nested structs/arrays resolve correctly. The child
  * vectors stay owned by the delegate batch — `close()` is a no-op —
  * and a new view costs one small object per batch, never a copy of
  * the data.
  */
private class SelectedColumnVector(
    child: ColumnVector,
    sel: Array[Int]) extends ColumnVector(child.dataType()) {
  private var kids: Array[ColumnVector] = _

  override def close(): Unit = () // vectors belong to the delegate batch
  override def hasNull: Boolean = child.hasNull
  override def numNulls: Int = child.numNulls // upper bound — per-row
  //                                             isNullAt is authoritative
  override def isNullAt(i: Int): Boolean = child.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = child.getBoolean(sel(i))
  override def getByte(i: Int): Byte = child.getByte(sel(i))
  override def getShort(i: Int): Short = child.getShort(sel(i))
  override def getInt(i: Int): Int = child.getInt(sel(i))
  override def getLong(i: Int): Long = child.getLong(sel(i))
  override def getFloat(i: Int): Float = child.getFloat(sel(i))
  override def getDouble(i: Int): Double = child.getDouble(sel(i))
  override def getDecimal(i: Int, p: Int, s: Int)
      : org.apache.spark.sql.types.Decimal = child.getDecimal(sel(i), p, s)
  override def getUTF8String(i: Int): UTF8String =
    child.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = child.getBinary(sel(i))
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    child.getArray(sel(i))
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    child.getMap(sel(i))
  override def getChild(ordinal: Int): ColumnVector = {
    if (kids == null) kids = new Array[ColumnVector](ordinal + 1)
    else if (kids.length <= ordinal)
      kids = java.util.Arrays.copyOf(kids, ordinal + 1)
    if (kids(ordinal) == null)
      kids(ordinal) = new SelectedColumnVector(child.getChild(ordinal), sel)
    kids(ordinal)
  }
}

private object SelectedColumnVector {
  /** The delegate batch filtered to `sel`'s first `n` rows and
    * projected to its first `keepN` columns — a zero-copy view.
    */
  def select(b: ColumnarBatch, sel: Array[Int], n: Int,
      keepN: Int): ColumnarBatch =
    new ColumnarBatch(Array.tabulate[ColumnVector](keepN)(i =>
      new SelectedColumnVector(b.column(i), sel)), n)

  /** The delegate batch projected to its first `keepN` columns. */
  def project(b: ColumnarBatch, keepN: Int): ColumnarBatch =
    if (keepN == b.numCols) b
    else new ColumnarBatch(Array.tabulate[ColumnVector](keepN)(b.column),
      b.numRows())
}

/** Drops rows whose key tuple is in any of the partition's equality-
  * delete sets. Files with PENDING equality deletes keep the COLUMNAR
  * read when the delegate offers one: surviving rows remap through a
  * selection-vector view ([[SelectedColumnVector]]) instead of
  * dropping to row-at-a-time; compaction still returns them to the
  * plain vectorized path.
  */
private class EqDeleteReaderFactory(
    delegate: PartitionReaderFactory,
    specs: Array[SparkInternals.EqDeleteSpec],
    conf: SerializableConfiguration,
    inputSchema: StructType,
    keepN: Int,
    // false: drop matching rows (the scan's anti filter); true: emit
    // ONLY matching rows (the CDC semi filter — "which rows died")
    keepMatches: Boolean = false) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(p)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val inner = delegate.createColumnarReader(p)
    val sets = specs.map(s => graft.format.EqDeleteFiles.keySet(
      s.abs, s.cols, s.types.toSeq, conf.value))
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        while (inner.next()) {
          val b = inner.get()
          val total = b.numRows()
          val sel = new Array[Int](total)
          var n = 0
          var i = 0
          while (i < total) {
            val r = b.getRow(i)
            var hit = false
            var j = 0
            while (!hit && j < specs.length) {
              hit = sets(j).contains(graft.format.EqDeleteFiles.rowKey(
                r, specs(j).ordinals, specs(j).types))
              j += 1
            }
            if (hit == keepMatches) { sel(n) = i; n += 1 }
            i += 1
          }
          if (n > 0) {
            batch =
              if (n == total) SelectedColumnVector.project(b, keepN)
              else SelectedColumnVector.select(b,
                java.util.Arrays.copyOf(sel, n), n, keepN)
            return true
          } // a fully-deleted batch: keep draining the delegate
        }
        false
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    // loaded at reader creation (executor-side); the per-JVM soft cache
    // in EqDeleteFiles makes this one parquet read per executor, not
    // per task
    val sets = specs.map(s => graft.format.EqDeleteFiles.keySet(
      s.abs, s.cols, s.types.toSeq, conf.value))
    val attrs = inputSchema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val proj =
      if (keepN == attrs.length) null
      else org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(attrs.take(keepN), attrs)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          var hit = false
          var i = 0
          while (!hit && i < specs.length) {
            hit = sets(i).contains(graft.format.EqDeleteFiles.rowKey(
              r, specs(i).ordinals, specs(i).types))
            i += 1
          }
          if (hit == keepMatches) { row = r; return true }
        }
        false
      }
      override def get(): InternalRow = if (proj == null) row else proj(row)
      override def close(): Unit = inner.close()
    }
  }
}

/** Projects every row of the delegate to `outAttrs` (a permutation of
  * `attrs`). Partitions pass through untouched — only the reader is
  * wrapped, so file-granular wrappers above still see FilePartitions.
  */
private class ReorderingReaderFactory(
    delegate: PartitionReaderFactory,
    attrs: Seq[AttributeReference],
    outAttrs: Seq[AttributeReference]) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(p)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val inner = delegate.createColumnarReader(p)
    // a column permutation needs no row work at all
    val perm = outAttrs.map(o => attrs.indexWhere(_.exprId == o.exprId))
      .toArray
    require(perm.forall(_ >= 0), "reorder target not in delegate output")
    new PartitionReader[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        val has = inner.next()
        if (has) {
          val b = inner.get()
          batch = new ColumnarBatch(perm.map(b.column), b.numRows())
        }
        has
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(outAttrs, attrs)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = proj(inner.get())
      override def close(): Unit = inner.close()
    }
  }
}

/** One storage partition of a key-grouped scan: a set of files sharing
  * one Hive-partition value tuple, reporting that tuple as the
  * partition key so Spark's storage-partitioned join machinery can
  * co-locate both sides without a shuffle.
  */
case class KeyedFilePartition(key: InternalRow, inner: FilePartition)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Wraps the delegate parquet reader factory, appending the partition's
  * (single) file path as a constant column — vectorized batches get a
  * [[ConstantColumnVector]], row readers a [[JoinedRow]]; both keep the
  * delegate's reading untouched.
  */
private class FileTaggedReaderFactory(
    delegate: PartitionReaderFactory,
    tagOrdinal: Int) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(p)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val tag = InternalRow(UTF8String.fromString(SparkInternals.partitionFilePath(p)))
    val inner = delegate.createReader(p)
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = joined(inner.get(), tag)
      override def close(): Unit = inner.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val path = UTF8String.fromString(SparkInternals.partitionFilePath(p))
    val inner = delegate.createColumnarReader(p)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = inner.next()
      override def get(): ColumnarBatch = {
        val b = inner.get()
        val vec = new ConstantColumnVector(b.numRows(), StringType)
        vec.setUtf8String(path)
        val cols = Array.tabulate[ColumnVector](tagOrdinal + 1) { i =>
          if (i < tagOrdinal) b.column(i) else vec
        }
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = inner.close()
    }
  }
}
