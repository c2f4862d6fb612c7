package graft.serve

import java.nio.file.Files

import graft.format.{EqDeleteFile, PosDeleteFile}
import graft.storage.StorageOps
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Transcodes graft's native delete objects into the EXACT parquet
  * shapes the PUBLIC Apache Iceberg v2 table spec prescribes for
  * delete files, so the REST facade can serve pending merge-on-read
  * state as real delete manifests ([[IcebergManifests]]).
  *
  * Position deletes: graft stores `(file STRING, pos BIGINT)` with the
  * data file's scan-rendered filesystem path
  * ([[graft.format.PosDeleteFiles]]); Iceberg prescribes columns
  * `file_path` (reserved field id 2147483546) and `pos` (2147483545)
  * whose values must match the data files' `file_path` as planned from
  * the manifests — i.e. `storage.absolute`. The transcode renames the
  * columns, stamps the reserved ids, and maps each path onto the
  * absolute form by its storage-relative suffix (the two renderings
  * coincide on a filesystem backend and differ only in scheme prefix
  * on object stores).
  *
  * Equality deletes: graft already writes the key tuples as native
  * parquet under the physical column names
  * ([[graft.format.EqDeleteFiles]]); Iceberg additionally requires
  * each column to carry the TABLE schema's field id so engines match
  * deletes to columns by id. The transcode re-writes the same values
  * with ids attached.
  *
  * Both run server-side through plain parquet-mr (delete objects are
  * KB-scale key/position sets — the data plane's gigabyte parquet is
  * never rewritten), once per immutable source object.
  */
object IcebergDeleteObjects {

  /** Iceberg reserved field ids for position-delete columns. */
  val FilePathFieldId = 2147483546L.toInt // spec: 2147483546
  val PosFieldId = 2147483545L.toInt // spec: 2147483545

  private def conf = new Configuration(false)

  /** Writes records through parquet-mr into a temp file, returns its
    * bytes (delete objects are small; the caller persists them through
    * storage's atomic create).
    */
  private def writeToBytes(schema: MessageType)(
      emit: (SimpleGroupFactory, Group => Unit) => Unit): Array[Byte] = {
    val tmp = Files.createTempFile("graft-iceberg-del", ".parquet")
    Files.delete(tmp) // parquet-mr refuses to overwrite
    try {
      val c = conf
      GroupWriteSupport.setSchema(schema, c)
      val writer = ExampleParquetWriter.builder(new Path(tmp.toString))
        .withConf(c)
        .withType(schema)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
      try emit(new SimpleGroupFactory(schema), writer.write)
      finally writer.close()
      Files.readAllBytes(tmp)
    } finally Files.deleteIfExists(tmp)
  }

  private def readGroups(local: String)(f: Group => Unit): Unit = {
    val reader = ParquetReader
      .builder[Group](new GroupReadSupport(), new Path(local))
      .withConf(conf)
      .build()
    try {
      var g = reader.read()
      while (g != null) { f(g); g = reader.read() }
    } finally reader.close()
  }

  private val posDeleteSchema: MessageType = PTypes.buildMessage()
    .addField(PTypes.required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).id(FilePathFieldId)
      .named("file_path"))
    .addField(PTypes.required(PrimitiveTypeName.INT64)
      .id(PosFieldId).named("pos"))
    .named("iceberg_position_delete")

  /** Spec-shaped position-delete parquet from one graft delete object. */
  def transcodePosDelete(storage: StorageOps,
      pd: PosDeleteFile): Array[Byte] = {
    // scan-rendered path → manifest-planned absolute path, matched by
    // the storage-relative suffix (unique: relative paths are rooted
    // at the catalog prefix)
    val rels = pd.dataFiles
    // an unresolvable reference means the served delete would name a
    // path no planned data file carries — deleted rows would silently
    // resurrect in the external engine. Refuse the load instead (the
    // same loud posture the facade takes for unservable shapes).
    def resolve(rendered: String): String =
      rels.find(rel => rendered == rel || rendered.endsWith("/" + rel) ||
          rendered == storage.absolute(rel))
        .map(storage.absolute)
        .getOrElse(throw new IllegalStateException(
          s"position-delete object ${pd.path} references $rendered, " +
            "which resolves to none of its declared data files"))
    val local = storage.prepareToReadLocal(pd.path).toString
    writeToBytes(posDeleteSchema) { (factory, write) =>
      readGroups(local) { g =>
        val out = factory.newGroup()
        out.append("file_path", resolve(g.getString("file", 0)))
        out.append("pos", g.getLong("pos", 0))
        write(out)
      }
    }
  }

  /** One per-partition split of a transcoded position-delete object:
    * `partition` holds the identity values (None = null) of the data
    * files the split's rows reference, in partition-column order.
    */
  final case class PosSplit(idx: Int, partition: Seq[Option[Any]],
      rows: Long, bytes: Array[Byte])

  /** Transcode one position-delete object SPLIT BY PARTITION: a delete
    * file in a partitioned Iceberg table carries a partition tuple and
    * applies within it, so an object referencing data files of several
    * partitions becomes one spec-shaped object per partition, each
    * stamped with that partition's values. Split indices are stable
    * across loads (groups order by their canonical tuple rendering),
    * so derived keys stay deterministic and idempotent.
    */
  def transcodePosDeleteSplits(storage: StorageOps, pd: PosDeleteFile,
      partCols: Seq[(String, DataType)]): Seq[PosSplit] = {
    val rels = pd.dataFiles
    def resolveRel(rendered: String): Option[String] =
      rels.find(rel => rendered == rel || rendered.endsWith("/" + rel) ||
        rendered == storage.absolute(rel))
    def tupleOf(rel: String): Seq[Option[Any]] =
      partCols.map { case (n, t) =>
        IcebergManifests.partitionValue(rel, n, t)
      }
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Seq[Option[Any]])]
    val local = storage.prepareToReadLocal(pd.path).toString
    readGroups(local) { g =>
      val rendered = g.getString("file", 0)
      // same loud posture as [[transcodePosDelete]]: an unresolvable
      // reference would split under an all-null partition tuple and
      // never apply in the external engine
      val rel = resolveRel(rendered).getOrElse(
        throw new IllegalStateException(
          s"position-delete object ${pd.path} references $rendered, " +
            "which resolves to none of its declared data files"))
      rows += ((storage.absolute(rel), g.getLong("pos", 0), tupleOf(rel)))
    }
    rows.groupBy(_._3).toSeq
      .sortBy(_._1.map(_.map(_.toString).getOrElse("\u0000")).mkString("|"))
      .zipWithIndex
      .map { case ((tuple, rs), i) =>
        val bytes = writeToBytes(posDeleteSchema) { (factory, write) =>
          rs.foreach { case (fp, pos, _) =>
            val out = factory.newGroup()
            out.append("file_path", fp)
            out.append("pos", pos)
            write(out)
          }
        }
        PosSplit(i, tuple, rs.size.toLong, bytes)
      }
  }

  /** Materialize pending PREDICATE deletes as one native-shaped
    * position-delete parquet (`file`/`pos`, sorted): Iceberg has no
    * predicate-delete analog, so the facade scans the in-scope data
    * files ONCE — a distributed Spark job, each predicate applied only
    * to the files whose entry sequence it covers — and renders the
    * deleted row positions. The result then rides the exact same
    * transcode + per-partition-split machinery as a native
    * position-delete object. Row volume is the honest cost of the
    * representation change (a sparse DELETE stays KB-scale; Iceberg
    * engines materialize their own position deletes the same way).
    * The result lands at `destRel` as a derived storage object —
    * executors write it, the driver only moves the finished part file
    * into place, so the object size is bounded by storage, not the
    * driver heap.
    */
  def materializePredicateDeletes(
      spark: org.apache.spark.sql.SparkSession, storage: StorageOps,
      files: Seq[graft.format.DataFileEntry],
      preds: Seq[graft.format.DeletePredicate], destRel: String): Unit = {
    import org.apache.spark.sql.functions._
    // group by applicable predicate set: a predicate with sequence S
    // covers exactly the files with entry.seq <= S
    val groups = files.map(f => f -> preds.filter(_.seq >= f.seq))
      .filter(_._2.nonEmpty)
      .groupBy(_._2).toSeq
    val dfs = groups.map { case (ps, fs) =>
      // deleted = ANY applicable predicate TRUE (NULL keeps the row)
      val deleted = ps.map(p => coalesce(expr(p.sql), lit(false)))
        .reduce(_ || _)
      spark.read.parquet(fs.map(f => storage.absolute(f._1.path)): _*)
        .where(deleted)
        .select(col("_metadata.file_path").as("file"),
          col("_metadata.row_index").as("pos"))
    }
    dfs.reduceOption(_ unionAll _) match {
      case None =>
        try storage.writeAtomic(destRel,
          writeToBytes(graft.format.PosDeleteFiles.Schema)((_, _) => ()))
        catch { case _: graft.storage.AtomicSealFailureException => () }
      case Some(df) => writeSingleSorted(storage, df, destRel)
    }
  }

  /** One shuffle into a single (file, pos)-sorted partition, written by
    * the executor's vectorized parquet writer into a STORAGE-side
    * scratch prefix, then MOVED to the destination — the driver never
    * iterates the positions and never holds the finished object in
    * memory (a billion-row predicate delete stays off the driver heap),
    * and the scratch lives under the shared warehouse location so this
    * works when executors do not share the driver's local filesystem.
    */
  private def writeSingleSorted(storage: StorageOps,
      df: org.apache.spark.sql.DataFrame, destRel: String): Unit = {
    val scratch = s"$destRel.tmp-${java.util.UUID.randomUUID()}"
    try {
      df.repartition(1).sortWithinPartitions("file", "pos")
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(storage.absolute(scratch))
      val parts = storage.listDeep(scratch)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      require(parts.size == 1,
        s"expected one materialized delete part file, got $parts")
      // a racing request may have materialized the SAME snapshot's
      // deletes first (the caller's exists-check is TOCTOU) — the
      // content is deterministic, so losing the move is success
      try storage.move(parts.head, destRel)
      catch {
        case e: Exception =>
          if (!storage.exists(destRel)) throw e
      }
    } finally {
      try storage.deleteTree(scratch) catch { case _: Exception => () }
    }
  }

  /** Batched [[materializePredicateDeletes]]: several snapshots'
    * pending-predicate objects from ONE distributed scan. Every data
    * file referenced by any request is read once, with every predicate
    * that can apply to it (`p.seq >= f.seq` — intrinsic to the (file,
    * predicate) pair, not to the requesting snapshot) evaluated as a
    * bit column; the surviving (file, pos, bits) rows are persisted and
    * each request's object is a filter over its own predicates' bits
    * plus a broadcast semi-join against its own file list (snapshots
    * share files but need not be nested — compaction drops files). The
    * per-request write is unchanged, so downstream transcode sees
    * byte-identical objects.
    */
  def materializePredicateDeleteSets(
      spark: org.apache.spark.sql.SparkSession, storage: StorageOps,
      requests: Seq[(String, Seq[graft.format.DataFileEntry],
        Seq[graft.format.DeletePredicate])]): Unit = {
    import org.apache.spark.sql.functions._
    requests match {
      case Seq() => ()
      case Seq((dest, fs, ps)) =>
        materializePredicateDeletes(spark, storage, fs, ps, dest)
      case _ =>
        val preds = requests.flatMap(_._3).distinct
        val bit = preds.zipWithIndex
          .map { case (p, i) => p -> s"_p$i" }.toMap
        val files = requests.flatMap(_._2)
          .groupBy(_.path).map(_._2.head).toSeq
        val groups = files.map(f => f -> preds.filter(_.seq >= f.seq))
          .filter(_._2.nonEmpty)
          .groupBy(_._2).toSeq
        val dfs = groups.map { case (ps, fs) =>
          val bits = preds.map(p =>
            (if (ps.contains(p)) coalesce(expr(p.sql), lit(false))
             else lit(false)).as(bit(p)))
          spark.read.parquet(fs.map(f => storage.absolute(f._1.path)): _*)
            .select(col("_metadata.file_path").as("file") +:
              col("_metadata.row_index").as("pos") +: bits: _*)
            .where(ps.map(p => col(bit(p))).reduce(_ || _))
        }
        val rows = dfs.reduceOption(_ unionAll _) match {
          case None =>
            requests.foreach { case (dest, _, _) =>
              try storage.writeAtomic(dest,
                writeToBytes(graft.format.PosDeleteFiles.Schema)((_, _) => ()))
              catch { case _: graft.storage.AtomicSealFailureException => () }
            }
            return
          case Some(df) => df
            // the rendered file_path and the entry path differ by URI
            // scheme; normalize once for the per-request membership join
            .withColumn("_nf", regexp_replace(col("file"), "^file:/+", "/"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        try requests.foreach { case (dest, fs, ps) =>
          val mine = ps.map(p => col(bit(p))).reduce(_ || _)
          val myFiles = fs
            .map(f => Tuple1(Path.getPathWithoutSchemeAndAuthority(
              new Path(storage.absolute(f.path))).toString))
          val fdf = spark.createDataFrame(myFiles).toDF("_nf")
          writeSingleSorted(storage,
            rows.where(mine)
              .join(broadcast(fdf), Seq("_nf"), "left_semi")
              .select(col("file"), col("pos")),
            dest)
        } finally rows.unpersist(false)
    }
  }

  /** Footer row count of one storage parquet object (no data read). */
  def parquetRowCount(storage: StorageOps, rel: String): Long = {
    val local = storage.prepareToReadLocal(rel).toString
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(local), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Field-id-annotated equality-delete parquet from one graft key
    * object; `fieldIdOf` maps a physical column name onto the served
    * Iceberg schema's id (`equality_ids` in the manifest entry lists
    * the same ids).
    */
  /** Table field for a native key object's PHYSICAL column name —
    * renames are metadata-only, so the object's on-file name can
    * differ from the current logical one; the served delete must
    * carry the LOGICAL name and id external engines know.
    */
  private[serve] def fieldForPhysical(schema: StructType,
      phys: String): org.apache.spark.sql.types.StructField =
    schema.fields
      .find(f => graft.spark.ColumnMapping.physicalName(f) == phys)
      .orElse(schema.fields.find(_.name == phys))
      .getOrElse(throw new IllegalStateException(
        s"equality-delete key column $phys missing from table schema"))

  def transcodeEqDelete(storage: StorageOps, ed: EqDeleteFile,
      tableSchema: StructType, fieldIdOf: String => Int): Array[Byte] = {
    val fields = ed.cols.map(fieldForPhysical(tableSchema, _))
    val types = fields.map(_.dataType)
    val b = PTypes.buildMessage()
    fields.foreach { f =>
      val id = fieldIdOf(f.name)
      f.dataType match {
        case ByteType | ShortType | IntegerType =>
          b.addField(PTypes.optional(PrimitiveTypeName.INT32).id(id)
            .named(f.name))
        case DateType =>
          b.addField(PTypes.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).id(id).named(f.name))
        case LongType =>
          b.addField(PTypes.optional(PrimitiveTypeName.INT64).id(id)
            .named(f.name))
        case BooleanType =>
          b.addField(PTypes.optional(PrimitiveTypeName.BOOLEAN).id(id)
            .named(f.name))
        case _ =>
          b.addField(PTypes.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).id(id).named(f.name))
      }
    }
    val schema = b.named("iceberg_equality_delete")
    val local = storage.prepareToReadLocal(ed.path).toString
    writeToBytes(schema) { (factory, write) =>
      readGroups(local) { g =>
        val out = factory.newGroup()
        // read by the object's PHYSICAL name, emit the LOGICAL one
        ed.cols.indices.foreach { i =>
          val c = ed.cols(i)
          if (g.getFieldRepetitionCount(c) > 0) types(i) match {
            case ByteType | ShortType | IntegerType | DateType =>
              out.append(fields(i).name, g.getInteger(c, 0))
            case LongType => out.append(fields(i).name, g.getLong(c, 0))
            case BooleanType => out.append(fields(i).name, g.getBoolean(c, 0))
            case _ => out.append(fields(i).name, g.getString(c, 0))
          }
        }
        write(out)
      }
    }
  }
}
