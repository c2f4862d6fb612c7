package graft.serve

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.format.{DataFileEntry, EqDeleteFile, Manifests, PosDeleteFile,
  Snapshot, TableMetadata}
import graft.storage.{AtomicSealFailureException, StorageOps}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._

/** Real Iceberg v2 manifest files (avro) derived from graft's snapshot
  * log, so an external Iceberg engine that loads a table through the
  * REST facade plans the ACTUAL file inventory instead of silently
  * planning zero files. Schemas follow the PUBLIC Apache Iceberg table
  * spec (format-version 2): `manifest_file` entries in a per-snapshot
  * manifest list, `manifest_entry`/`data_file` records in the
  * manifests, every field carrying its spec-assigned `field-id`.
  *
  * Layout maps graft's segment structure 1:1 — one avro manifest per
  * immutable graft manifest segment (written once, shared by every
  * snapshot referencing the segment, exactly like the JSON segments
  * themselves) plus one small manifest for a snapshot's inline
  * entries. Serving a 10⁵-file table's history therefore writes
  * O(segments + snapshots) bounded objects, not O(snapshots × files).
  *
  * Pending merge-on-read state serves as REAL v2 delete manifests:
  * position-delete objects transcode once into spec-shaped parquet
  * (`file_path`/`pos` with the reserved field ids) and equality-delete
  * objects into field-id-annotated parquet, then a per-snapshot delete
  * manifest (`manifest_file.content = 1`) carries entries of
  * `data_file.content` 1 (position) and 2 (equality, with
  * `equality_ids`). Sequence numbers map 1:1 — graft scopes equality
  * deletes exactly like Iceberg (applies to data files with
  * `data seq < delete seq`), and position deletes match by exact
  * (path, pos) so their sequence stamp only needs to dominate the
  * referenced files' (it does by construction: a delta commit's
  * sequence is later than every file it read). On partitioned tables
  * position-delete objects split per referenced partition (entries
  * carry the partition tuple) and equality-delete manifests ride an
  * unpartitioned spec (global application). Predicate deletes have no
  * Iceberg analog; when a co-located Spark session exists they
  * MATERIALIZE into position-delete objects (one in-scope scan per
  * snapshot) and serve the same way — only a bare metadata server
  * still refuses them upstream.
  *
  * Lineage: every manifest entry carries the snapshot that actually
  * ADDED its file (recovered from the entry's commit sequence), with
  * `status = EXISTING` for entries inherited from ancestor snapshots —
  * so an external engine's incremental/changelog scan attributes files
  * to the right commits, not to whichever snapshot first got served.
  */
object IcebergManifests {

  // ---- avro schema construction (field-id props per Iceberg spec) ----

  private def fld(name: String, id: Int, s: Schema,
      optional: Boolean = false): Schema.Field = {
    val (sch, dflt) =
      if (optional)
        (Schema.createUnion(Schema.create(Schema.Type.NULL), s),
          Schema.Field.NULL_DEFAULT_VALUE)
      else (s, null)
    val f = new Schema.Field(name, sch, null, dflt)
    f.addProp("field-id", id: Integer)
    f
  }

  private def prim(t: Schema.Type) = Schema.create(t)

  /** Iceberg identity-partition struct (record r102): one optional
    * field per partition column, ids 1000+i per the spec's partition
    * field-id space.
    */
  private def partitionSchema(cols: Seq[(String, DataType)]): Schema = {
    val fields = cols.zipWithIndex.map { case ((name, dt), i) =>
      val t = dt match {
        case IntegerType | ShortType | ByteType => prim(Schema.Type.INT)
        case LongType => prim(Schema.Type.LONG)
        case DateType =>
          val d = prim(Schema.Type.INT); d.addProp("logicalType", "date"); d
        case _ => prim(Schema.Type.STRING)
      }
      fld(name, 1000 + i, t, optional = true)
    }
    Schema.createRecord("r102", null, null, false, fields.asJava)
  }

  private def dataFileSchema(part: Schema): Schema = {
    val eqIds = Schema.createArray(prim(Schema.Type.INT))
    eqIds.addProp("element-id", 136: Integer)
    Schema.createRecord("r2", null, null, false, Seq(
      fld("content", 134, prim(Schema.Type.INT)),
      fld("file_path", 100, prim(Schema.Type.STRING)),
      fld("file_format", 101, prim(Schema.Type.STRING)),
      fld("partition", 102, part),
      fld("record_count", 103, prim(Schema.Type.LONG)),
      fld("file_size_in_bytes", 104, prim(Schema.Type.LONG)),
      fld("equality_ids", 135, eqIds, optional = true)).asJava)
  }

  private def manifestEntrySchema(part: Schema): Schema =
    Schema.createRecord("manifest_entry", null, null, false, Seq(
      fld("status", 0, prim(Schema.Type.INT)),
      fld("snapshot_id", 1, prim(Schema.Type.LONG), optional = true),
      fld("sequence_number", 3, prim(Schema.Type.LONG), optional = true),
      fld("file_sequence_number", 4, prim(Schema.Type.LONG), optional = true),
      fld("data_file", 2, dataFileSchema(part))).asJava)

  private val manifestFileSchema: Schema =
    Schema.createRecord("manifest_file", null, null, false, Seq(
      fld("manifest_path", 500, prim(Schema.Type.STRING)),
      fld("manifest_length", 501, prim(Schema.Type.LONG)),
      fld("partition_spec_id", 502, prim(Schema.Type.INT)),
      fld("content", 517, prim(Schema.Type.INT)),
      fld("sequence_number", 515, prim(Schema.Type.LONG)),
      fld("min_sequence_number", 516, prim(Schema.Type.LONG)),
      fld("added_snapshot_id", 503, prim(Schema.Type.LONG)),
      fld("added_data_files_count", 504, prim(Schema.Type.INT)),
      fld("existing_data_files_count", 505, prim(Schema.Type.INT)),
      fld("deleted_data_files_count", 506, prim(Schema.Type.INT)),
      fld("added_rows_count", 512, prim(Schema.Type.LONG)),
      fld("existing_rows_count", 513, prim(Schema.Type.LONG)),
      fld("deleted_rows_count", 514, prim(Schema.Type.LONG))).asJava)

  // ---- avro file writing (to storage, via bytes) ----

  private def writeAvro(schema: Schema, records: Seq[GenericRecord],
      fileMeta: Map[String, String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    fileMeta.foreach { case (k, v) =>
      w.setMeta(k, v.getBytes(StandardCharsets.UTF_8))
    }
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    out.toByteArray
  }

  /** Create-if-absent where losing the creation race IS success: every
    * derived object is written at a deterministic key from immutable
    * inputs, so two concurrent REST loads (e.g. two server processes
    * over shared storage) produce byte-equivalent objects and the
    * loser simply adopts the winner's.
    */
  private def ensureObject(storage: StorageOps, rel: String,
      bytes: => Array[Byte]): Long = {
    if (!storage.exists(rel)) {
      try storage.writeAtomic(rel, bytes)
      catch { case _: AtomicSealFailureException => () }
    }
    storage.sizeOf(rel)
  }

  /** Hive-style identity partition value parsed from the file path
    * (`…/col=value/…`), coerced to the column type; None when absent
    * or unparseable (served as an avro null).
    */
  private[serve] def partitionValue(path: String, col: String,
      dt: DataType): Option[Any] = {
    val marker = s"$col="
    path.split('/').find(_.startsWith(marker)).flatMap { seg =>
      val raw = java.net.URLDecoder.decode(
        seg.substring(marker.length), "UTF-8")
      try dt match {
        case IntegerType | ShortType | ByteType => Some(raw.toInt)
        case LongType => Some(raw.toLong)
        case DateType =>
          Some(java.time.LocalDate.parse(raw).toEpochDay.toInt)
        case _ => Some(raw)
      } catch { case _: Exception => None }
    }
  }

  private final case class WrittenManifest(rel: String, length: Long,
      content: Int, addedFiles: Int, existingFiles: Int,
      addedRows: Long, existingRows: Long, minSeq: Long, maxSeq: Long,
      addedSnapshotId: Long, specId: Int = 0)

  /** Serve-side state for one table load. */
  final case class TableManifests(
      /** snapshot id → ABSOLUTE manifest-list path (servable snapshots only). */
      manifestLists: Map[Long, String])

  private def icebergDir(ns: String, table: String): String =
    s"data/$ns/$table/meta/iceberg"

  /** Deterministic per-snapshot discriminator for derived object keys:
    * `<id>-<8-hex content hash>`. The id alone is NOT unique over a
    * table's lifetime — DROP + re-CREATE restarts ids at 0, and a
    * derived key reused across incarnations would serve the PREVIOUS
    * table's file inventory as the current one (stale manifest lists
    * planning files the table no longer holds). The hash is a pure
    * function of the immutable snapshot document, so concurrent
    * server processes still derive identical keys and creation races
    * keep collapsing in [[ensureObject]].
    */
  def snapshotKey(s: Snapshot): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(graft.objects.Json.write(s))
    val hex = digest.take(4).map(b => f"${b & 0xff}%02x").mkString
    s"${s.id}-$hex"
  }

  /** True when the snapshot carries pending merge-on-read state. */
  def hasPendingDeletes(s: Snapshot): Boolean =
    s.deletes.nonEmpty || s.posDeletes.nonEmpty || s.eqDeletes.nonEmpty

  /** A co-located Spark session, when one exists: getActiveSession is
    * thread-local (HTTP handler threads never have one), so fall back
    * to the process default.
    */
  private def colocatedSpark: Option[org.apache.spark.sql.SparkSession] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)

  /** True when the snapshot's pending state cannot be represented as
    * Iceberg v2 delete manifests. Position/equality deletes always
    * serve as real delete files; predicate deletes have no Iceberg
    * analog but MATERIALIZE into position-delete objects when a
    * co-located Spark session can run the one in-scope scan the
    * representation change needs
    * ([[IcebergDeleteObjects.materializePredicateDeletes]]) — only a
    * server with no data-plane engine at all still refuses them.
    */
  def unservable(s: Snapshot): Boolean =
    s.deletes.nonEmpty && colocatedSpark.isEmpty

  /** Ensure avro manifests (data + delete) and per-snapshot manifest
    * lists exist for every servable snapshot; returns the absolute
    * manifest-list path per served snapshot. Idempotent: snapshots,
    * segments and delete objects are immutable, so every derived
    * object is written at a deterministic key at most once and reused
    * afterwards (creation races collapse in [[ensureObject]]).
    */
  def ensure(storage: StorageOps, ns: String, table: String,
      meta: TableMetadata, schema: StructType,
      partitionCols: Seq[String]): TableManifests = {
    val dir = icebergDir(ns, table)
    val partCols = partitionCols.flatMap(c =>
      schema.fields.find(_.name == c).map(f => (f.name, f.dataType)))
    val partSchema = partitionSchema(partCols)
    val entrySchema = manifestEntrySchema(partSchema)
    val dfSchema = entrySchema.getField("data_file").schema()
    val (schemaNode, _) = IcebergRest.toIcebergSchema(schema, meta.properties)
    val specJson = {
      val sb = new StringBuilder("[")
      partCols.zipWithIndex.foreach { case ((name, _), i) =>
        if (i > 0) sb.append(',')
        sb.append(s"""{"name":"$name","transform":"identity",""" +
          s""""source-id":${fieldIdOf(schemaNode, name)},"field-id":${1000 + i}}""")
      }
      sb.append("]").toString
    }
    def manifestMeta(content: String, specId: Int = 0) = Map(
      "schema" -> schemaNode.toString,
      "schema-id" -> "0",
      "partition-spec" -> (if (specId == 0) specJson else "[]"),
      "partition-spec-id" -> specId.toString,
      "format-version" -> "2",
      "content" -> content)
    // equality deletes are GLOBAL (they bind by key + sequence, not
    // partition), so their manifests ride an UNPARTITIONED spec — for
    // partitioned tables that is the extra spec id 1 the metadata
    // advertises; Iceberg applies unpartitioned-spec equality deletes
    // to every partition
    val eqSpecId = if (partCols.nonEmpty) 1 else 0
    val emptyPartSchema = partitionSchema(Seq.empty)
    val eqEntrySchema = manifestEntrySchema(emptyPartSchema)
    val eqDfSchema = eqEntrySchema.getField("data_file").schema()

    val all = meta.allSnapshots(storage)
    // commit sequence → the snapshot that committed it: recovers which
    // snapshot ADDED each file (entries inherited from ancestors serve
    // as status=EXISTING under the adder's snapshot id)
    val seqToSnap: Map[Long, Long] = all.map(s => s.seq -> s.id).toMap
    val served = all.filterNot(unservable)
    def segmentManifestRel(segKey: String): String = {
      val base = segKey.substring(segKey.lastIndexOf('/') + 1)
        .stripSuffix(".manifest.json")
      s"$dir/m-$base.avro"
    }
    // owning (first serving) snapshot per shared manifest object —
    // derived from the FULL snapshot walk, oldest first, so it is the
    // same on every load regardless of which manifest lists already
    // exist (a per-load "first missing" rule would re-attribute a
    // shared segment to whatever snapshot a later load served first)
    val owners: Map[String, Long] = {
      val m = mutable.LinkedHashMap.empty[String, Long]
      served.foreach { s =>
        if (s.files.nonEmpty)
          m.getOrElseUpdate(s"$dir/m-inline-${snapshotKey(s)}.avro", s.id)
        s.manifests.foreach(k => m.getOrElseUpdate(segmentManifestRel(k), s.id))
      }
      m.toMap
    }

    def entryRecord(f: DataFileEntry, manifestSnapId: Long): GenericRecord = {
      val part = new GenericData.Record(partSchema)
      partCols.foreach { case (name, dt) =>
        part.put(name, partitionValue(f.path, name, dt).orNull)
      }
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", storage.absolute(f.path))
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", f.rowCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      val adder = seqToSnap.getOrElse(f.seq, manifestSnapId)
      val e = new GenericData.Record(entrySchema)
      e.put("status", if (adder == manifestSnapId) 1 else 0) // ADDED / EXISTING
      e.put("snapshot_id", adder)
      e.put("sequence_number", f.seq)
      e.put("file_sequence_number", f.seq)
      e.put("data_file", df)
      e
    }

    // one avro manifest per graft segment, named after the segment's
    // own object key (immutable → written once, shared across
    // snapshots); inline entries get a per-snapshot manifest
    def ensureManifest(rel: String, entries: Seq[DataFileEntry],
        snapId: Long): WrittenManifest = {
      val owner = owners.getOrElse(rel, snapId)
      val length = ensureObject(storage, rel,
        writeAvro(entrySchema, entries.map(entryRecord(_, owner)),
          manifestMeta("data")))
      val (added, existing) = entries.partition(f =>
        seqToSnap.getOrElse(f.seq, owner) == owner)
      WrittenManifest(rel, length, content = 0,
        added.size, existing.size,
        added.map(_.rowCount).sum, existing.map(_.rowCount).sum,
        if (entries.isEmpty) 0L else entries.map(_.seq).min,
        if (entries.isEmpty) 0L else entries.map(_.seq).max,
        owner)
    }

    def baseOf(rel: String): String =
      rel.substring(rel.lastIndexOf('/') + 1).stripSuffix(".parquet")

    // ---- pending merge-on-read state → v2 delete manifests ----

    /** One delete-manifest entry: (object rel, partition values or
      * None for the unpartitioned spec, rows, length, seq, content,
      * equality ids).
      */
    def deleteEntryRecord(eSchema: Schema, dSchema: Schema, pSchema: Schema,
        snapId: Long)(objRel: String, part: Option[Seq[Option[Any]]],
        rows: Long, len: Long, seq: Long, content: Int,
        eqIds: Seq[Int]): GenericRecord = {
      val df = new GenericData.Record(dSchema)
      df.put("content", content)
      df.put("file_path", storage.absolute(objRel))
      df.put("file_format", "PARQUET")
      val pr = new GenericData.Record(pSchema)
      part.foreach { tuple =>
        partCols.zip(tuple).foreach { case ((name, _), v) =>
          pr.put(name, v.orNull)
        }
      }
      df.put("partition", pr)
      df.put("record_count", rows)
      df.put("file_size_in_bytes", len)
      if (eqIds.nonEmpty)
        df.put("equality_ids", new GenericData.Array(
          dSchema.getField("equality_ids").schema().getTypes.get(1),
          eqIds.map(Int.box).asJava))
      val adder = seqToSnap.getOrElse(seq, snapId)
      val e = new GenericData.Record(eSchema)
      e.put("status", if (adder == snapId) 1 else 0)
      e.put("snapshot_id", adder)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", df)
      e
    }

    def deleteManifest(rel: String, eSchema: Schema, specId: Int,
        s: Snapshot, entries: Seq[(GenericRecord, Long, Long)])
        : WrittenManifest = {
      val length = ensureObject(storage, rel,
        writeAvro(eSchema, entries.map(_._1), manifestMeta("deletes", specId)))
      val (added, existing) = entries.partition(e =>
        seqToSnap.getOrElse(e._3, s.id) == s.id)
      // a pending object can transcode to zero entries (zero-row
      // object): same 0L sequence defaults as an empty data manifest
      WrittenManifest(rel, length, content = 1,
        added.size, existing.size,
        added.map(_._2).sum, existing.map(_._2).sum,
        if (entries.isEmpty) 0L else entries.map(_._3).min,
        if (entries.isEmpty) 0L else entries.map(_._3).max, s.id, specId)
    }

    /** Position deletes: per-snapshot manifest under the table's spec.
      * On a partitioned table each source object transcodes into one
      * spec-shaped object PER PARTITION it references, each entry
      * stamped with that partition's tuple. A delta commit's sequence
      * is later than every file it read, so stamping entries at
      * pd.seq keeps all referenced files in scope (matching is exact
      * (path, pos) — over-scoping is harmless).
      */
    /** Pending PREDICATE deletes materialized as one synthetic
      * native-shaped position-delete object, then served through the
      * standard transcode below. Stamped at the NEWEST predicate's
      * sequence (position matching is exact (path, pos); over-scoping
      * is harmless) and referencing every in-scope data file.
      *
      * The object is CONTENT-addressed by (in-scope files, applicable
      * predicates): consecutive snapshots whose delete view coincides —
      * the common case, where later commits only append out-of-scope
      * files — share one object instead of re-scanning per snapshot.
      * All objects a load is missing are produced by ONE batched scan
      * ([[IcebergDeleteObjects.materializePredicateDeleteSets]]).
      */
    case class PredMat(rel: String, files: Seq[DataFileEntry],
        inScope: Seq[DataFileEntry], deletes: Seq[graft.format.DeletePredicate])
    val predMats: Map[Long, PredMat] = served
      .filter(s => s.deletes.nonEmpty &&
        !storage.exists(s"$dir/ml-${snapshotKey(s)}.avro"))
      .map { s =>
        val files = Manifests.filesOf(storage, s)
        val inScope = files.filter(f => s.deletes.exists(_.seq >= f.seq))
        val desc = (inScope.map(f => s"${f.path}@${f.seq}").sorted ++
          s.deletes.map(p => s"${p.sql}@${p.seq}").sorted).mkString("\n")
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(12).map("%02x".format(_)).mkString
        s.id -> PredMat(s"$dir/pq-$digest.parquet", files, inScope, s.deletes)
      }.toMap
    locally {
      val missing = predMats.values
        .filter(m => !storage.exists(m.rel))
        .groupBy(_.rel).map(_._2.head).toSeq.sortBy(_.rel)
      if (missing.nonEmpty) {
        val spark = colocatedSpark.getOrElse(throw new IllegalStateException(
          "predicate-delete materialization needs a co-located Spark " +
            "session (unservable() guards this upstream)"))
        IcebergDeleteObjects.materializePredicateDeleteSets(spark, storage,
          missing.map(m => (m.rel, m.files, m.deletes)))
      }
    }
    def syntheticPredicateDeletes(s: Snapshot): Option[PosDeleteFile] =
      predMats.get(s.id).map { m =>
        PosDeleteFile(m.rel,
          IcebergDeleteObjects.parquetRowCount(storage, m.rel),
          storage.sizeOf(m.rel), m.inScope.map(_.path),
          m.deletes.map(_.seq).max)
      }

    def ensurePosManifest(s: Snapshot): WrittenManifest = {
      val mk = deleteEntryRecord(entrySchema, dfSchema, partSchema, s.id) _
      val entries = (s.posDeletes ++ syntheticPredicateDeletes(s)).flatMap { pd =>
        val base = baseOf(pd.path)
        if (partCols.isEmpty) {
          val objRel = s"$dir/pd-$base.parquet"
          val len = ensureObject(storage, objRel,
            IcebergDeleteObjects.transcodePosDelete(storage, pd))
          Seq((mk(objRel, Some(Seq.empty), pd.rowCount, len, pd.seq, 1,
            Seq.empty), pd.rowCount, pd.seq))
        } else {
          // splitting re-reads the KB-scale source object per load;
          // the split objects themselves are written at most once
          val splits =
            IcebergDeleteObjects.transcodePosDeleteSplits(storage, pd, partCols)
          splits.map { sp =>
            val objRel = s"$dir/pd-$base-s${sp.idx}.parquet"
            val len = ensureObject(storage, objRel, sp.bytes)
            (mk(objRel, Some(sp.partition), sp.rows, len, pd.seq, 1,
              Seq.empty), sp.rows, pd.seq)
          }
        }
      }
      deleteManifest(s"$dir/del-${snapshotKey(s)}.avro", entrySchema, 0, s,
        entries)
    }

    /** Equality deletes: per-snapshot manifest under the unpartitioned
      * spec (global application — they bind by key + strict sequence).
      */
    def ensureEqManifest(s: Snapshot): WrittenManifest = {
      val mk = deleteEntryRecord(eqEntrySchema, eqDfSchema,
        emptyPartSchema, s.id) _
      val entries = s.eqDeletes.map { ed =>
        val objRel = s"$dir/ed-${baseOf(ed.path)}.parquet"
        val len = ensureObject(storage, objRel,
          IcebergDeleteObjects.transcodeEqDelete(storage, ed, schema,
            fieldIdOf(schemaNode, _)))
        (mk(objRel, None, ed.rowCount, len, ed.seq, 2,
          // cols carry PHYSICAL names (rename-safe objects); the
          // advertised equality ids are the LOGICAL fields'
          ed.cols.map(c => fieldIdOf(schemaNode,
            IcebergDeleteObjects.fieldForPhysical(schema, c).name))),
          ed.rowCount, ed.seq)
      }
      deleteManifest(s"$dir/deq-${snapshotKey(s)}.avro", eqEntrySchema,
        eqSpecId, s,
        entries)
    }

    val lists = served.map { s =>
      val mlRel = s"$dir/ml-${snapshotKey(s)}.avro"
      if (!storage.exists(mlRel)) {
        val manifests =
          (if (s.files.nonEmpty)
            Seq(ensureManifest(s"$dir/m-inline-${snapshotKey(s)}.avro",
              s.files, s.id))
          else Seq.empty) ++
          s.manifests.map(k =>
            ensureManifest(segmentManifestRel(k),
              Manifests.read(storage, k), s.id)) ++
          (if (s.posDeletes.nonEmpty || s.deletes.nonEmpty)
            Seq(ensurePosManifest(s))
          else Seq.empty) ++
          (if (s.eqDeletes.nonEmpty) Seq(ensureEqManifest(s))
          else Seq.empty)
        val records = manifests.map { m =>
          val r = new GenericData.Record(manifestFileSchema)
          r.put("manifest_path", storage.absolute(m.rel))
          r.put("manifest_length", m.length)
          r.put("partition_spec_id", m.specId)
          r.put("content", m.content)
          r.put("sequence_number", m.maxSeq)
          r.put("min_sequence_number", m.minSeq)
          r.put("added_snapshot_id", m.addedSnapshotId)
          r.put("added_data_files_count", m.addedFiles)
          r.put("existing_data_files_count", m.existingFiles)
          r.put("deleted_data_files_count", 0)
          r.put("added_rows_count", m.addedRows)
          r.put("existing_rows_count", m.existingRows)
          r.put("deleted_rows_count", 0L)
          r
        }
        ensureObject(storage, mlRel,
          writeAvro(manifestFileSchema, records,
            Map("snapshot-id" -> s.id.toString,
              "parent-snapshot-id" -> s.parentId.toString,
              "sequence-number" -> s.seq.toString,
              "format-version" -> "2")))
      }
      s.id -> storage.absolute(mlRel)
    }
    TableManifests(lists.toMap)
  }

  private def fieldIdOf(schemaNode: com.fasterxml.jackson.databind.node
      .ObjectNode, name: String): Int = {
    val it = schemaNode.get("fields").elements()
    while (it.hasNext) {
      val f = it.next()
      if (f.get("name").asText() == name) return f.get("id").asInt()
    }
    -1
  }
}
