package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import graft.catalog.Graft
import graft.format.{AppendFiles, DataFileEntry, TableMetadata}
import graft.objects.ObjectKeys
import graft.spark.GraftCatalog
import graft.storage.StorageOps
import graft.txn.{Action, ActionType}

/** External COMMITS through the REST facade: the PUBLIC Apache
  * Iceberg REST `CommitTableRequest` shape (`requirements` +
  * `updates`), append-only subset — an external engine writes its
  * parquet data files under the table location, authors its own avro
  * manifest list, and POSTs `add-snapshot` + `set-snapshot-ref`. The
  * facade re-reads the CLIENT's manifests to recover the file
  * inventory and lands it through the exact same optimistic commit
  * path as a native writer ([[GraftCatalog.applyFilesCommit]]), so an
  * HTTP commit racing a Spark commit resolves like two Spark
  * sessions.
  *
  * Deliberate deltas, documented: graft assigns its own snapshot id
  * (ids are allocation-ordered — the snapshot-log's range lookups
  * depend on it — so a client's random id is not honored; the
  * response metadata carries the assigned one), and a lost root race
  * REBASES the append like native writers do (graft's append/append
  * conflict rule is more permissive than a strict
  * `assert-ref-snapshot-id`; the client's files always land exactly
  * once).
  */
object IcebergCommits {

  /** A commit requirement did not hold → HTTP 409 per the REST spec. */
  final class RequirementFailedException(msg: String)
    extends RuntimeException(msg)

  /** Validate + apply one CommitTableRequest; throws
    * IllegalArgumentException (→400) for malformed/unsupported bodies
    * and [[RequirementFailedException]] (→409) for failed
    * requirements.
    */
  def commit(storage: StorageOps, ns: String, t: String,
      body: JsonNode): Unit = {
    val updates = body.get("updates")
    require(updates != null && updates.isArray && updates.size() > 0,
      "commit body needs a non-empty updates array")
    var snapshot: JsonNode = null
    val it = updates.elements()
    while (it.hasNext) {
      val u = it.next()
      u.path("action").asText() match {
        case "add-snapshot" =>
          require(snapshot == null, "multiple add-snapshot updates")
          snapshot = u.get("snapshot")
          require(snapshot != null, "add-snapshot without a snapshot")
        case "set-snapshot-ref" =>
          require(u.path("ref-name").asText() == "main",
            "only the main ref can be set through this endpoint")
        case other =>
          throw new IllegalArgumentException(
            s"unsupported commit update action: $other " +
              "(this endpoint accepts append commits: " +
              "add-snapshot + set-snapshot-ref)")
      }
    }
    require(snapshot != null, "commit without an add-snapshot update")
    val op = snapshot.path("summary").path("operation").asText()
    require(op == "append",
      s"only operation=append commits are accepted, got '$op'")
    val files = readClientManifests(storage,
      snapshot.path("manifest-list").asText())
    require(files.nonEmpty, "append snapshot plans zero data files")

    val txn = Graft.beginTransaction(storage)
    try {
      // requirements check against the transaction's consistent root
      val td = Graft.describeTable(storage, txn, ns, t)
      val meta = TableMetadata.read(storage, td.metadataLocation)
      val reqs = body.path("requirements")
      val rit = reqs.elements()
      while (rit.hasNext) {
        val r = rit.next()
        r.path("type").asText() match {
          case "assert-table-uuid" =>
            val want = java.util.UUID.nameUUIDFromBytes(
              s"$ns.$t".getBytes("UTF-8")).toString
            if (r.path("uuid").asText() != want)
              throw new RequirementFailedException(
                s"table uuid changed: ${r.path("uuid").asText()} != $want")
          case "assert-ref-snapshot-id" =>
            val ref = r.path("ref").asText()
            // `main` = the current snapshot; any other name resolves
            // through branches then tags — a ref this catalog cannot
            // resolve makes the guard unprovable, which fails the
            // commit (same posture as unknown requirement types)
            val actual: Long =
              if (ref == "main") meta.currentSnapshotId
              else meta.branches.getOrElse(ref,
                meta.refs.getOrElse(ref, -1L))
            val want =
              if (r.hasNonNull("snapshot-id")) r.get("snapshot-id").asLong()
              else -1L
            if (actual != want)
              throw new RequirementFailedException(
                s"ref $ref moved: at $actual, commit based on $want")
          case "" =>
            throw new IllegalArgumentException("requirement without a type")
          case other =>
            // an unknown requirement CANNOT be proven to hold — fail
            // the commit rather than ignore a guard the client asked for
            throw new IllegalArgumentException(
              s"unsupported commit requirement: $other")
        }
      }
      val edit = AppendFiles(files)
      GraftCatalog.applyFilesCommit(storage, txn.runningRoot, ns, t,
        "append", edit)
      txn.replays += ((s, r) =>
        GraftCatalog.applyFilesCommit(s, r, ns, t, "append", edit))
      val cd = Graft.catalogDef(storage, txn.runningRoot)
      txn.record(Action(ActionType.TableInsert,
        ObjectKeys.tableKey(ns, t, cd),
        Map("files" -> files.map(_.path).mkString(","))))
      Graft.commitTransaction(storage, txn)
      ()
    } finally txn.close()
  }

  /** File inventory of the client's snapshot: walk its manifest list →
    * manifests → ADDED/EXISTING data-file entries, mapping absolute
    * paths back onto storage-relative keys (a path outside the
    * catalog root is refused — the facade will not plan files it
    * cannot govern).
    */
  private def readClientManifests(storage: StorageOps,
      manifestList: String): Seq[DataFileEntry] = {
    require(manifestList.nonEmpty, "add-snapshot without a manifest-list")
    def toRel(abs: String): String = {
      val root = storage.root.stripSuffix("/") + "/"
      require(abs.startsWith(root),
        s"path outside the catalog root: $abs")
      val rel = abs.substring(root.length)
      // a prefix check alone is defeated by traversal segments: the
      // resolved path must stay under the root
      require(!rel.split('/').exists(seg => seg == ".." || seg == "."),
        s"path outside the catalog root (traversal segment): $abs")
      rel
    }
    def readAvro(rel: String): Seq[org.apache.avro.generic.GenericRecord] = {
      val local = storage.prepareToReadLocal(rel).toFile
      val r = new org.apache.avro.file.DataFileReader(local,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try Iterator.continually(r).takeWhile(_.hasNext).map(_.next()).toVector
      finally r.close()
    }
    // clients author their own schemas: optional fields may be
    // entirely ABSENT, and GenericRecord.get throws on unknown names
    def opt(r: org.apache.avro.generic.GenericRecord, name: String): Any =
      if (r.getSchema.getField(name) == null) null else r.get(name)
    readAvro(toRel(manifestList)).flatMap { m =>
      require(opt(m, "content") == null ||
          opt(m, "content").asInstanceOf[Int] == 0,
        "delete manifests are not accepted on the append endpoint")
      readAvro(toRel(m.get("manifest_path").toString)).flatMap { e =>
        val status = Option(opt(e, "status")).map(_.asInstanceOf[Int])
          .getOrElse(1)
        if (status == 2) None // DELETED entries carry no files to add
        else {
          val df = e.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          require(opt(df, "content") == null ||
              opt(df, "content").asInstanceOf[Int] == 0,
            "delete files are not accepted on the append endpoint")
          require(String.valueOf(df.get("file_format"))
              .equalsIgnoreCase("PARQUET"),
            s"unsupported file format: ${df.get("file_format")}")
          Some(DataFileEntry(toRel(df.get("file_path").toString),
            df.get("record_count").asInstanceOf[Long],
            df.get("file_size_in_bytes").asInstanceOf[Long]))
        }
      }
    }
  }
}
