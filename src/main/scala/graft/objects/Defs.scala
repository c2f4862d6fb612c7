package graft.objects

/** Catalog object definitions (reference: proto/objects.proto:39-96).
  * Serialized as JSON (Jackson, see [[Json]]) instead of protobuf —
  * same fields and semantics, different encoding; protobuf-java is not
  * resolvable offline (SURVEY.md §7.1).
  */
final case class CatalogDef(
    // self-describing encoding tag (docs/FORMAT_COMPAT.md). The
    // deserialization default is the 0 SENTINEL — a def file written
    // before the tag existed means layout 1, NOT the current version
    // (Graft.catalogDef maps it); createCatalog stamps the current
    // version explicitly. Bump ONLY on layouts a v-1 reader would
    // misread.
    formatVersion: Int = 0,
    // B-tree fan-out (reference ObjectDefinitions.java:35)
    order: Int = 128,
    namespaceNameMaxBytes: Int = 100,
    tableNameMaxBytes: Int = 100,
    viewNameMaxBytes: Int = 100,
    nodeFileMaxBytes: Long = 1L << 20,
    // transaction defaults (ObjectDefinitions.java:45-48)
    txnIsolationLevel: String = IsolationLevel.Snapshot,
    txnTtlMillis: Long = 3L * 24 * 3600 * 1000,
    properties: Map[String, String] = Map.empty,
    // named snapshot exports: export name → root node path at export
    // (docs/format.md:305-308 — "the catalog definition should be
    // updated to record the name of the export and the root node file
    // the export is at"); string VERSION AS OF resolves these.
    // Optional-with-default: a pre-feature reader ignores it, no
    // format bump needed.
    exportedSnapshots: Map[String, String] = Map.empty)

object CatalogDef {
  /** Current JSON object-def layout version (docs/FORMAT_COMPAT.md).
    * v2 = manifest-segment snapshots: table metadata may externalize
    * its file inventory into manifest objects — a v1 reader would
    * silently see only the inline entries, so v2 catalogs must be
    * refused by v1 builds rather than misread.
    * v3 = snapshot-log segments + refs: table metadata may spill old
    * snapshots into snaplog objects (a v2 maintenance job would treat
    * their files as orphans and DELETE them) and may carry named
    * snapshot refs (tags).
    * v4 = merge-on-read delete predicates: a snapshot may carry
    * pending `deletes` that every read must apply — a v3 reader would
    * silently return logically-deleted rows, so v4 catalogs must be
    * refused by v3 builds rather than misread.
    */
  val FormatVersion = 4
}

object IsolationLevel {
  val Snapshot = "SNAPSHOT"
  val Serializable = "SERIALIZABLE"
}

final case class NamespaceDef(
    name: String,
    properties: Map[String, String] = Map.empty)

/** Table pointer. The reference stores an Iceberg metadata location
  * (objects.proto:58-69); graft tables point at our own snapshot-log
  * metadata JSON (graft.format.TableMetadata) — format tag PARQUET.
  */
final case class TableDef(
    name: String,
    namespaceName: String,
    format: String = "PARQUET",
    metadataLocation: String,
    previousMetadataLocation: Option[String] = None,
    properties: Map[String, String] = Map.empty)

/** View definition. The reference stores a Substrait read relation
  * (objects.proto:71-85); no substrait library resolves offline, so
  * graft stores Spark SQL text + the bound schema (format tag SQL) and
  * keeps `referencedObjectNames` for invalidation — capability-
  * equivalent (SURVEY.md §7.5).
  */
final case class ViewDef(
    name: String,
    namespaceName: String,
    format: String = "SQL",
    sqlText: String,
    schemaJson: String,
    referencedObjectNames: Seq[String] = Seq.empty,
    properties: Map[String, String] = Map.empty)

/** Suspended distributed transaction (objects.proto:89-96): resumable
  * from any process by id.
  */
final case class DistTransactionDef(
    txnId: String,
    isolationLevel: String,
    beginningRootPath: String,
    runningRootPath: String,
    beganAtMillis: Long,
    expireAtMillis: Long)
