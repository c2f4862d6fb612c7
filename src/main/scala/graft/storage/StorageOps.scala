package graft.storage

/** Storage contract for the catalog tree (reference:
  * core/src/main/java/org/format/olympia/storage/StorageOps.java:24-45 and
  * CatalogStorage.java:29-73). Paths are RELATIVE to the catalog root
  * prefix so a catalog is portable across storage locations
  * (docs/index.md:24-26).
  *
  * The one primitive everything rests on is `writeAtomic`: mutual
  * exclusion on create. Commit races are decided by who creates the
  * next root-version file first — no server, no locks
  * (docs/format.md:230-246).
  */
trait StorageOps {
  /** Catalog root prefix (absolute). */
  def root: String

  def exists(rel: String): Boolean

  def read(rel: String): Array[Byte]

  /** Create-if-absent; throws [[AtomicSealFailureException]] when the
    * target already exists. MUST be atomic: concurrent writers see
    * exactly one winner.
    */
  def writeAtomic(rel: String, data: Array[Byte]): Unit

  /** Best-effort overwrite (used for the `vn/latest` hint only). */
  def overwrite(rel: String, data: Array[Byte]): Unit

  def deleteBatch(rels: Seq[String]): Unit

  /** Relative paths under `prefix`, non-recursive semantics like a flat
    * object store listing.
    */
  def listPrefix(prefix: String): Seq[String]

  def absolute(rel: String): String
}

/** Another writer created the target first — the commit lost the race
  * (reference: StorageAtomicSealFailureException).
  */
class AtomicSealFailureException(path: String, cause: Throwable = null)
    extends RuntimeException(s"atomic create lost: $path", cause)
