package graft.storage

/** Executor-reconstructible storage handle: a tiny serializable
  * descriptor each task turns back into a live [[StorageOps]], so
  * distributed catalog work (listings, commit-stats harvesting) reads
  * storage where the task runs instead of round-tripping through the
  * driver (reference: the S3 ops are likewise rebuilt per-JVM from
  * configuration, s3/.../S3StorageOps.java).
  *
  * `kind == Opaque` marks a storage that CANNOT be reopened from a
  * descriptor (e.g. the in-memory test store) — distributed fan-out
  * callers must fall back to driver-side access through the live
  * instance.
  */
final case class StorageConf(warehouse: String, kind: String)
    extends Serializable {

  def reopenable: Boolean = kind != StorageConf.Opaque

  def create(): StorageOps = kind match {
    case "object" =>
      new ObjectStoreOps(new DirectoryObjectStoreClient(warehouse))
    case StorageConf.Opaque =>
      throw new IllegalStateException(
        "this storage backend cannot be reopened from a descriptor")
    case _ => new LocalStorageOps(warehouse)
  }
}

object StorageConf {
  /** Sentinel kind for backends with no reconstructible descriptor. */
  val Opaque = "opaque"
}
