package graft.storage

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Local-filesystem storage (reference: LocalStorageOps.java:33-119 +
  * LocalAtomicStagingOutputStream.java:25-72).
  *
  * Atomic create = stage to a temp file in the same directory, then
  * `Files.move` WITHOUT replace — a rename within one filesystem, so
  * concurrent creators of the same target see exactly one winner and
  * the loser gets FileAlreadyExistsException.
  *
  * An S3-class implementation slots in behind the same trait using
  * conditional PUT (`If-None-Match: *`, reference
  * S3AtomicOutputStream.java:36-49); out of scope offline.
  */
class LocalStorageOps(val root: String) extends StorageOps {
  private val rootPath: Path = Paths.get(root)

  private def p(rel: String): Path = rootPath.resolve(rel)

  override def exists(rel: String): Boolean = Files.exists(p(rel))

  override def read(rel: String): Array[Byte] = Files.readAllBytes(p(rel))

  override def sizeOf(rel: String): Long = Files.size(p(rel))

  override def prepareToReadLocal(rel: String): Path = p(rel)

  override def reopenConf: StorageConf = StorageConf(root, "local")

  override def writeAtomic(rel: String, data: Array[Byte]): Unit = {
    val target = p(rel)
    Files.createDirectories(target.getParent)
    val staging = Files.createTempFile(target.getParent, ".staging-", ".tmp")
    try {
      Files.write(staging, data)
      // link(2) fails atomically when the target exists — unlike
      // Files.move without ATOMIC_MOVE, whose exists-check + rename is
      // a TOCTOU race where concurrent creators overwrite each other
      // (caught by the 8-writer race test).
      try Files.createLink(target, staging)
      catch {
        case e: FileAlreadyExistsException =>
          throw new AtomicSealFailureException(rel, e)
      }
    } finally Files.deleteIfExists(staging)
  }

  override def overwrite(rel: String, data: Array[Byte]): Unit = {
    val target = p(rel)
    Files.createDirectories(target.getParent)
    val staging = Files.createTempFile(target.getParent, ".staging-", ".tmp")
    try {
      Files.write(staging, data)
      // ATOMIC_MOVE = plain rename(2). Without it the JDK unlinks an
      // existing target BEFORE renaming, and a concurrent reader of
      // `vn/latest` (e.g. a streaming source polling latestOffset)
      // hits NoSuchFileException in the gap. rename(2) replaces
      // atomically: readers see the old or the new hint, never none.
      Files.move(staging, target, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(staging)
  }

  override def deleteBatch(rels: Seq[String]): Unit =
    rels.foreach(rel => Files.deleteIfExists(p(rel)))

  override def listPrefix(prefix: String): Seq[String] = {
    val dir = p(prefix)
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir)) { stream =>
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith(".staging-"))
        .map(f => rootPath.relativize(f).toString)
        .toSeq.sorted
    }
  }

  override def listDeep(prefix: String): Seq[String] = {
    val dir = p(prefix)
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.walk(dir)) { stream =>
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => rootPath.relativize(f).toString)
        .toSeq.sorted
    }
  }

  override def listCommonPrefixes(prefix: String): Seq[String] = {
    val dir = p(prefix)
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir)) { stream =>
      stream.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(f => rootPath.relativize(f).toString)
        .toSeq.sorted
    }
  }

  override def move(srcRel: String, dstRel: String): Unit = {
    val dst = p(dstRel)
    Files.createDirectories(dst.getParent)
    Files.move(p(srcRel), dst)
  }

  override def deleteTree(prefix: String): Unit = {
    val dir = p(prefix)
    if (Files.exists(dir))
      Using.resource(Files.walk(dir)) { stream =>
        stream.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
  }

  override def absolute(rel: String): String = p(rel).toString
}
