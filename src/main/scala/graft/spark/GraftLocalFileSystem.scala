package graft.spark

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** RawLocalFileSystem whose setPermission uses java.nio instead of
  * forking a `chmod` process.
  *
  * Without the Hadoop native library (unavailable offline),
  * RawLocalFileSystem.setPermission shells out: EVERY local file
  * create — each parquet data/delete file, its .crc sibling, committer
  * marker files, task temp dirs, streaming state-store deltas — pays a
  * process fork (~5–25 ms, serialized on the JVM's process reaper).
  * Thread dumps of a bench run show the fork stack under
  * LocalFSFileOutputStream.<init> and FileOutputCommitter.commitJob.
  * java.nio sets the same POSIX bits in-process with no fork; bits the
  * NIO API cannot express (setuid/setgid/sticky) fall back to the
  * shell path, so semantics are unchanged.
  */
class GraftNoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits: Int = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      import PosixFilePermission._
      val perms = EnumSet.noneOf(classOf[PosixFilePermission])
      def add(bit: Int, perm: PosixFilePermission): Unit =
        if ((bits & bit) != 0) { perms.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      // non-POSIX file stores (some tmpfs/mount variants) throw
      // UnsupportedOperationException — degrade to the shell path
      // Hadoop would have taken, instead of letting it escape
      try {
        java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
        ()
      } catch {
        case _: UnsupportedOperationException => super.setPermission(p, permission)
      }
    }
  }
}

/** Drop-in `fs.file.impl`: the standard checksumming LocalFileSystem
  * over the no-fork raw FS — behavior identical to Hadoop's default,
  * minus the per-file-create process fork.
  */
class GraftLocalFileSystem
  extends LocalFileSystem(new GraftNoForkRawLocalFileSystem)
