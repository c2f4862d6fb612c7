package graft.spark

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The session's `file:` scheme must resolve to the no-fork local FS
  * (RawLocalFileSystem.setPermission otherwise forks a chmod process
  * per file create — data files, .crc siblings, committer markers),
  * and its nio-based setPermission must produce the exact POSIX bits
  * the shell path would.
  */
class GraftLocalFileSystemSpec extends AnyFunSuite {

  private lazy val spark = graft.Verify.sessionBuilder("2").getOrCreate()

  test("session resolves file:// to GraftLocalFileSystem") {
    val fs = FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[GraftLocalFileSystem],
      s"expected GraftLocalFileSystem, got ${fs.getClass.getName}")
  }

  test("setPermission applies exact bits without forking") {
    val fs = FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft-nofork")
    val f = dir.resolve("x.bin")
    Files.write(f, Array[Byte](1, 2, 3))
    val p = new Path(f.toUri)
    for (bits <- Seq(Integer.parseInt("640", 8).toShort,
        Integer.parseInt("755", 8).toShort,
        Integer.parseInt("600", 8).toShort)) {
      fs.setPermission(p, new FsPermission(bits))
      val got = fs.getFileStatus(p).getPermission.toShort
      assert(got == bits, f"wanted ${bits.toInt}%o got ${got.toInt}%o")
    }
    // file creates through the FS (the hot path) land with umask-derived
    // perms exactly as the default LocalFileSystem would
    val out = fs.create(new Path(dir.resolve("y.bin").toUri))
    out.write(7); out.close()
    assert(fs.exists(new Path(dir.resolve("y.bin").toUri)))
  }
}
