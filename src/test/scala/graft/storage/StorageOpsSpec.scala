package graft.storage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's abstract StorageOpsTests (32-184) bound to
  * the local backend.
  */
class StorageOpsSpec extends AnyFunSuite {
  private def fresh(): StorageOps =
    new LocalStorageOps(Files.createTempDirectory("graft-sops").toString)

  test("write/read/exists round-trip") {
    val s = fresh()
    assert(!s.exists("a/b.txt"))
    s.writeAtomic("a/b.txt", "hello".getBytes)
    assert(s.exists("a/b.txt"))
    assert(new String(s.read("a/b.txt")) == "hello")
  }

  test("writeAtomic refuses to overwrite; overwrite replaces") {
    val s = fresh()
    s.writeAtomic("x", "1".getBytes)
    intercept[AtomicSealFailureException](s.writeAtomic("x", "2".getBytes))
    assert(new String(s.read("x")) == "1")
    s.overwrite("x", "2".getBytes)
    assert(new String(s.read("x")) == "2")
  }

  test("deleteBatch removes present files, tolerates missing") {
    val s = fresh()
    s.writeAtomic("d/1", "a".getBytes)
    s.writeAtomic("d/2", "b".getBytes)
    s.deleteBatch(Seq("d/1", "d/2", "d/missing"))
    assert(!s.exists("d/1") && !s.exists("d/2"))
  }

  test("listPrefix: sorted relative paths, no staging artifacts") {
    val s = fresh()
    s.writeAtomic("p/b", "1".getBytes)
    s.writeAtomic("p/a", "2".getBytes)
    assert(s.listPrefix("p") == Seq("p/a", "p/b"))
    assert(s.listPrefix("nope").isEmpty)
  }
}
