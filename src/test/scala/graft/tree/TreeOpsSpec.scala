package graft.tree

import java.nio.file.Files

import graft.objects.FileLocations
import graft.storage.LocalStorageOps
import org.scalatest.funsuite.AnyFunSuite

/** Tree kernel tests: reference unit-test semantics
  * (tree/TestTreeOperations.java:36-335) plus seeded random workloads
  * checked against a TreeMap model (FIXTURES.md §1).
  */
class TreeOpsSpec extends AnyFunSuite {

  private def freshStorage(): LocalStorageOps =
    new LocalStorageOps(Files.createTempDirectory("graft-tree").toString)

  private def newRoot(storage: LocalStorageOps): TreeRoot =
    TreeOps.createEmptyRoot(storage, "def/none.json")

  test("write/read roundtrip with values and metadata") {
    val storage = freshStorage()
    val root = newRoot(storage)
    TreeOps.setValue(storage, root, "a", Some("val-a"), 128)
    TreeOps.setValue(storage, root, "b", Some("val-b"), 128)
    TreeOps.writeRoot(storage, root, 1L)
    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    assert(loaded.version == 1L)
    assert(TreeOps.searchValue(storage, loaded, "a").contains("val-a"))
    assert(TreeOps.searchValue(storage, loaded, "b").contains("val-b"))
    assert(TreeOps.searchValue(storage, loaded, "c").isEmpty)
  }

  test("latest-version discovery via hint + probe") {
    val storage = freshStorage()
    var root = newRoot(storage)
    for (v <- 1L to 5L) {
      root = TreeOps.loadRoot(storage, root.path.get)
      TreeOps.setValue(storage, root, s"k$v", Some(s"v$v"), 128)
      root.previousRootPath = root.path
      TreeOps.writeRoot(storage, root, v)
    }
    // stale hint must not break discovery
    storage.overwrite(FileLocations.LatestVersionHint, "2".getBytes)
    val latest = TreeOps.findLatestRoot(storage).get
    assert(latest.version == 5L)
  }

  test("root-chain iteration and time travel by version") {
    val storage = freshStorage()
    var root = newRoot(storage)
    for (v <- 1L to 4L) {
      root = TreeOps.loadRoot(storage, root.path.get)
      TreeOps.setValue(storage, root, s"k$v", Some(s"v$v"), 128)
      root.previousRootPath = root.path
      TreeOps.writeRoot(storage, root, v)
    }
    val latest = TreeOps.findLatestRoot(storage).get
    assert(TreeOps.listRoots(storage, latest).map(_.version).toSeq == Seq(4L, 3L, 2L, 1L, 0L))
    val v2 = TreeOps.findRootForVersion(storage, latest, 2L)
    assert(TreeOps.searchValue(storage, v2, "k2").contains("v2"))
    assert(TreeOps.searchValue(storage, v2, "k3").isEmpty)
  }

  test("splits at small order keep all keys reachable and ordered") {
    val storage = freshStorage()
    val root = newRoot(storage)
    val keys = ('a' to 't').map(_.toString)
    keys.foreach(k => TreeOps.setValue(storage, root, k, Some(s"val-$k"), 5))
    // all reachable pre-serialize
    keys.foreach(k => assert(
      TreeOps.searchValue(storage, root, k).contains(s"val-$k"), s"pre-write $k"))
    TreeOps.writeRoot(storage, root, 1L)
    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    keys.foreach(k => assert(
      TreeOps.searchValue(storage, loaded, k).contains(s"val-$k"), s"post-write $k"))
    // in-order traversal yields sorted keys
    assert(TreeOps.traverse(storage, loaded).map(_.key).toSeq == keys.sorted)
  }

  test("wide dirty fan-out writes children in parallel, root last") {
    // order 5 over 200 keys → many dirty non-root nodes per commit;
    // the fan-out path (TreeOps.writeDirtyChildren) writes disjoint
    // subtrees concurrently and must keep every key reachable with
    // the right value after reload — the root file is still the last
    // write (docs/format.md:262: only the root is a commit point)
    val storage = freshStorage()
    val root = newRoot(storage)
    val keys = (0 until 200).map(i => f"key-$i%03d")
    keys.foreach(k => TreeOps.setValue(storage, root, k, Some(s"v-$k"), 5))
    TreeOps.writeRoot(storage, root, 1L)
    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    keys.foreach(k => assert(
      TreeOps.searchValue(storage, loaded, k).contains(s"v-$k"), k))
    assert(TreeOps.traverse(storage, loaded).map(_.key).toSeq == keys.sorted)
    // a second commit touching a spread of keys re-fans-out and stays
    // exact
    val touched = keys.grouped(10).map(_.head).toSeq
    touched.foreach(k => TreeOps.setValue(storage, loaded, k, Some(s"w-$k"), 5))
    TreeOps.writeRoot(storage, loaded, 2L)
    val v2 = TreeOps.loadRoot(storage, FileLocations.rootNodePath(2L))
    keys.foreach { k =>
      val want = if (touched.contains(k)) s"w-$k" else s"v-$k"
      assert(TreeOps.searchValue(storage, v2, k).contains(want), k)
    }
  }

  test("tombstone delete hides key across serialize") {
    val storage = freshStorage()
    val root = newRoot(storage)
    ('a' to 'j').foreach(k =>
      TreeOps.setValue(storage, root, k.toString, Some(s"v$k"), 5))
    TreeOps.setValue(storage, root, "c", None, 5)
    assert(TreeOps.searchValue(storage, root, "c").isEmpty)
    TreeOps.writeRoot(storage, root, 1L)
    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    assert(TreeOps.searchValue(storage, loaded, "c").isEmpty)
    assert(TreeOps.searchValue(storage, loaded, "d").contains("vd"))
  }

  test("slice split on update: only the touched key changes") {
    val storage = freshStorage()
    val root = newRoot(storage)
    ('a' to 'j').foreach(k =>
      TreeOps.setValue(storage, root, k.toString, Some(s"v$k"), 128))
    TreeOps.writeRoot(storage, root, 1L)
    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    TreeOps.setValue(storage, loaded, "e", Some("v-updated"), 128)
    assert(loaded.node.slices.size == 2) // [a,e) and (e,j] survive as slices
    assert(TreeOps.searchValue(storage, loaded, "e").contains("v-updated"))
    assert(TreeOps.searchValue(storage, loaded, "d").contains("vd"))
  }

  test("property: random insert/update/delete matches TreeMap model") {
    for (seed <- 1 to 8; order <- Seq(4, 5, 8, 128)) {
      val rnd = new scala.util.Random(seed * 1000 + order)
      val storage = freshStorage()
      val root = newRoot(storage)
      val model = scala.collection.mutable.TreeMap.empty[String, String]
      (1 to 150).foreach { _ =>
        val k = f"key${rnd.nextInt(40)}%03d"
        if (rnd.nextInt(10) < 2) {
          TreeOps.setValue(storage, root, k, None, order)
          model.remove(k)
        } else {
          val v = rnd.alphanumeric.take(8).mkString
          TreeOps.setValue(storage, root, k, Some(v), order)
          model.put(k, v)
        }
      }
      // in-memory equivalence
      model.foreach { case (k, v) =>
        assert(TreeOps.searchValue(storage, root, k).contains(v),
          s"seed=$seed order=$order pre-write key=$k")
      }
      // serialize + reload equivalence, including traversal order
      TreeOps.writeRoot(storage, root, 1L)
      val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
      model.foreach { case (k, v) =>
        assert(TreeOps.searchValue(storage, loaded, k).contains(v),
          s"seed=$seed order=$order post-write key=$k")
      }
      val traversed = TreeOps.traverse(storage, loaded)
        .map(r => r.key -> r.value.get).toSeq
      assert(traversed == model.toSeq, s"seed=$seed order=$order traversal")
    }
  }

  test("atomic root create: concurrent writers get exactly one winner") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val storage = freshStorage()
    newRoot(storage)
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to 8).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            storage.writeAtomic(FileLocations.rootNodePath(1L), s"writer-$i".getBytes)
            wins.incrementAndGet()
          } catch { case _: graft.storage.AtomicSealFailureException => () }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() == 1)
  }
}
