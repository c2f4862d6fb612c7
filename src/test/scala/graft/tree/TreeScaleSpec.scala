package graft.tree

import java.nio.file.Files

import graft.objects.FileLocations
import graft.storage.LocalStorageOps
import org.scalatest.funsuite.AnyFunSuite

/** Multi-level-tree behavior at catalog scale: thousands of objects
  * force real splits (depth ≥ 2 at order 128), lookups stay correct,
  * traversal streams in order, and incremental commits only rewrite
  * the dirty path.
  */
class TreeScaleSpec extends AnyFunSuite {

  test("20k keys at order=128: splits, lookups, ordered traversal") {
    val storage = new LocalStorageOps(Files.createTempDirectory("graft-scale").toString)
    val root = TreeOps.createEmptyRoot(storage, "def/none.json")
    val n = 20000
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      TreeOps.setValue(storage, root, f"C===tbl$i%06d", Some(s"def/$i"), 128)
    }
    val insertSec = (System.nanoTime() - t0) / 1e9
    TreeOps.writeRoot(storage, root, 1L)
    val writeSec = (System.nanoTime() - t0) / 1e9 - insertSec

    val loaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    // multi-level: the root must have children
    assert(loaded.node.leftmostChildPath.isDefined ||
      loaded.node.mergedRows.exists(_.child.isDefined),
      "20k keys at order 128 must split beyond a single node")
    // point lookups across the range
    Seq(0, 1, 777, 9999, 19998, 19999).foreach { i =>
      assert(TreeOps.searchValue(storage, loaded, f"C===tbl$i%06d")
        .contains(s"def/$i"), s"lookup $i")
    }
    assert(TreeOps.searchValue(storage, loaded, "C===zzz").isEmpty)
    // streaming in-order traversal sees every key exactly once
    val keys = TreeOps.traverse(storage, loaded).map(_.key).toVector
    assert(keys.size == n)
    assert(keys == keys.sorted)
    info(f"insert=${insertSec}%.1fs write=${writeSec}%.1fs for $n keys")

    // incremental commit: one more key rewrites only the dirty path,
    // not the whole tree
    val before = storage.listPrefix("node").size
    val reloaded = TreeOps.loadRoot(storage, FileLocations.rootNodePath(1L))
    reloaded.previousRootPath = reloaded.path
    TreeOps.setValue(storage, reloaded, "C===tbl_new", Some("def/new"), 128)
    TreeOps.writeRoot(storage, reloaded, 2L)
    val newNodes = storage.listPrefix("node").size - before
    val depthBound = 4 // order-128 tree of 20k keys is ~2 levels deep
    assert(newNodes <= depthBound,
      s"incremental commit rewrote $newNodes nodes — expected ≤ $depthBound (dirty path only)")
    val v2 = TreeOps.findLatestRoot(storage).get
    assert(TreeOps.searchValue(storage, v2, "C===tbl_new").contains("def/new"))
    val fullKeys = TreeOps.traverse(storage, v2).map(_.key).toVector
    assert(fullKeys.size == n + 1)

    // resumable key-interval scan (pagination primitive): strictly
    // after any cut, the stream equals the full traversal's tail, and
    // one page loads only the resume path + consumed leaves — never
    // the whole tree
    Seq(f"C===tbl${777}%06d", f"C===tbl${9999}%06d", "C===a", "C===zzz")
      .foreach { after =>
        val fresh = TreeOps.findLatestRoot(storage).get
        val page = TreeOps.traverseFrom(storage, fresh, after)
          .map(_.key).take(50).toVector
        assert(page == fullKeys.dropWhile(_ <= after).take(50), s"cut $after")
        def countLoaded(nd: TreeNode): Int =
          1 + nd.loadedChildren.values.map(countLoaded).sum
        assert(countLoaded(fresh.node) <= 8,
          s"one 50-row page from $after loaded ${countLoaded(fresh.node)} " +
            "nodes — expected O(depth + page), not a full walk")
      }
  }
}
