package graft.objects

import java.nio.file.Files

import com.fasterxml.jackson.databind.node.ObjectNode
import graft.catalog.Graft
import graft.storage.LocalStorageOps
import graft.tree.TreeOps
import org.scalatest.funsuite.AnyFunSuite

/** The formatVersion tag must make catalog defs self-describing:
  * pre-tag (round-1) files open as layout 1, future layouts are
  * refused instead of misread (docs/FORMAT_COMPAT.md).
  */
class FormatVersionSpec extends AnyFunSuite {

  private def fresh(): LocalStorageOps = {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-fmt").toString)
    Graft.createCatalog(s, CatalogDef())
    s
  }

  private def rewriteDef(s: LocalStorageOps)(f: ObjectNode => Unit): Unit = {
    val root = TreeOps.findLatestRoot(s).get
    val path = root.catalogDefPath
    val node = Json.mapper.readTree(s.read(path)).asInstanceOf[ObjectNode]
    f(node)
    s.overwrite(path, Json.mapper.writeValueAsBytes(node))
  }

  test("new catalogs stamp the current format version") {
    val s = fresh()
    val cd = Graft.catalogDef(s, TreeOps.findLatestRoot(s).get)
    assert(cd.formatVersion == CatalogDef.FormatVersion)
  }

  test("a round-1 warehouse (def without the tag) opens as version 1") {
    val s = fresh()
    rewriteDef(s)(_.remove("formatVersion"))
    val cd = Graft.catalogDef(s, TreeOps.findLatestRoot(s).get)
    assert(cd.formatVersion == 1)
    // and the catalog still operates normally on the untagged def
    val t = Graft.beginTransaction(s)
    Graft.createNamespace(s, t, NamespaceDef("ns1"))
    Graft.commitTransaction(s, t)
    val t2 = Graft.beginTransaction(s)
    assert(Graft.showNamespaces(s, t2) == Seq("ns1"))
  }

  test("a future format version is refused, not misread") {
    val s = fresh()
    rewriteDef(s)(_.put("formatVersion", CatalogDef.FormatVersion + 1))
    val e = intercept[IllegalArgumentException] {
      Graft.catalogDef(s, TreeOps.findLatestRoot(s).get)
    }
    assert(e.getMessage.contains("format version"))
  }
}
