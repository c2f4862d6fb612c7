package graft.format

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Per-file column statistics harvested from parquet footers at commit
  * time (the reference gets these from Iceberg manifests; graft reads
  * the footers of the files it just wrote — one footer read per file,
  * driver-side, at commit only).
  *
  * Values are serialized as strings in [[DataFileEntry]]; the scan-side
  * pruner re-types them against the table schema. Min/max ignore
  * nulls, so pruning is always conservative.
  */
object ParquetStats {

  final case class FileStats(rowCount: Long,
      minValues: Map[String, String], maxValues: Map[String, String],
      nullCounts: Map[String, Long] = Map.empty)

  def read(absolutePath: String): FileStats = {
    val in = HadoopInputFile.fromPath(new Path(absolutePath), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rowCount = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.Map.empty[String, String]
      val maxs = scala.collection.mutable.Map.empty[String, String]
      // a block without stats poisons the column for the WHOLE file —
      // a later block with stats must not re-insert it, or file-level
      // min/max would under-cover the stats-less block
      val poisoned = scala.collection.mutable.Set.empty[String]
      // null counts track separately: an ALL-NULL block has no min/max
      // but its null count is still known
      val nulls = scala.collection.mutable.Map.empty[String, Long]
      val nullsPoisoned = scala.collection.mutable.Set.empty[String]
      for (block <- blocks; col <- block.getColumns.asScala) {
        // top-level columns only (nested stats are not prunable here)
        if (col.getPath.size() == 1) {
          val name = col.getPath.toDotString
          val stats = col.getStatistics
          if (stats != null && !nullsPoisoned(name) && stats.isNumNullsSet &&
              stats.getNumNulls >= 0)
            nulls(name) = nulls.getOrElse(name, 0L) + stats.getNumNulls
          else {
            nullsPoisoned += name
            nulls.remove(name)
          }
          if (poisoned(name)) ()
          else if (stats != null && stats.hasNonNullValue) {
            val tpe = col.getPrimitiveType.getPrimitiveTypeName
            (render(tpe, stats.genericGetMin.asInstanceOf[AnyRef]),
              render(tpe, stats.genericGetMax.asInstanceOf[AnyRef])) match {
              case (Some(mn), Some(mx)) =>
                mins(name) = mins.get(name).fold(mn)(cur => strMin(cur, mn, tpe))
                maxs(name) = maxs.get(name).fold(mx)(cur => strMax(cur, mx, tpe))
              case _ =>
                poisoned += name
                mins.remove(name); maxs.remove(name)
            }
          } else {
            poisoned += name
            mins.remove(name); maxs.remove(name)
          }
        }
      }
      FileStats(rowCount, mins.toMap, maxs.toMap, nulls.toMap)
    } finally reader.close()
  }

  private def render(tpe: PrimitiveTypeName, v: AnyRef): Option[String] = v match {
    case b: Binary if tpe == PrimitiveTypeName.BINARY => Some(b.toStringUsingUTF8)
    case _: Binary => None // fixed/decimal binaries: not prunable here
    case n: java.lang.Number => Some(n.toString)
    case b: java.lang.Boolean => Some(b.toString)
    case _ => None
  }

  private def numeric(tpe: PrimitiveTypeName): Boolean = tpe match {
    case PrimitiveTypeName.BINARY => false
    case _ => true
  }

  private def strMin(a: String, b: String, tpe: PrimitiveTypeName): String =
    if (numeric(tpe)) { if (BigDecimal(a) <= BigDecimal(b)) a else b }
    else { if (utf8Compare(a, b) <= 0) a else b }

  private def strMax(a: String, b: String, tpe: PrimitiveTypeName): String =
    if (numeric(tpe)) { if (BigDecimal(a) >= BigDecimal(b)) a else b }
    else { if (utf8Compare(a, b) >= 0) a else b }

  // parquet binary min/max order by UTF-8 bytes; the scan-side pruner
  // compares the same way — aggregating across blocks with UTF-16
  // String order would disagree for supplementary characters
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }
}
