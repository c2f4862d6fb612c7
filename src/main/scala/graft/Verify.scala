package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def sessionBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
      .config("spark.sql.extensions",
        classOf[graft.spark.GraftSparkExtensions].getName)
      // storage-partitioned joins (c17): session-level default so query
      // plans/timings are order-independent (no per-query conf mutation)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // no Hadoop native lib offline → RawLocalFileSystem.setPermission
      // forks a chmod process per file create; this impl sets the same
      // bits via java.nio in-process (see GraftLocalFileSystem)
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.spark.GraftLocalFileSystem].getName)
      // release state-store providers when the last streaming query
      // stops — stopped queries' providers otherwise linger in the
      // executor-wide registry and their maintenance walks bill
      // whatever runs next in the session (see GraftStateStoreUnload)
      .config("spark.sql.streaming.streamingQueryListeners",
        classOf[graft.spark.GraftStateStoreUnloadListener].getName)
      .config("spark.ui.enabled", "false")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional: restrict to named queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = sessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: $e")
          e.getStackTrace.take(8).foreach(f => System.err.println(s"    at $f"))
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a null oracle (e.g. an object-initialization forward reference)
    // must not NPE here — that would leave a stale/absent json and
    // silently zero the round's correctness
    val json = SparkEntry.oracleSql
      .filter { case (k, v) =>
        if (v == null) System.err.println(s"[verify] NULL oracle for $k — skipped")
        v != null
      }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
