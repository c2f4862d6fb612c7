package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds an N× scaled copy of an sf directory for the scaling soak
  * (test tooling only — not part of the shipped library). Each table
  * unions `copies` disjoint "islands": key columns offset per copy so
  * referential structure replicates verbatim; document text is
  * word-salted and embeddings are rotated per copy so duplicate-group
  * and similarity structure REPLICATES instead of inflating
  * quadratically across copies (10 identical copies of every document
  * would give every row 9 new duplicates — a different workload, not
  * a bigger one).
  *
  * Usage: Test/runMain graft.ScaleData <srcDir> <dstDir> [copies] [files]
  */
object ScaleData {

  /** Key offset per copy — far above any base key. */
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    // part files PER TABLE: a single-file table caps scan parallelism
    // at parquet's split granularity and the soak then measures the
    // split ceiling, not the plan (r11's ta17 read a 1.10 exponent
    // that fell to 0.16 on a 16-file copy). Readers take a DIRECTORY
    // named <t>.parquet transparently.
    val files = if (args.length > 3) args(3).toInt else 16
    val spark: SparkSession = Verify.sessionBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def offc(c: String, k: Int): Column = col(c) + lit(k * Off)
    def write(t: String, out: DataFrame, nFiles: Int = files): Unit = {
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      val tmp = s"$dst/.tmp-$t"
      out.repartition(nFiles).write.mode("overwrite").parquet(tmp)
      val target = Paths.get(s"$dst/$t.parquet")
      if (Files.exists(target))
        Files.walk(target).sorted(java.util.Comparator.reverseOrder())
          .forEach((p: Path) => Files.delete(p))
      Files.createDirectories(Paths.get(dst))
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      println(s"SCALED $t x$copies files=$nFiles")
    }
    def scaled(t: String)(per: (DataFrame, Int) => DataFrame): Unit =
      write(t, (0 until copies).map(k => per(rd(t), k)).reduce(_ unionAll _))

    scaled("documents") { (df, k) =>
      if (k == 0) df
      else {
        // word-salt: every space becomes " s<k>" — dup/near-dup pairs
        // WITHIN a copy transform identically (structure preserved),
        // shingles ACROSS copies share almost nothing (no inflation)
        val salted = regexp_replace(col("text"), " ", s" s$k")
        df.select(offc("doc_id", k).as("doc_id"), salted.as("text"),
          col("lang"), col("source"),
          length(salted).cast("long").as("n_chars"))
      }
    }
    scaled("embeddings") { (df, k) =>
      if (k == 0) df
      else {
        // rotation preserves norms and pairwise cosines within a copy;
        // cosine across differently-rotated copies is ~0 for generic
        // vectors, so the near-dup graph replicates rather than fusing
        val dim = size(col("embedding"))
        val rot = concat(slice(col("embedding"), k + 1, 10000),
          slice(col("embedding"), 1, k))
        df.select(offc("vec_id", k).as("vec_id"),
          when(dim > k, rot).otherwise(col("embedding")).as("embedding"),
          col("label"))
      }
    }
    scaled("events") { (df, k) =>
      // same time span, copies× the users/events per window — how a
      // stream actually grows; session/window state scales with rate
      df.select(offc("event_id", k).as("event_id"), col("ts"),
        offc("user_id", k).as("user_id"), col("event_type"), col("value"),
        col("props"))
    }
    scaled("customer") { (df, k) =>
      df.select(offc("c_custkey", k).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }
    scaled("orders") { (df, k) =>
      df.select(offc("o_orderkey", k).as("o_orderkey"),
        offc("o_custkey", k).as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    }
    scaled("lineitem") { (df, k) =>
      df.select(offc("l_orderkey", k).as("l_orderkey"),
        offc("l_partkey", k).as("l_partkey"),
        offc("l_suppkey", k).as("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    }
    scaled("supplier") { (df, k) =>
      df.select(offc("s_suppkey", k).as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }
    scaled("part") { (df, k) =>
      df.select(offc("p_partkey", k).as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }
    // dimension tables stay as-is (copies share nations/regions) and
    // small — one file each
    Seq("nation", "region").foreach(t => write(t, rd(t), nFiles = 1))
    spark.stop()
  }
}
