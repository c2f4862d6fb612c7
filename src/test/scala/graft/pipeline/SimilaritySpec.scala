package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The IVF operator's driver-held centroid design and its declared
  * ceiling: nlist is bounded, the bound is loud, and a forced
  * non-default nlist still produces a correct index.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def ss02(): org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries("ss02_ann_ivf")(spark, sf)

  test("nlist above the driver-held centroid ceiling is refused loudly") {
    spark.conf.set("spark.graft.ann.nlist", ((1 << 17) + 1).toString)
    try {
      val e = intercept[IllegalArgumentException](ss02())
      assert(e.getMessage.contains("centroid ceiling"), e.getMessage)
    } finally spark.conf.unset("spark.graft.ann.nlist")
  }

  test("a forced larger nlist still builds a working index") {
    // default at sf0.001 is ~√N; force a larger legal list — more,
    // smaller cells — and require the probed search to keep finding
    // ranked neighbors for every query
    spark.conf.set("spark.graft.ann.nlist", "64")
    try {
      val rows = ss02().collect()
      assert(rows.map(_.getLong(0)).distinct.length == 5, "all 5 queries served")
      assert(rows.forall(_.getInt(1) >= 1))
    } finally spark.conf.unset("spark.graft.ann.nlist")
  }

  test("hash-spread seeding keeps recall on an id-sorted clustered corpus") {
    // adversarial ingestion order: ids sort BY CLUSTER, so seeding
    // from the lowest vec_ids would place every initial centroid in
    // cluster A and leave cluster B's recall to whatever 3 Lloyd
    // iterations can recover; the hash-spread seed covers both
    // clusters from the start and the graded recall floor holds
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    import spark.implicits._
    val n = 2000
    val dim = 8
    val rows = (0 until n).map { i =>
      val cluster = if (i < n / 2) 0 else 1
      val emb = (0 until dim).map(j =>
        (if (j == cluster) 10.0 else 0.0) + math.sin(i * 31 + j) * 0.5)
        .map(_.toFloat)
      (i.toLong, emb, cluster)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("ss03_ann_recall")(spark, dir)
      .collect().head
    assert(out.getLong(0) == 5, "all 5 query vectors graded")
    assert(out.getBoolean(2), "recall floor holds on the skewed corpus")
  }

  test("the ceiling is configurable for drivers sized to match") {
    spark.conf.set("spark.graft.ann.nlist", "300")
    spark.conf.set("spark.graft.ann.nlist-max", "200")
    try {
      val e = intercept[IllegalArgumentException](ss02())
      assert(e.getMessage.contains("nlist-max"), e.getMessage)
    } finally {
      spark.conf.unset("spark.graft.ann.nlist")
      spark.conf.unset("spark.graft.ann.nlist-max")
    }
  }
}
