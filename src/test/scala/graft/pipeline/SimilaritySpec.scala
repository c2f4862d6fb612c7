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

  test("pq_encode maps each subvector to its nearest subspace centroid") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // dim 4, m = 2 subspaces of sub-dim 2, two centroids each
    val codebook: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),   // subspace 0
      Seq(Seq(5.0, 0.0), Seq(0.0, 5.0)))     // subspace 1
    val df = Seq(
      (1L, Seq(0.1f, -0.1f, 4.9f, 0.2f)),    // → cells (0, 0)
      (2L, Seq(9.5f, 10.5f, 0.3f, 5.2f)))    // → cells (1, 1)
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      graft.functions.GraftFunctions.pqEncode(col("embedding"), codebook)
        .as("code")).orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(0, 0))
    assert(out(1).getSeq[Int](1) == Seq(1, 1))
  }

  test("pq_adc scores equal the exact cosine of the reconstruction") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val codebook = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0), Array(7.0, 8.0)))
    val q = Array(0.5, -1.5, 2.5, 0.25)
    val code = Seq(1, 0) // reconstruction = [3,4,5,6]
    val recon = Array(3.0, 4.0, 5.0, 6.0)
    val expected = {
      val dot = q.zip(recon).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(q.map(x => x * x).sum) *
        math.sqrt(recon.map(x => x * x).sum))
    }
    val dtables: Seq[Seq[Seq[Double]]] = Seq(
      (0 until 2).map(j => (0 until 2).map(c =>
        (0 until 2).map(i => q(j * 2 + i) * codebook(j)(c)(i)).sum)))
    val qnorms = Seq(math.sqrt(q.map(x => x * x).sum))
    val cnorm2: Seq[Seq[Double]] =
      codebook.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq
    val got = Seq((7L, code)).toDF("qid", "code")
      .select(graft.functions.GraftFunctions.pqAdc(col("code"), col("qid"),
        Seq(7L), dtables, qnorms, cnorm2).as("adc"))
      .head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
    // an unknown qid scores null, never a wrong number
    val missing = Seq((8L, code)).toDF("qid", "code")
      .select(graft.functions.GraftFunctions.pqAdc(col("code"), col("qid"),
        Seq(7L), dtables, qnorms, cnorm2).as("adc"))
      .head.isNullAt(0)
    assert(missing)
  }

  test("pq recall gate holds on the clustered id-sorted corpus too") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqskew").toString
    import spark.implicits._
    val n = 1000
    val dim = 16
    (0 until n).map { i =>
      val cluster = if (i < n / 2) 0 else 1
      val emb = (0 until dim).map(j =>
        (if (j == cluster) 10.0 else 0.0) + math.sin(i * 31 + j) * 0.5)
        .map(_.toFloat)
      (i.toLong, emb, cluster)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("ss05_pq_recall")(spark, dir)
      .collect().head
    assert(out.getLong(0) == 5, "all 5 query vectors graded")
    assert(out.getBoolean(2), "pq recall floor holds on the skewed corpus")
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
