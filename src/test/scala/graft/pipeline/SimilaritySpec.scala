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
