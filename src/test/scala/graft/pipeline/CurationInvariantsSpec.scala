package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the late round-10 curation operators —
  * properties the DuckDB value oracle can't express (it only equates
  * the two engines' outputs; these assert the outputs are RIGHT).
  */
class CurationInvariantsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("sp08 apportionment: allocations sum exactly to the budget") {
    val rows = graft.SparkEntry.queries("sp08_budget_alloc")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 1000000L)
  }

  test("sp08 apportionment: every allocation is within 1 of its quota") {
    val rows = graft.SparkEntry.queries("sp08_budget_alloc")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("tokens")).sum.toDouble
    rows.foreach { r =>
      val quota = 1000000L * r.getAs[Long]("tokens") / total
      val alloc = r.getAs[Long]("alloc").toDouble
      assert(math.abs(alloc - quota) < 1.0,
        s"${r.getAs[String]("source")}: alloc $alloc vs quota $quota")
    }
  }

  test("q68 pagerank: the past-broadcast shuffle path is bit-identical") {
    // decimal-exact contribution sums are order-independent, so the
    // partition-aligned variant (rank shuffle-joined on src instead of
    // broadcast) must produce EXACTLY the broadcast plan's rows
    val a = graft.SparkEntry.queries("q68_pagerank")(spark, sf)
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.pagerank.broadcast-max-nodes", "1")
    try {
      val b = graft.SparkEntry.queries("q68_pagerank")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(a == b, "shuffle-path PageRank diverged from broadcast path")
    } finally spark.conf.unset("spark.graft.pagerank.broadcast-max-nodes")
  }

  test("sk03 CMS: never-underestimate and eps-bound flags all hold") {
    val rows = graft.SparkEntry.queries("sk03_cms_heavy_hitters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("lower_ok")), "CMS underestimated")
    assert(rows.forall(_.getAs[Boolean]("upper_ok")), "CMS above eps*N bound")
  }

  test("ta17 entropy: bounded by log2 of the per-doc alphabet; uniform" +
      " and constant extremes are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every corpus doc: 0 <= H <= log2(n_chars) (alphabet <= length)
    val rows = graft.SparkEntry.queries("ta17_char_entropy")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("char_entropy")
      val n = r.getAs[Long]("n_chars")
      assert(h >= -1e-9 && h <= math.log(n.toDouble) / math.log(2) + 1e-9,
        s"doc ${r.getLong(0)}: H=$h out of [0, log2($n)]")
    }
    // synthetic extremes through the same plan: constant text → H = 0;
    // 4 equally-frequent chars → H = 2 bits
    val probe = Seq((1L, "aaaaaaaa"), (2L, "aabbccdd"))
      .toDF("doc_id", "text")
    probe.createOrReplaceTempView("probe_docs")
    val chars = probe
      .select(col("doc_id"), trim(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(t)), i -> substring(t, i, 1))"))
        .as("c"))
    val h = chars.groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("nc"),
        sum(expr("round(cast(n as double) * ln(n), 6)")).as("st"))
      .select(col("doc_id"),
        round((round(log(col("nc")), 6) - col("st") / col("nc")) /
          lit(0.6931471805599453), 4).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(1L) === 0.0)
    assert(h(2L) === 2.0)
  }

  test("ta19 TF-IDF: exactly <=3 keywords per doc, ranks contiguous") {
    val rows = graft.SparkEntry.queries("ta19_tfidf_keywords")(spark, sf)
      .collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rs) =>
      val ranks = rs.map(_.getAs[Int]("rnk")).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length),
        s"doc $doc ranks: ${ranks.mkString(",")}")
    }
  }

  test("ta18 keep implies every individual rule") {
    val rows = graft.SparkEntry.queries("ta18_gopher_quality")(spark, sf)
      .collect()
    rows.filter(_.getAs[Boolean]("keep")).foreach { r =>
      Seq("wc_ok", "mwl_ok", "sym_ok", "alpha_ok", "stop_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"keep row fails $c"))
    }
  }
}
