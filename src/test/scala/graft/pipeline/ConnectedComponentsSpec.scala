package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** dd07's clustering core: small-star/large-star connected components
  * must converge in O(log n) rounds even on adversarial chain-shaped
  * components — the case plain label propagation (bounded rounds)
  * would silently mislabel.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", "id", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference labeling: driver-side union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("40-deep chain converges to the minimum label") {
    // 0-1-2-…-40: diameter 40; label propagation capped at 20 rounds
    // would leave the tail wrongly labeled — star exchanges must not
    val edges = (0L until 40L).map(i => (i, i + 1))
    val labels = cc(edges)
    assert(labels.size == 41)
    assert(labels.values.forall(_ == 0L), s"non-min labels: ${
      labels.filter(_._2 != 0L)}")
  }

  test("mixed components match union-find") {
    // two chains, one star, one triangle with cross edge, shuffled ids
    val edges = Seq[(Long, Long)](
      (7, 3), (3, 11), (11, 9),               // chain rooted at 3
      (100, 50), (100, 60), (100, 70),        // star, min 50
      (201, 202), (202, 203), (203, 201), (203, 204), // triangle + tail
      (1000, 999))
    assert(cc(edges) == unionFind(edges))
  }

  test("non-convergence inside the round budget throws, never mislabels") {
    import spark.implicits._
    val edges = (0L until 16L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, "a", "b", "id", "label",
        maxRounds = 1).collect()
    }
  }
}
