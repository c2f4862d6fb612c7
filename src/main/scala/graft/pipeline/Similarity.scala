package graft.pipeline

import graft.QueryDef
import graft.QueryDef.table
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * ss01 is the exact brute-force baseline (oracle-checked); ss02 is the
  * IVF-style scale path: coarse-quantize every vector to its nearest
  * centroid, then restrict each query's search to its `nprobe` nearest
  * centroid cells. At 100 TB the data side is hash-partitioned by
  * cluster id and only the probed cells are scanned; centroids are a
  * broadcast-sized table.
  */
object Similarity {

  private val K = 10 // neighbors per query
  private val NQ = 5 // query vectors: vec_id < NQ

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ss01_brute_topk",
      (s, d) => {
        GraftFunctions.register(s)
        val e = table(s, d, "embeddings").select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val w = Window.partitionBy("qid")
          .orderBy(col("cos_sim").desc, col("vec_id"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos_sim",
            round(GraftFunctions.cosineSim(col("embedding"), col("qvec")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select("qid", "rank", "vec_id", "cos_sim")
          .orderBy("qid", "rank")
      },
      Some(s"""SELECT qid, rank, vec_id, cos_sim FROM (
              |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
              |         round(list_cosine_similarity(e.embedding::DOUBLE[],
              |                                      q.embedding::DOUBLE[]), 4) AS cos_sim,
              |         row_number() OVER (
              |           PARTITION BY q.vec_id
              |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
              |                                                 q.embedding::DOUBLE[]), 4) DESC,
              |                    e.vec_id) AS rank
              |  FROM embeddings e, embeddings q
              |  WHERE q.vec_id < $NQ AND e.vec_id != q.vec_id
              |)
              |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    QueryDef(
      "ss02_ann_ivf",
      (s, d) => {
        // IVF with k-means training: deterministic seeding (16 lowest
        // vec_ids), 3 Lloyd iterations computed distributed (assign via
        // broadcast-centroid join, recompute means element-wise), then
        // probe the 4 nearest cells per query and run exact cosine
        // within the probed cells only. Centroids stay broadcast-sized;
        // the big side never shuffles for assignment.
        GraftFunctions.register(s)
        val e = table(s, d, "embeddings").select("vec_id", "embedding")
        var centroids = e.orderBy("vec_id").limit(16)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        for (_ <- 1 to 3) {
          val assigned = {
            val wn = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
            e.crossJoin(broadcast(centroids))
              .withColumn("csim", GraftFunctions.cosineSim(col("embedding"), col("cvec")))
              .withColumn("crank", row_number().over(wn))
              .filter(col("crank") === 1)
              .select(col("cid"), col("embedding"))
          }
          // element-wise mean per cluster: explode positions, average,
          // reassemble in position order
          centroids = assigned
            .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
            .groupBy("cid", "pos")
            .agg(avg("x").as("m"))
            .groupBy("cid")
            .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
            .select(col("cid"),
              expr("transform(pm, p -> CAST(p.m AS FLOAT))").as("cvec"))
        }
        val cents = broadcast(centroids)
        def nearestCells(df: org.apache.spark.sql.DataFrame, vec: String, n: Int) = {
          val wn = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
          df.crossJoin(cents)
            .withColumn("csim", GraftFunctions.cosineSim(col(vec), col("cvec")))
            .withColumn("crank", row_number().over(wn))
            .filter(col("crank") <= n)
        }
        val assigned = nearestCells(e, "embedding", 1)
          .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
        val queries = nearestCells(
          e.filter(col("vec_id") < NQ), "embedding", 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("cid").as("cell"))
        val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
        assigned.join(queries, "cell")
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos_sim",
            round(GraftFunctions.cosineSim(col("embedding"), col("qvec")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select("qid", "rank", "vec_id", "cos_sim")
          .orderBy("qid", "rank")
      },
      None), // approximate: recall measured against ss01, not an oracle

    QueryDef(
      "ss03_ann_recall",
      (s, d) => {
        // quality harness: recall@10 of the IVF path against the exact
        // brute-force baseline, per query vector — the measurement a
        // production ANN deployment monitors.
        val exact = defs.find(_.name == "ss01_brute_topk").get.fn(s, d)
          .select(col("qid"), col("vec_id"))
        val approx = defs.find(_.name == "ss02_ann_ivf").get.fn(s, d)
          .select(col("qid").as("a_qid"), col("vec_id").as("a_vec"))
        exact.join(approx,
            col("qid") === col("a_qid") && col("vec_id") === col("a_vec"),
            "left_outer")
          .groupBy("qid")
          .agg((count(col("a_vec")).cast("double") / count(lit(1)))
            .as("recall_at_10"))
          .orderBy("qid")
      },
      None)
  )
}
