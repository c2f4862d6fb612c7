package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}

/** Registration + Column-level API for graft's native expressions.
  *
  * Spark 4 removed public `new Column(Expression)`, so expressions are
  * exposed through the session FunctionRegistry and invoked with
  * `call_function` — which also makes them usable from SQL.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSignature(exprs.head, 32), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_isect", exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_jaccard_ge_05", exprs => JaccardGe(exprs(0), exprs(1), 0.5), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_langid", exprs => LangIdTrigram(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hyperplane_sketch",
      exprs => HyperplaneSketch(exprs.head, nPlanes = 256, seed = 42L), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nearest_cells", exprs => {
        // the centroid matrix / ids / n arrive as foldable literals and
        // are decoded ONCE here, at function-build time
        val cd = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val matrix = Array.tabulate(cd.numElements())(i => cd.getArray(i).toDoubleArray())
        val ids = exprs(2).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        val n = exprs(3).eval(null).asInstanceOf[Int]
        NearestCentroids(exprs(0), matrix, ids, n)
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_encode", exprs => {
        PqEncode(exprs(0), decode3d(exprs(1)))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_adc", exprs => {
        val qids = exprs(2).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray()
        val qnorms = exprs(4).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()
        PqAdcCosine(exprs(0), exprs(1), qids, decode3d(exprs(3)), qnorms,
          decode2d(exprs(5)))
      }, "built-in")
  }

  private def decode2d(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Array[Array[Double]] = {
    val ad = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def decode3d(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Array[Array[Array[Double]]] = {
    val ad = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val inner = ad.getArray(i)
      Array.tabulate(inner.numElements())(j => inner.getArray(j).toDoubleArray())
    }
  }

  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine_sim", a, b)
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def simhash64(c: Column): Column = call_function("graft_simhash64", c)
  def fingerprint64(c: Column): Column = call_function("graft_fingerprint64", c)
  def minhash(c: Column): Column = call_function("graft_minhash", c)
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_isect", a, b)
  def jaccardGeHalf(a: Column, b: Column): Column =
    call_function("graft_jaccard_ge_05", a, b)
  def langIdTrigram(c: Column): Column = call_function("graft_langid", c)
  def hyperplaneSketch(c: Column): Column =
    call_function("graft_hyperplane_sketch", c)
  def nearestCentroids(v: Column, cents: Seq[Seq[Double]], cids: Seq[Long],
      n: Int): Column =
    call_function("graft_nearest_cells", v, typedlit(cents), typedlit(cids), lit(n))
  def pqEncode(v: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    call_function("graft_pq_encode", v, typedlit(codebook))
  def pqAdc(code: Column, qid: Column, qids: Seq[Long],
      dtables: Seq[Seq[Seq[Double]]], qnorms: Seq[Double],
      cnorm2: Seq[Seq[Double]]): Column =
    call_function("graft_pq_adc", code, qid, typedlit(qids),
      typedlit(dtables), typedlit(qnorms), typedlit(cnorm2))
}
