package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Implemented as `Expression`s (not Scala UDFs) so the whole row stays
  * inside Tungsten: inputs arrive as `ArrayData` (no boxing of the
  * vector into Scala collections), and the dot/norm loop runs over the
  * primitive array — with `doGenCode` so the loop is compiled into the
  * enclosing whole-stage-codegen function. At 100 TB this is the hot
  * path of similarity search; a UDF would serialize every row through
  * an encoder, and a fallback expression would break the codegen span.
  *
  * Accumulation is sequential in `Double`, matching what a columnar
  * engine (e.g. DuckDB's list_cosine_similarity on DOUBLE[]) computes,
  * so results are comparable to an external oracle up to ~1 ulp.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  /** Java source for element i of an ArrayData variable, as double. */
  protected def elemJava(e: Expression, arr: String, i: String): String =
    e.dataType match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }
}

/** cosine_sim(a, b) — cosine similarity of two numeric arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  @transient private lazy val getL = elemGetter(left)
  @transient private lazy val getR = elemGetter(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${elemJava(left, a, i)};
         |  double $y = ${elemJava(right, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** hyperplane_sketch(v) — signs of `nPlanes` random-hyperplane
  * projections, packed into nPlanes/64 long words (random-hyperplane
  * LSH, Charikar 2002). Plane weights are Gaussian, derived
  * deterministically from (seed, plane) so every executor — and every
  * round — sketches identically without shipping a plane matrix.
  *
  * The matrix is materialized ONCE per executor per dimension
  * (lazily, ~128×dim doubles) and the per-row work is nPlanes dot
  * products over the primitive ArrayData — no per-row allocation
  * beyond the output words. With 16-bit bands this gives 2¹⁶ buckets
  * per band; the in-bucket candidate join at N rows is ~N²/2¹⁶ per
  * band, the shape that survives 100 TB (vs. 2⁸ buckets, which
  * degenerates to N²/256).
  */
case class HyperplaneSketch(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  require(nPlanes % 64 == 0, "nPlanes must be a multiple of 64")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val getE: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  // plane matrix per dimension (embedding dim is constant per dataset,
  // so this holds exactly one entry in practice)
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def planesFor(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, d => Array.tabulate(nPlanes) { p =>
      val rng = new java.util.Random(seed * 1000003L + p)
      Array.fill(d)(rng.nextGaussian())
    })

  /** Public so generated code can call through the reference object. */
  def sketch(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val planes = planesFor(dim)
    val words = new Array[Long](nPlanes / 64)
    var p = 0
    while (p < nPlanes) {
      val w = planes(p)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += getE(a, i) * w(i); i += 1 }
      if (dot >= 0.0) words(p >> 6) |= (1L << (p & 63))
      p += 1
    }
    new GenericArrayData(words)
  }

  override def nullSafeEval(v: Any): Any = sketch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the plane loop lives in this instance; codegen calls through a
    // reference object so the surrounding whole-stage span is kept
    val ref = ctx.addReferenceObj("sketcher", this, classOf[HyperplaneSketch].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.sketch($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** nearest_centroids(v) — ids of the `n` nearest centroids to `v` by
  * cosine, ordered best-first (ties by id). The centroid matrix is a
  * PLAN-TIME constant (collected on the driver — centroids are
  * broadcast-sized by construction), so assignment is a pure map-side
  * expression: no crossJoin row explosion, no row_number window
  * shuffle — the N×K assignment shuffle the round-1 IVF paid per
  * Lloyd iteration disappears entirely.
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Double]], cids: Array[Long], n: Int)
    extends UnaryExpression {
  require(centroids.length == cids.length && centroids.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val getE: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  @transient private lazy val cNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Public so generated code can call through the reference object. */
  def nearest(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val k = math.min(n, centroids.length)
    // top-k by insertion — k is tiny (1..nprobe)
    val bestSim = Array.fill(k)(Double.NegativeInfinity)
    val bestId = new Array[Long](k)
    var c = 0
    while (c < centroids.length) {
      val w = centroids(c)
      val m = math.min(dim, w.length)
      var dot = 0.0; var na = 0.0; var i = 0
      while (i < m) { val x = getE(a, i); dot += x * w(i); na += x * x; i += 1 }
      val denom = math.sqrt(na) * cNorms(c)
      val sim = if (denom == 0.0) Double.NegativeInfinity else dot / denom
      // find insertion slot (sim desc, cid asc on ties)
      var slot = k
      while (slot > 0 && (sim > bestSim(slot - 1) ||
        (sim == bestSim(slot - 1) && cids(c) < bestId(slot - 1)))) slot -= 1
      if (slot < k) {
        var j = k - 1
        while (j > slot) { bestSim(j) = bestSim(j - 1); bestId(j) = bestId(j - 1); j -= 1 }
        bestSim(slot) = sim; bestId(slot) = cids(c)
      }
      c += 1
    }
    new GenericArrayData(bestId)
  }

  override def nullSafeEval(v: Any): Any = nearest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cfinder", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.nearest($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_encode(v) — product-quantization codes of `v`: the vector
  * splits into `m` contiguous subvectors and each maps to the id of
  * its nearest (L2) centroid in that subspace's codebook. Output is
  * `m` small ints (4-bit cells at ksub = 16) — the 32× memory
  * compression that lets a 100 TB embedding corpus scan from RAM.
  * The codebook is a plan-time constant (m × ksub × sub-dim doubles —
  * KBs), so encoding is a pure map-side expression like
  * [[NearestCentroids]].
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty))

  private val m = codebook.length
  private val subDim = codebook(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val getE: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  /** Public so generated code can call through the reference object. */
  def encode(a: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = codebook(j)
      val base = j * subDim
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val w = cents(c)
        var dist = 0.0; var i = 0
        while (i < subDim) {
          val diff = getE(a, base + i) - w(i)
          dist += diff * diff; i += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_adc(code, qid) — asymmetric-distance cosine of a PQ code
  * against query `qid`, via per-query LOOKUP TABLES: the dot product
  * of query-subvector × centroid is precomputed for every (subspace,
  * cell), so scoring a candidate costs O(m) table lookups instead of
  * O(dim) multiplies — the ADC scan that makes a PQ index fast. The
  * reconstruction norm comes from a codebook-wide `cnorm2` table
  * (query-independent). Tables are plan-time constants: queries ×
  * m × ksub doubles, bounded like the IVF centroid matrix.
  */
case class PqAdcCosine(left: Expression, right: Expression,
    qids: Array[Long], dtables: Array[Array[Array[Double]]],
    qnorms: Array[Double], cnorm2: Array[Array[Double]])
    extends VectorBinaryExpression {
  require(qids.length == dtables.length && qids.length == qnorms.length)

  // boxed key/value types: a Scala-primitive map would UNBOX a missing
  // key's null to 0 and silently score against query 0
  @transient private lazy val byQid
      : java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val h = new java.util.HashMap[java.lang.Long, java.lang.Integer](
      qids.length * 2)
    qids.indices.foreach(i => h.put(qids(i), i))
    h
  }

  /** Public so generated code can call through the reference object. */
  def score(codeAd: ArrayData, qid: Long): Any = {
    val qi = byQid.get(qid)
    if (qi == null) return null
    val dt = dtables(qi.intValue)
    val m = math.min(codeAd.numElements(), dt.length)
    var dot = 0.0; var r2 = 0.0; var j = 0
    while (j < m) {
      val c = codeAd.getInt(j)
      dot += dt(j)(c); r2 += cnorm2(j)(c); j += 1
    }
    val denom = qnorms(qi) * math.sqrt(r2)
    if (denom == 0.0) null else dot / denom
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    score(l.asInstanceOf[ArrayData], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqadc", this, classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, (code, qid) => s"""
      |Object r = $ref.score($code, $qid);
      |if (r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((Double) r).doubleValue(); }
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** dot_product(a, b) — inner product of two numeric arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  @transient private lazy val getL = elemGetter(left)
  @transient private lazy val getR = elemGetter(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += getL(a, i) * getR(b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${elemJava(left, a, i)}) * (${elemJava(right, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
