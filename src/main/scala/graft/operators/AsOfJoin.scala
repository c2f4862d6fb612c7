package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF join: for each left row, the single most recent right row with
  * the same key whose timestamp is ≤ the left timestamp.
  *
  * Spark has no built-in as-of join; per the preference order the
  * implementation COMPOSES existing operators rather than adding a
  * custom plan node: both sides are clustered by key (one shuffle
  * each — `cogroup` on `KeyValueGroupedDataset`), and each key's
  * partitions are merged with a two-cursor sweep over the
  * timestamp-sorted rows — O(n log n) per key for the sort, O(n+m) for
  * the merge, no per-row binary search, no broadcast.
  *
  * Skew guard: the per-key merge materializes one key's rows in one
  * task, so a pathologically hot key would become a straggler (and an
  * OOM risk) at 100 TB. Keys whose combined row count exceeds
  * `hotThreshold` are detected up front (map-side-combined count) and
  * routed through TIME BUCKETS: each hot key's timeline splits into
  * `nBuckets` ranges, left rows land in their range's bucket, right
  * rows land in theirs, and each bucket additionally receives the
  * latest right row from any EARLIER bucket (the carry-forward
  * boundary), so the merge inside a (key, bucket) group is exact.
  * One hot key then occupies `nBuckets` tasks instead of one.
  */
object AsOfJoin {

  /** `left` and `right` must both contain `keyCol` (long) and `tsCol`
    * (long). Output: every left row + the matched right row's
    * `valueCols` (null when no right row is at or before the left
    * timestamp).
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], hotThreshold: Long = 2000000L,
      nBuckets: Int = 32): DataFrame = {
    // hot-key detection: per-key row counts partial-aggregate map-side,
    // so the wire carries one row per distinct key per partition
    val hotKeys: Array[Long] =
      left.groupBy(keyCol).count()
        .union(right.groupBy(keyCol).count())
        .groupBy(keyCol).agg(sum("count").as("n"))
        .filter(col("n") > hotThreshold)
        .orderBy(col("n").desc).limit(1000)
        .select(col(keyCol).cast("long")).collect().map(_.getLong(0))

    if (hotKeys.isEmpty) plainJoin(left, right, keyCol, tsCol, valueCols)
    else bucketedJoin(left, right, keyCol, tsCol, valueCols, hotKeys, nBuckets)
  }

  private def plainJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftSchema = left.schema
    val outSchema = StructType(leftSchema.fields ++
      valueCols.map(c => right.schema(c).copy(nullable = true)))
    val outEnc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyIdxL = leftSchema.fieldIndex(keyCol)
    val tsIdxL = leftSchema.fieldIndex(tsCol)
    val keyIdxR = right.schema.fieldIndex(keyCol)
    val tsIdxR = right.schema.fieldIndex(tsCol)
    val valIdxR = valueCols.map(right.schema.fieldIndex)

    val leftG = left.groupByKey(r => r.getLong(keyIdxL))(Encoders.scalaLong)
    val rightG = right.groupByKey(r => r.getLong(keyIdxR))(Encoders.scalaLong)

    leftG.cogroup(rightG) { (_, ls, rs) =>
      merge(ls, rs, tsIdxL, tsIdxR, valIdxR, dropLeftTail = 0)
    }(outEnc)
  }

  private def bucketedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], hotKeys: Array[Long],
      nBuckets: Int): DataFrame = {
    val spark = left.sparkSession
    val hotLit = typedlit(hotKeys.toSeq)

    // hot rows' global time range (both sides) fixes the bucket width
    def range(df: DataFrame): (Option[Long], Option[Long]) = {
      val r = df.filter(array_contains(hotLit, col(keyCol)))
        .agg(min(col(tsCol)), max(col(tsCol))).head()
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }
    val (lmn, lmx) = range(left)
    val (rmn, rmx) = range(right)
    val mn = (lmn.toSeq ++ rmn.toSeq).minOption.getOrElse(0L)
    val mx = (lmx.toSeq ++ rmx.toSeq).maxOption.getOrElse(0L)
    val width = math.max(1L, (mx - mn) / nBuckets + 1)

    // cold rows all share bucket 0 (one group per key, as before);
    // hot rows land in 1..nBuckets by time range
    def bucketCol: Column =
      when(array_contains(hotLit, col(keyCol)),
        least(greatest(((col(tsCol) - lit(mn)) / lit(width)).cast("long") + 1,
          lit(1L)), lit(nBuckets.toLong))).otherwise(lit(0L))

    val leftT = left.withColumn("__b", bucketCol)
    val rightT = right.withColumn("__b", bucketCol)

    // carry-forward boundaries: for every hot (key, bucket), the latest
    // right row from any earlier bucket — |hot| × nBuckets rows total,
    // computed from per-bucket argmaxes (struct max orders by ts first)
    val rightStruct = struct(right.columns.map(col): _*)
    val perBucket = right.filter(array_contains(hotLit, col(keyCol)))
      .groupBy(col(keyCol), bucketCol.as("__b"))
      .agg(max(struct(col(tsCol).as("__ts"), rightStruct.as("__row"))).as("mx"))
    import spark.implicits._
    val grid = hotKeys.toSeq.toDF(keyCol)
      .withColumn("__b", explode(array((1 to nBuckets).map(b => lit(b.toLong)): _*)))
    val carryW = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = grid.join(perBucket, Seq(keyCol, "__b"), "left")
      .withColumn("carry", max(col("mx")).over(carryW))
      .filter(col("carry").isNotNull)
      .select(col("carry.__row.*"), col("__b"))
    val rightAll = rightT.union(bounds)

    val leftSchema = left.schema
    val outSchema = StructType(leftSchema.fields ++
      valueCols.map(c => right.schema(c).copy(nullable = true)))
    val outEnc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyIdxL = leftSchema.fieldIndex(keyCol)
    val tsIdxL = leftSchema.fieldIndex(tsCol)
    val bIdxL = leftSchema.length
    val keyIdxR = right.schema.fieldIndex(keyCol)
    val tsIdxR = right.schema.fieldIndex(tsCol)
    val bIdxR = right.schema.length
    val valIdxR = valueCols.map(right.schema.fieldIndex)

    val kEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val leftG = leftT.groupByKey(r => (r.getLong(keyIdxL), r.getLong(bIdxL)))(kEnc)
    val rightG = rightAll.groupByKey(r => (r.getLong(keyIdxR), r.getLong(bIdxR)))(kEnc)

    leftG.cogroup(rightG) { (_, ls, rs) =>
      merge(ls, rs, tsIdxL, tsIdxR, valIdxR, dropLeftTail = 1)
    }(outEnc)
  }

  /** Two-cursor sweep over one group's timestamp-sorted rows. */
  private def merge(ls: Iterator[Row], rs: Iterator[Row], tsIdxL: Int,
      tsIdxR: Int, valIdxR: Seq[Int], dropLeftTail: Int): Iterator[Row] = {
    val lSorted = ls.toArray.sortBy(_.getLong(tsIdxL))
    val rSorted = rs.toArray.sortBy(_.getLong(tsIdxR))
    var j = 0
    var last: Row = null
    lSorted.iterator.map { l =>
      val t = l.getLong(tsIdxL)
      while (j < rSorted.length && rSorted(j).getLong(tsIdxR) <= t) {
        last = rSorted(j); j += 1
      }
      val extra =
        if (last == null) valIdxR.map(_ => null)
        else valIdxR.map(last.get)
      Row.fromSeq(l.toSeq.dropRight(dropLeftTail) ++ extra)
    }
  }

  /** Heavy-hitter keys of `df(key)`, estimated from a bounded sample:
    * keys whose sampled count exceeds both `heavyFactor` × the mean
    * sampled key count and an absolute floor (sampling noise guard).
    * Driver-held and capped at `cap` keys — the result feeds an
    * `isin()` predicate, so it must stay broadcast-literal sized; a
    * corpus with more than `cap` genuinely heavy keys is beyond
    * salting anyway (that is a repartition-by-key-range problem).
    */
  def detectHeavyKeys(df: DataFrame, key: String, fraction: Double = 0.01,
      heavyFactor: Double = 8.0, floor: Long = 20L,
      cap: Int = 1024): Seq[Any] = {
    val sampled = df.select(key).sample(fraction).groupBy(key)
      .agg(count(lit(1)).as("__n"))
    val Row(total: Long, distinct: Long) = sampled
      .agg(sum("__n").cast("long"), count(lit(1))).head
    if (distinct == 0) return Seq.empty
    val threshold = math.max(heavyFactor * total.toDouble / distinct,
      floor.toDouble)
    sampled.filter(col("__n") >= threshold)
      .orderBy(col("__n").desc).limit(cap)
      .collect().map(_.get(0)).toSeq
  }

  /** Skew-resistant equi-join, salted ONLY where skew exists: probe
    * keys detected heavy (bounded sample, [[detectHeavyKeys]]) are
    * salted `salt` ways against the replicated HEAVY SLICE of the
    * build side; all other keys take the plain shuffle join, and the
    * two halves union. Replicating the whole build side `salt`× —
    * the naive salting recipe — multiplies the build shuffle by
    * `salt` even on skew-free data, which at 100 TB is paying 8× for
    * insurance; here replication is confined to the keys that need
    * it. Result is row-identical to the plain inner join (the heavy
    * set only routes rows between physically-identical-semantics
    * paths).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int, sampleFraction: Double = 0.01): DataFrame = {
    val heavyKeys = detectHeavyKeys(probe, key, sampleFraction)
    if (heavyKeys.isEmpty) return probe.join(build, Seq(key))
    val isHeavy = col(key).isin(heavyKeys: _*)
    val light = probe.filter(!isHeavy).join(build, Seq(key))
    val salted = probe.filter(isHeavy)
      .withColumn("__salt", pmod(spark_partition_id() +
        monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicated = build.filter(isHeavy).withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    val heavy = salted.join(replicated, Seq(key, "__salt")).drop("__salt")
    light.unionByName(heavy)
  }
}
