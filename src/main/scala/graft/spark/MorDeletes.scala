package graft.spark

import graft.format.{DataFileEntry, DeletePredicate}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Coalesce, Expression, Literal, Not}
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** Merge-on-read delete mechanics shared by the scan path, the
  * copy-on-write rewrite paths, compaction, and CDC.
  *
  * A mor DELETE commits a PREDICATE (physical column names, SQL text)
  * instead of rewriting files. A predicate with sequence S applies to
  * exactly the files whose entry.seq <= S — the files that existed when
  * the delete committed; later appends are untouched. A row survives a
  * read when every applicable predicate is NOT TRUE (SQL DELETE removes
  * only rows where the condition is TRUE — NULL keeps the row).
  *
  * At 100 TB this turns a sparse delete from a terabyte rewrite into
  * one small metadata commit; the residual filter rides every read of
  * the covered files until a rewrite or compaction materializes it.
  */
private[graft] object MorDeletes {

  /** Predicates that apply to a file added at `fileSeq`. */
  def applicable(deletes: Seq[DeletePredicate], fileSeq: Long)
      : Seq[DeletePredicate] =
    deletes.filter(_.seq >= fileSeq)

  /** Does any pending predicate bite any of these files? */
  def pending(deletes: Seq[DeletePredicate],
      entries: Seq[DataFileEntry]): Boolean =
    deletes.nonEmpty && entries.exists(f => applicable(deletes, f.seq).nonEmpty)

  /** Partition `entries` by their applicable-predicate list. Group
    * count is bounded by the number of distinct delete epochs (≤
    * pending predicates + 1), not by file count. Deterministic order:
    * fewest predicates first (the untouched group leads).
    */
  def groups[A](entries: Seq[(A, DataFileEntry)],
      deletes: Seq[DeletePredicate])
      : Seq[(Seq[DeletePredicate], Seq[(A, DataFileEntry)])] =
    entries.groupBy(e => applicable(deletes, e._2.seq))
      .toSeq.sortBy(_._1.length)

  /** Catalyst survive-condition over `attrs` (physical names):
    * AND over predicates of NOT(coalesce(pred, false)).
    */
  def keepExpr(spark: SparkSession, preds: Seq[DeletePredicate],
      attrs: Seq[Attribute]): Expression = {
    val byName = attrs.map(a => a.name -> a).toMap
    preds.map { p =>
      val parsed = spark.sessionState.sqlParser.parseExpression(p.sql)
      val resolved = parsed.transform {
        case u: UnresolvedAttribute if byName.contains(u.nameParts.last) =>
          byName(u.nameParts.last)
      }
      require(!resolved.exists(_.isInstanceOf[UnresolvedAttribute]),
        s"delete predicate references unknown column: ${p.sql}")
      Not(Coalesce(Seq(resolved, Literal(false)))): Expression
    }.reduce(And(_, _))
  }

  /** Column names a predicate list reads (physical). */
  def referencedColumns(spark: SparkSession,
      preds: Seq[DeletePredicate]): Seq[String] =
    preds.flatMap { p =>
      spark.sessionState.sqlParser.parseExpression(p.sql).collect {
        case u: UnresolvedAttribute => u.nameParts.last
      }
    }.distinct

  /** DataFrame survive-filter (physical column names in scope). */
  def keepColumn(preds: Seq[DeletePredicate]): Column =
    preds.map(p => not(coalesce(expr(p.sql), lit(false)))).reduce(_ && _)

  /** Read `entries` (absolute path, entry) as ONE DataFrame under
    * `physSchema`, with every applicable pending delete applied — the
    * read every rewrite path (copy-on-write row ops, compaction) must
    * use so logically-deleted rows never resurrect through a rewrite.
    */
  def readEntries(spark: SparkSession,
      physSchema: org.apache.spark.sql.types.StructType,
      basePath: Option[String],
      entries: Seq[(String, DataFileEntry)],
      deletes: Seq[DeletePredicate]): DataFrame = {
    def read(paths: Seq[String]): DataFrame = {
      val r0 = spark.read.schema(physSchema)
      val r = basePath.map(b => r0.option("basePath", b)).getOrElse(r0)
      r.parquet(paths: _*)
    }
    if (entries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physSchema)
    groups(entries, deletes).map { case (preds, es) =>
      val df = read(es.map(_._1))
      if (preds.isEmpty) df else df.filter(keepColumn(preds))
    }.reduce(_ unionAll _)
  }
}
