package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-area modules; every operator the
  * engine claims is represented by one entry here, with a DuckDB oracle
  * where the semantics are SQL-expressible.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Advanced.defs ++
      graft.queries.TpchMore.defs ++
      graft.queries.OperatorQueries.defs ++
      graft.queries.CatalogQueries.defs ++
      graft.pipeline.TextAnalysis.defs ++
      graft.pipeline.Sampling.defs ++
      graft.pipeline.Dedup.defs ++
      graft.pipeline.Similarity.defs ++
      graft.pipeline.Multimodal.defs ++
      graft.pipeline.Sketches.defs ++
      graft.streaming.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join3_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
