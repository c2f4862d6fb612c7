package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation over the parquet tables in
  * `sfDir`, plus (when SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same tables. Column names MUST match between the two — the
  * driver sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load one of the driver-provided tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
