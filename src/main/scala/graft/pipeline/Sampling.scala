package graft.pipeline

import graft.QueryDef
import graft.QueryDef.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators over `documents`: deterministic
  * sampling and token-budget sequence packing. Both are the
  * reproducibility-critical steps of a data pipeline — a re-run on the
  * same corpus must select the same rows and pack the same sequences,
  * with no RNG state and no driver involvement.
  */
object Sampling {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sp01_hash_sample",
      (s, d) =>
        // Deterministic content-stable sampling: a doc is in the ~19%
        // sample iff the first hex digit of md5(doc_id) falls in a
        // fixed set. No RNG, no seed state, no sampling drift between
        // runs or engines — the property a 100 TB corpus re-run needs
        // (Bernoulli `TABLESAMPLE` draws differ per partitioning).
        // Scan-local: the filter rides the scan, nothing shuffles.
        table(s, d, "documents")
          .where(substring(md5(col("doc_id").cast("string")), 1, 1)
            .isin("0", "1", "2"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum(length(col("text"))).as("sampled_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_sampled,
             |       CAST(sum(length(text)) AS BIGINT) AS sampled_chars
             |FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "sp02_sequence_pack",
      (s, d) => {
        // Token-budget sequence packing: documents pack greedily (in
        // doc_id order, per language) into sequences of ≤2048
        // whitespace tokens — seq = floor(exclusive-cumsum / budget).
        // One window per language partition; at 100 TB this is a single
        // shuffle on lang and a linear pass, the standard layout step
        // before tokenized-example writing.
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "documents")
          .withColumn("n_tok", size(split(trim(col("text")), "\\s+")))
          .withColumn("seq_id",
            floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(2048)))
          .groupBy("lang", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("seq_tokens"))
          .orderBy("lang", "seq_id")
      },
      Some("""SELECT lang, seq_id, count(*) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS seq_tokens
             |FROM (
             |  SELECT lang, doc_id, n_tok,
             |         CAST(floor((sum(n_tok) OVER (PARTITION BY lang
             |                ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |              - n_tok) / 2048) AS BIGINT) AS seq_id
             |  FROM (
             |    SELECT lang, doc_id, text,
             |           len(string_split_regex(trim(text), '\s+')) AS n_tok
             |    FROM documents)
             |)
             |GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin))
  )
}
