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

  /** sp07's oracle SQL, shared: sp09 embeds it as a subquery (DuckDB
    * allows a nested WITH inside a parenthesized derived table).
    */
  private val sp07OracleSql: String =
    """WITH words AS (
      |  SELECT doc_id, lang,
      |         unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents),
      |bw AS (SELECT doc_id, lang, substr(md5(word), 1, 3) AS b
      |       FROM words),
      |tgt AS (SELECT b, count(*) AS tc FROM bw
      |        WHERE lang = 'en' GROUP BY 1),
      |corpus AS (SELECT b, count(*) AS ac FROM bw GROUP BY 1),
      |ratio AS (
      |  SELECT corpus.b,
      |         CAST(round(ln(
      |           ((coalesce(tc, 0) + 0.5) /
      |            ((SELECT sum(tc) FROM tgt) + 0.5 * 4096)) /
      |           ((ac + 0.5) /
      |            ((SELECT sum(ac) FROM corpus) + 0.5 * 4096))), 6)
      |           AS DECIMAL(18,6)) AS lr
      |  FROM corpus LEFT JOIN tgt ON corpus.b = tgt.b)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(CAST(sum(lr) AS DOUBLE) / count(*), 4)
      |         AS dsir_weight
      |FROM bw JOIN ratio ON bw.b = ratio.b
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

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
             |GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin)),

    QueryDef(
      "sp03_stratified_split",
      (s, d) => {
        // Deterministic train/val/test assignment: the first hex digit
        // of md5(doc_id) buckets every document 14/1/1 (87.5% / 6.25%
        // / 6.25%) — content-stable like sp01, so a re-run (or another
        // engine) assigns identical splits with zero leakage drift,
        // and membership is decidable per row with no global state.
        // Stratification falls out of the hash's uniformity per
        // language; the aggregation grades the per-stratum counts.
        val bucket =
          substring(md5(col("doc_id").cast("string")), 1, 1)
        table(s, d, "documents")
          .withColumn("split",
            when(bucket === "e", lit("val"))
              .when(bucket === "f", lit("test"))
              .otherwise(lit("train")))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"))
          .orderBy("lang", "split")
      },
      Some("""SELECT lang,
             |       CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
             |         WHEN 'e' THEN 'val' WHEN 'f' THEN 'test'
             |         ELSE 'train' END AS split,
             |       count(*) AS n_docs,
             |       CAST(sum(length(text)) AS BIGINT) AS n_chars
             |FROM documents
             |GROUP BY lang, split ORDER BY lang, split""".stripMargin)),

    QueryDef(
      "sp04_temperature_mix",
      (s, d) => {
        // Multilingual temperature sampling (the mC4/XLM-R recipe):
        // downsample each language toward the smallest one with
        // keep-rate p_l = (n_min / n_l)^(1-alpha), alpha = 0.3 — big
        // languages flatten, the smallest keeps everything. Membership
        // stays content-stable: a doc is kept iff its md5 bucket (two
        // hex digits, 0..255) falls under p_l·256, so re-runs and
        // other engines select identical rows (p_l rounds to 4
        // decimals on both sides — pow() ulp differences can never
        // flip a 1/256-granular comparison). Per-language counts are
        // one tiny aggregate joined back broadcast; the corpus scan
        // never shuffles.
        val hexVal = (c: org.apache.spark.sql.Column) =>
          instr(lit("0123456789abcdef"), c) - 1
        val docs = table(s, d, "documents")
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
          .agg(min("n_l").as("n_min"),
            collect_list(struct(col("lang"), col("n_l"))).as("ls"))
          .select(explode(col("ls")).as("e"), col("n_min"))
          .select(col("e.lang").as("lang"), col("e.n_l").as("n_l"),
            col("n_min"))
          .withColumn("p",
            round(pow(col("n_min").cast("double") / col("n_l"), 0.7), 4))
        val h = md5(col("doc_id").cast("string"))
        docs.join(broadcast(counts), "lang")
          .withColumn("bucket",
            hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1)))
          .filter(col("bucket") < col("p") * 256.0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            first(col("n_l")).as("n_total"),
            first(col("p")).as("keep_rate"))
          .orderBy("lang")
      },
      Some("""WITH counts AS (
             |  SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
             |rates AS (
             |  SELECT lang, n_l,
             |         round(pow(CAST((SELECT min(n_l) FROM counts) AS DOUBLE)
             |                   / n_l, 0.7), 4) AS p
             |  FROM counts),
             |kept AS (
             |  SELECT d.lang,
             |         (strpos('0123456789abcdef',
             |            substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             |         + (strpos('0123456789abcdef',
             |            substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1)
             |           AS bucket,
             |         r.p, r.n_l
             |  FROM documents d JOIN rates r USING (lang))
             |SELECT lang, count(*) AS n_kept,
             |       CAST(max(n_l) AS BIGINT) AS n_total,
             |       max(p) AS keep_rate
             |FROM kept WHERE bucket < p * 256.0
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "sp05_stratified_topk",
      (s, d) => {
        // Exactly-k-per-stratum carving (held-out eval sets, human-
        // review batches): every language contributes its k=20 docs
        // with the LOWEST md5(doc_id) — content-stable rank, so
        // re-runs and other engines carve the identical set, unlike
        // a `LIMIT k` whose rows depend on scan order. The top-k is
        // TWO-PHASE: per-partition heads first (row_number inside
        // (lang, partition)), then the global rank runs over ≤ P·k
        // survivors per language — no language funnels its whole
        // corpus through one reducer.
        val k = 20
        val docs = table(s, d, "documents")
          .withColumn("h", md5(col("doc_id").cast("string")))
        val local = Window.partitionBy("lang", "pid")
          .orderBy(col("h"), col("doc_id"))
        val global = Window.partitionBy("lang")
          .orderBy(col("h"), col("doc_id"))
        docs
          .withColumn("pid", spark_partition_id())
          .withColumn("lr", row_number().over(local))
          .filter(col("lr") <= k)
          .withColumn("rank", row_number().over(global))
          .filter(col("rank") <= k)
          .select(col("lang"), col("doc_id"), col("rank"))
          .orderBy("lang", "rank")
      },
      Some("""SELECT lang, doc_id, CAST(r AS INT) AS rank FROM (
             |  SELECT lang, doc_id, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
             |  FROM documents)
             |WHERE r <= 20 ORDER BY lang, rank""".stripMargin)),

    QueryDef(
      "sp06_epoch_shuffle",
      (s, d) => {
        // Deterministic EPOCH SHUFFLE: training runs need a global
        // permutation of the corpus that (a) differs per epoch, (b) is
        // identical across engines, re-runs, and partitionings — so a
        // resumed job continues mid-epoch at the same order. Sort key
        // = md5(epoch ‖ doc_id): content-stable, uniformly
        // distributed, so the sort is a balanced range partition at
        // any scale (no hot ranges, unlike sorting by time or source).
        // Emitted here: the first 50 positions of epoch 7, the shape a
        // sharded data loader would read.
        val epoch = 7
        table(s, d, "documents")
          .select(col("doc_id"),
            md5(concat(lit(epoch.toString), lit(":"),
              col("doc_id").cast("string"))).as("k"))
          .orderBy(col("k"), col("doc_id"))
          .limit(50)
          .select(row_number().over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("k"), col("doc_id"))).as("position"),
            col("doc_id"))
      },
      Some("""SELECT CAST(row_number() OVER (ORDER BY k, doc_id) AS INT)
             |         AS position, doc_id
             |FROM (SELECT doc_id,
             |             md5('7:' || CAST(doc_id AS VARCHAR)) AS k
             |      FROM documents)
             |ORDER BY k, doc_id LIMIT 50""".stripMargin)),

    QueryDef(
      "sp07_dsir_weights",
      (s, d) => {
        // DSIR-style importance weights (Xie et al. 2023,
        // arXiv:2302.03169): score every document by how much its
        // hashed-unigram distribution looks like a TARGET domain
        // (here: the English slice) versus the whole corpus —
        // per-doc mean of log(p_target(bucket) / p_corpus(bucket))
        // with add-half smoothing over 4096 md5 buckets (the paper's
        // hashed n-gram features; hex-prefix bucketing is
        // engine-portable). The selection step then keeps the top
        // weights; emitted here are the weights themselves.
        //
        // 100 TB shape: three aggregation passes over the exploded
        // token stream — two build the 4096-row frequency tables
        // (map-side combined, then broadcast), the third sums the
        // looked-up log-ratios per doc_id. The ratio table is KB-scale
        // at any corpus size, so the scoring pass never shuffles the
        // corpus by anything but doc_id (the 1-row totals land on the
        // 4096-row table as scalar-subquery BroadcastNestedLoopJoins —
        // trivial build sides, see q27). Log-ratios round to 6dp and
        // sum as exact DECIMAL so neither ln() ulp nor reduction order
        // can drift the output across engines.
        val B = 4096
        val words = table(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(trim(col("text")), "\\s+")).as("word"))
          .withColumn("b", substring(md5(col("word")), 1, 3))
        val tgt = words.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("tc"))
        val corpus = words.groupBy("b").agg(count(lit(1)).as("ac"))
        val tgtTotal = broadcast(tgt.agg(sum("tc").as("__tt")))
        val corpusTotal = broadcast(corpus.agg(sum("ac").as("__at")))
        val ratio = corpus
          .join(tgt, Seq("b"), "left_outer")
          .crossJoin(tgtTotal).crossJoin(corpusTotal)
          .select(col("b"),
            round(log(
              ((coalesce(col("tc"), lit(0L)) + lit(0.5)) /
                (col("__tt") + lit(0.5 * B))) /
              ((col("ac") + lit(0.5)) / (col("__at") + lit(0.5 * B)))), 6)
              .cast("decimal(18,6)").as("lr"))
        words.join(broadcast(ratio), "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("lr").as("slr"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("slr").cast("double") /
              col("n_tokens").cast("double"), 4).as("dsir_weight"))
          .orderBy("doc_id")
      },
      Some(sp07OracleSql)),

    QueryDef(
      "sp08_budget_alloc",
      (s, d) => {
        // Token-budget apportionment by largest remainder (Hamilton's
        // method): split a 1M-token training budget across `source`
        // slices proportionally to their token mass, integer-exact —
        // floor(B·t_s / T) each, the R = B − Σfloor leftovers going to
        // the largest fractional remainders (ties to the first source
        // name). EVERYTHING is bigint arithmetic (B·t_s div/mod T —
        // no doubles anywhere), so the allocation is bit-identical on
        // any engine: the reproducibility a published data recipe
        // needs. One map-side-combined aggregation over the corpus;
        // the apportionment itself runs on the per-source table (rows
        // = |sources|, metadata-sized). At 100 TB swap the bigint
        // products for DECIMAL(38,0) — B·t_s approaches 2^63 around
        // 10^13 tokens.
        val B = 1000000L
        val bySrc = table(s, d, "documents")
          .select(col("source"),
            size(split(trim(col("text")), "\\s+")).as("toks"))
          .groupBy("source").agg(sum("toks").as("tokens"))
        val tot = broadcast(bySrc.agg(sum("tokens").as("__t")))
        val base = bySrc.crossJoin(tot)
          .withColumn("fl", expr(s"($B * tokens) div __t"))
          .withColumn("rem", expr(s"($B * tokens) % __t"))
        val left = broadcast(base.agg((lit(B) - sum("fl")).as("__r")))
        val w = Window.orderBy(col("rem").desc, col("source"))
        base.crossJoin(left)
          .withColumn("rnk", row_number().over(w))
          .select(col("source"), col("tokens"),
            (col("fl") + when(col("rnk") <= col("__r"), 1L).otherwise(0L))
              .as("alloc"))
          .orderBy("source")
      },
      Some("""WITH bysrc AS (
             |  SELECT source,
             |         CAST(sum(len(string_split_regex(trim(text), '\s+')))
             |              AS BIGINT) AS tokens
             |  FROM documents GROUP BY 1),
             |base AS (
             |  SELECT source, tokens,
             |         (1000000 * tokens) // (SELECT sum(tokens) FROM bysrc)
             |           AS fl,
             |         (1000000 * tokens) % (SELECT sum(tokens) FROM bysrc)
             |           AS rem
             |  FROM bysrc),
             |ranked AS (
             |  SELECT source, tokens, fl,
             |         row_number() OVER (ORDER BY rem DESC, source) AS rnk
             |  FROM base)
             |SELECT source, tokens,
             |       CAST(fl + CASE WHEN rnk <=
             |           1000000 - (SELECT sum(fl) FROM base)
             |         THEN 1 ELSE 0 END AS BIGINT) AS alloc
             |FROM ranked ORDER BY source""".stripMargin)),

    QueryDef(
      "sp09_dsir_select",
      (s, d) => {
        // The DSIR SELECTION step (completes sp07): per language,
        // keep the top 20% of documents by importance weight —
        // rnk·5 ≤ n, pure integer arithmetic, ties broken by doc_id,
        // so the selected set is identical on any engine (selection
        // reproducibility is the whole point of hashed DSIR). The
        // per-language window rides one shuffle over the
        // metadata-sized (doc_id, weight) frame — the heavy lifting
        // happened in sp07's corpus passes; at 100 TB the weight
        // frame is one row per document, not per token.
        val wts = defs.find(_.name == "sp07_dsir_weights").get.fn(s, d)
        val langs = table(s, d, "documents").select("doc_id", "lang")
        val w = Window.partitionBy("lang")
          .orderBy(col("dsir_weight").desc, col("doc_id"))
        val n = Window.partitionBy("lang")
        wts.join(langs, "doc_id")
          .withColumn("rnk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(n))
          .filter(col("rnk") * 5 <= col("n"))
          .select("lang", "doc_id", "dsir_weight")
          .orderBy("lang", "doc_id")
      },
      Some(s"""WITH j AS (
             |  SELECT d.lang, w.doc_id, w.dsir_weight,
             |         row_number() OVER (PARTITION BY d.lang
             |             ORDER BY w.dsir_weight DESC, w.doc_id) AS rnk,
             |         count(*) OVER (PARTITION BY d.lang) AS n
             |  FROM ($sp07OracleSql) w
             |  JOIN documents d ON w.doc_id = d.doc_id)
             |SELECT lang, doc_id, dsir_weight FROM j
             |WHERE rnk * 5 <= n ORDER BY lang, doc_id""".stripMargin)),

    QueryDef(
      "sp10_chunk_stride",
      (s, d) => {
        // Context-window chunking: slice each document's token stream
        // into windows of W=128 tokens with stride S=96 (32-token
        // overlap) — the pre-tokenization step that turns variable-
        // length documents into fixed-shape training examples while
        // the overlap preserves cross-boundary context. Chunk count
        // per doc is closed-form (1 + ceil(max(n-W,0)/S), pure bigint
        // arithmetic), so the plan is one codegen'd projection +
        // explode — per-row decidable, no shuffle at all until the
        // output sort; at 100 TB it streams. A doc shorter than W
        // yields exactly one (possibly short) chunk.
        val W = 128
        val S = 96
        table(s, d, "documents")
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"))
          .withColumn("chunk_id", explode(sequence(lit(0L),
            expr(s"(GREATEST(n_tok - $W, 0) + ${S - 1}) DIV $S"))))
          .select(col("doc_id"), col("chunk_id"),
            (col("chunk_id") * S).as("start_tok"),
            (least(col("chunk_id") * S + W, col("n_tok")) -
              col("chunk_id") * S).as("chunk_len"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |           AS n_tok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, n_tok,
             |         unnest(generate_series(0,
             |           (greatest(n_tok - 128, 0) + 95) // 96)) AS chunk_id
             |  FROM t)
             |SELECT doc_id, chunk_id, chunk_id * 96 AS start_tok,
             |       least(chunk_id * 96 + 128, n_tok) - chunk_id * 96 AS chunk_len
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    QueryDef(
      "sp11_classifier_pairs",
      (s, d) => {
        // Contrastive training-pair mining for a quality classifier
        // (the CCNet/RedPajama fastText prep step): each document
        // passing the Gopher verdict (ta18) pairs with a FAILING
        // document of comparable length, so the classifier learns
        // quality, not length. Length comparability = FIXED log-ish
        // length bands (per-row decidable — a corpus-wide ntile would
        // be a global sort; fixed bands cost nothing at any SF),
        // pairing = rank alignment inside (band, class) with doc_id
        // tiebreaks — fully deterministic, and the unmatched surplus
        // of the larger class drops out via the inner join.
        val g = graft.pipeline.TextAnalysis.defs
          .find(_.name == "ta18_gopher_quality").get.fn(s, d)
          .select("doc_id", "keep")
        val j = g.join(table(s, d, "documents").select("doc_id", "n_chars"),
          "doc_id")
        val b = j.withColumn("bucket",
          when(col("n_chars") < 180, 1L).when(col("n_chars") < 310, 2L)
            .when(col("n_chars") < 420, 3L).otherwise(4L))
        def ranked(keepVal: Boolean) = b.filter(col("keep") === keepVal)
          .withColumn("pair_id", row_number()
            .over(Window.partitionBy("bucket").orderBy("doc_id"))
            .cast("bigint"))
        val pos = ranked(true).select(col("bucket"), col("pair_id"),
          col("doc_id").as("pos_doc"), col("n_chars").as("pos_chars"))
        val neg = ranked(false).select(col("bucket"), col("pair_id"),
          col("doc_id").as("neg_doc"), col("n_chars").as("neg_chars"))
        pos.join(neg, Seq("bucket", "pair_id"))
          .select("bucket", "pair_id", "pos_doc", "neg_doc",
            "pos_chars", "neg_chars")
          .orderBy("bucket", "pair_id")
      },
      Some(s"""WITH g AS (
              |${graft.pipeline.TextAnalysis.defs
                  .find(_.name == "ta18_gopher_quality").get.oracle.get}
              |), j AS (
              |  SELECT g.doc_id, g.keep, d.n_chars
              |  FROM g JOIN documents d ON g.doc_id = d.doc_id
              |), b AS (
              |  SELECT doc_id, keep, n_chars,
              |         CAST(CASE WHEN n_chars < 180 THEN 1
              |                   WHEN n_chars < 310 THEN 2
              |                   WHEN n_chars < 420 THEN 3
              |                   ELSE 4 END AS BIGINT) AS bucket
              |  FROM j
              |), p AS (
              |  SELECT bucket, doc_id AS pos_doc, n_chars AS pos_chars,
              |         CAST(row_number() OVER (PARTITION BY bucket
              |           ORDER BY doc_id) AS BIGINT) AS pair_id
              |  FROM b WHERE keep
              |), n AS (
              |  SELECT bucket, doc_id AS neg_doc, n_chars AS neg_chars,
              |         CAST(row_number() OVER (PARTITION BY bucket
              |           ORDER BY doc_id) AS BIGINT) AS pair_id
              |  FROM b WHERE NOT keep
              |)
              |SELECT p.bucket, p.pair_id, p.pos_doc, n.neg_doc,
              |       p.pos_chars, n.neg_chars
              |FROM p JOIN n ON p.bucket = n.bucket AND p.pair_id = n.pair_id
              |ORDER BY p.bucket, p.pair_id""".stripMargin))
  )
}
