package graft.pipeline

import graft.QueryDef
import graft.QueryDef.table
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings`.
  *
  * Scale design (100 TB): exact dedup is a hash group-by (one shuffle
  * on the content hash). Near-dup detection has two paths:
  *  - the *oracle baseline* (dd03/dd05): exact pairwise with a cheap
  *    blocking predicate — quadratic, only for verification at small SF;
  *  - the *scale path* (dd02/dd04/dd06): signature → band → equi-join
  *    on bucket key, so candidate generation is a shuffle on band keys
  *    and the quadratic blow-up is confined to same-bucket collisions.
  */
object Dedup {

  /** Occupancy-bounded LSH bucketing: rows carry a coarse band key
    * (`v1`, few bits → high recall at mid similarity) and a fine key
    * (`v2`, superset bits). Coarse buckets holding more than `cap`
    * rows re-bucket on the fine key, so the in-bucket candidate join
    * is bounded by max(cap², (N/2^fineBits)²) pairs per bucket no
    * matter how the data is distributed — dense sketch regions pay
    * selectivity, sparse ones keep recall. (Vectors IDENTICAL under
    * the full sketch can't be split by more bits; exact dedup on a
    * content hash — dd01 — is the pre-pass that removes those.)
    *
    * Input columns: vec_id, band, v1, v2. Output: vec_id, band, bkey.
    */
  def adaptiveBuckets(bands: DataFrame, cap: Int): DataFrame = {
    val sizes = bands.groupBy("band", "v1").agg(count(lit(1)).as("bucket_n"))
    bands.join(sizes, Seq("band", "v1"))
      // fine keys are offset out of the coarse key range so a refined
      // bucket can never alias a coarse one
      .withColumn("bkey",
        when(col("bucket_n") <= cap, col("v1"))
          .otherwise(col("v2") + lit(0x10000L)))
      .select("vec_id", "band", "bkey")
  }

  /** Distinct word 3-shingles of `text`, hashed to 64-bit — set
    * operations on long arrays are ~10× cheaper than on the shingle
    * strings, and the jaccard value is unchanged barring a 2⁻⁶⁴
    * collision (0-based Spark array lambda).
    */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("w", split(trim(col("text")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", sort_array(array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> xxhash64(concat(w[i-1], ' ', w[i], ' ', w[i+1])))"))))

  private def docShingles(s: SparkSession, d: String): DataFrame =
    withShingles(table(s, d, "documents").select("doc_id", "text", "n_chars"))
      .select("doc_id", "n_chars", "sh")

  /** Connected components by alternating small-star / large-star
    * exchanges (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round reshapes the edge set toward a star
    * forest whose centers are the component minima, converging in
    * O(log n) rounds REGARDLESS of component diameter — the property
    * plain label propagation (O(diameter) rounds) lacks, and what
    * makes the operator safe against adversarial chain-shaped
    * duplicate clusters at 100 TB. Both stars are a groupBy(min) +
    * self-join — pure shuffle work, no driver state.
    *
    * Input: undirected edges as two long columns. Output:
    * (`idCol`, `labelCol`) — every vertex labeled with its component's
    * minimum vertex id (minima label themselves).
    *
    * Convergence is proven by EXACT edge-set equality (count + one-way
    * except), never assumed: if `maxRounds` (default 64 ≫ log₂ of any
    * physical edge count) passes without a fixpoint, this THROWS
    * rather than returning wrong labels.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      idCol: String, labelCol: String, maxRounds: Int = 64): DataFrame = {
    // canonical orientation: (u, v) with u > v, no self-loops, distinct.
    // Each round is (eagerly) localCheckpoint-ed: the star exchanges
    // reference the prior round several times, so carrying raw lineage
    // would grow the logical plan EXPONENTIALLY with rounds — the
    // checkpoint pins the round's result and truncates the plan (a
    // production cluster run would point this at a reliable
    // checkpoint dir; the shape is identical).
    var e = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()

    // large-star: every neighbor LARGER than u links to
    // min(N(u) ∪ {u}); small-star: every neighbor SMALLER than u
    // (all of them, given canonical orientation) links to min(N(u)),
    // and u itself re-links there too. Outputs stay (big, small).
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min("v"), first("u")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(edges: DataFrame): DataFrame = {
      val mins = edges.groupBy("u").agg(min("v").as("m"))
      edges.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var rounds = 0
    var converged = false
    while (!converged) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connected components did not converge in $maxRounds rounds")
      // NOTE (r16, measured): checkpointing every SECOND round — two
      // star passes per action, q68's cadence — was tried and REVERTED:
      // dd07 3.0→6.1 s, dd14 3.4→6.4 s, dd15 3.6→7.9 s at sf0.1. The
      // loop is star-SHUFFLE-dominated, not action-latency-dominated:
      // convergence needs ~3 single rounds, so pairing rounds runs 4
      // star passes' worth of shuffles to save one checkpoint+probe.
      val next = smallStar(largeStar(e)).localCheckpoint()
      // exact set equality in ONE action: both sides are distinct edge
      // sets, so tagging +1/-1 and summing per edge yields a nonzero
      // group iff the edge is in exactly one set; isEmpty early-exits
      // on the first mismatch. (The previous count+except probe was two
      // to three Spark jobs per round — double the latency floor.)
      converged = next.withColumn("_s", lit(1))
        .union(e.withColumn("_s", lit(-1)))
        .groupBy("u", "v").agg(sum("_s").as("_d"))
        .filter(col("_d") =!= 0)
        .isEmpty
      e.unpersist()
      e = next
      rounds += 1
    }
    // star forest: (u, v=component min) for every non-root u; roots
    // (the minima) label themselves. `e` stays cached — the result is
    // computed from it lazily (callers materialize then discard).
    e.select(col("u").as(idCol), col("v").as(labelCol))
      .union(e.select(col("v").as(idCol), col("v").as(labelCol)).distinct())
  }

  /** Exact jaccard over candidate pairs carrying sorted sh_a/sh_b,
    * NULL when < 0.5 — the merge aborts as soon as the threshold is
    * provably unreachable, which on blocking candidates skips most of
    * the per-pair work. Values for surviving pairs are exact.
    */
  private def jaccard =
    round(GraftFunctions.jaccardGeHalf(col("sh_a"), col("sh_b")), 4)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dd01_exact_dedup",
      (s, d) =>
        // Exact dedup on normalized content: single hash-aggregate,
        // map-side partial combine, one shuffle on the 128-bit hash.
        table(s, d, "documents")
          .withColumn("text_hash",
            md5(regexp_replace(lower(col("text")), "\\s+", " ")))
          .groupBy("text_hash")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("text_hash"),
      Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_hash,
             |       min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents
             |GROUP BY 1 ORDER BY text_hash""".stripMargin)),

    QueryDef(
      "dd02_minhash_lsh",
      (s, d) => {
        // MinHash (k=32) over 3-shingles → 8 bands × 4 rows → equi-join
        // on (band, band_sig) buckets → exact-jaccard verification.
        // Only the bucket join shuffles; candidates ≪ n².
        GraftFunctions.register(s)
        val docs = table(s, d, "documents")
          .select(col("doc_id"), GraftFunctions.minhash(col("text")).as("sig"))
        val bands = docs.select(
          col("doc_id"),
          explode(array((0 until 8).map { b =>
            struct(lit(b).as("band"),
              xxhash64(col("sig")(4 * b), col("sig")(4 * b + 1),
                col("sig")(4 * b + 2), col("sig")(4 * b + 3)).as("bsig"))
          }: _*)).as("bs"))
          .select(col("doc_id"), col("bs.band"), col("bs.bsig"))
        val cands = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sh = docShingles(s, d)
        cands
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          .withColumn("jac", jaccard)
          .filter(col("jac") >= 0.5)
          .select("doc_a", "doc_b", "jac")
          .orderBy("doc_a", "doc_b")
      },
      // Exact-jaccard verification makes precision 1.0, so the output
      // equals dd03's truth set exactly when LSH recall is perfect —
      // which DedupRecallSpec proves deterministic (fixed hash seeds)
      // on this data. The oracle IS dd03's: any banding/signature
      // regression that loses a pair now fails the graded compare
      // instead of hiding behind a rows-only check.
      Some("""WITH sh AS (
             |  SELECT doc_id, n_chars,
             |         list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3
             |)
             |SELECT doc_a, doc_b, jac FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         round(len(list_intersect(a.s, b.s))::DOUBLE
             |               / len(list_distinct(a.s || b.s)), 4) AS jac
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |)
             |WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)),

    QueryDef(
      "dd03_ngram_jaccard",
      (s, d) => {
        // Exact pairwise 3-shingle jaccard under a length-blocking
        // predicate (near-dups have near-equal length). The length
        // block `|Δ| ≤ 0.2·max` implies a length ratio ≤ 1.25, so
        // log₁.₂₅ buckets of qualifying pairs differ by at most 1:
        // exploding each doc into buckets {b-1, b, b+1} turns the
        // quadratic theta-join into a shuffle equi-join on bucket.
        // Document lengths CLUSTER, so the hot bucket would hand one
        // reducer its whole occupancy² — the round-11 sf1 soak
        // measured exactly that. The dd05 block discipline subdivides
        // it: the build side hashes into B sub-blocks, the probe side
        // replicates over them, and the cell key (jb, bj) bounds every
        // task at occupancy²/B. The shuffle-hash hint keeps the join a
        // SHUFFLE even while the build side is broadcast-sized —
        // reducer-side parallelism is the point (at 100 TB the
        // broadcast path is unreachable anyway).
        GraftFunctions.register(s)
        val B = 8
        val sh = docShingles(s, d)
          .withColumn("bucket",
            floor(log(col("n_chars").cast("double")) / math.log(1.25)))
        val probe = sh.select(
          col("doc_id").as("doc_a"), col("n_chars").as("nc_a"), col("sh").as("sh_a"),
          explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
            .as("jb"))
          .withColumn("bj", explode(array((0 until B).map(lit): _*)))
        val build = sh.select(
          col("doc_id").as("doc_b"), col("n_chars").as("nc_b"), col("sh").as("sh_b"),
          col("bucket").as("jb"),
          pmod(hash(col("doc_id")), lit(B)).as("bj"))
        probe.join(build.hint("shuffle_hash"), Seq("jb", "bj"))
          .filter(col("doc_a") < col("doc_b") &&
            abs(col("nc_a") - col("nc_b")) <=
              lit(0.2) * greatest(col("nc_a"), col("nc_b")))
          .withColumn("jac", jaccard)
          .filter(col("jac") >= 0.5)
          .select("doc_a", "doc_b", "jac")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, n_chars,
             |         list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3
             |)
             |SELECT doc_a, doc_b, jac FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         round(len(list_intersect(a.s, b.s))::DOUBLE
             |               / len(list_distinct(a.s || b.s)), 4) AS jac
             |  FROM sh a JOIN sh b
             |    ON a.doc_id < b.doc_id
             |   AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
             |)
             |WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)),

    QueryDef(
      "dd04_simhash",
      (s, d) => {
        // SimHash64 → 4 bands × 16 bits; Hamming ≤3 pairs always share
        // at least one exact band (pigeonhole), so the bucket equi-join
        // has perfect recall for the ≤3 radius.
        GraftFunctions.register(s)
        val docs = table(s, d, "documents")
          .select(col("doc_id"), GraftFunctions.simhash64(col("text")).as("sim"))
        val bands = docs.select(
          col("doc_id"), col("sim"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("sim"), 16 * b).bitwiseAND(lit(0xffffL)).as("bval"))
          }: _*)).as("bs"))
          .select(col("doc_id"), col("sim"), col("bs.band"), col("bs.bval"))
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy("doc_a", "doc_b")
      },
      None),

    QueryDef(
      "dd05_embedding_dup",
      (s, d) => {
        // Oracle baseline: exact pairwise cosine ≥ 0.35 as a BLOCK
        // NESTED LOOP — still O(n²) comparisons (that is what "exact
        // pairwise truth" means; dd06 is the sub-quadratic scale path),
        // but shaped to scale as far as a truth side can: vectors hash
        // into B blocks, the B(B+1)/2 block pairs are the EQUI-join
        // key, so the work lands as bounded-input cells across the
        // cluster (each task compares ~(n/B)² pairs locally) instead
        // of one broadcast cartesian whose inner side must fit in
        // every executor. Each unordered pair lands in exactly one
        // cell: cross-block pairs in (min-blk, max-blk), same-block
        // pairs deduped by vec_id order. Replication factor ≈ (B+1)/2
        // per side — the standard block-nested-loop trade.
        GraftFunctions.register(s)
        val e = table(s, d, "embeddings").select("vec_id", "embedding")
        val cos =
          round(GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")), 4)
        // threshold INSIDE the join condition: non-matching pairs are
        // rejected in the cell's inner loop and never materialize as
        // output rows (only ~0.2% of the n² pairs survive)
        blockedPairJoin(e, "vec_id", 8)(cos >= 0.35)
          .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
            greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
            cos.as("cos_sim"))
          .orderBy("vec_a", "vec_b")
      },
      Some("""SELECT vec_a, vec_b, cos_sim FROM (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |         round(list_cosine_similarity(a.embedding::DOUBLE[],
             |                                      b.embedding::DOUBLE[]), 4) AS cos_sim
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |)
             |WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin)),

    QueryDef(
      "dd07_dup_clusters",
      (s, d) => {
        // Duplicate-cluster assignment: connected components over the
        // exact near-dup pairs (dd03), labeling every clustered doc
        // with the smallest doc_id in its component — the step that
        // turns a pair list into "keep one per cluster" decisions.
        // Small-star/large-star exchange (see connectedComponents):
        // O(log n) rounds at ANY cluster diameter, exact-equality
        // convergence proof, throws rather than mislabeling.
        val pairs = defs.find(_.name == "dd03_ngram_jaccard").get.fn(s, d)
          .select(col("doc_a"), col("doc_b")).persist()
        val out = connectedComponents(pairs, "doc_a", "doc_b",
          "doc_id", "cluster_id").orderBy("doc_id")
        pairs.unpersist()
        out
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, n_chars,
             |         list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3
             |), pairs AS (
             |  SELECT doc_a, doc_b FROM (
             |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |           round(len(list_intersect(a.s, b.s))::DOUBLE
             |                 / len(list_distinct(a.s || b.s)), 4) AS jac
             |    FROM sh a JOIN sh b
             |      ON a.doc_id < b.doc_id
             |     AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
             |  ) WHERE jac >= 0.5
             |), edges AS (
             |  SELECT doc_a AS s, doc_b AS t FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs
             |), reach(n, m) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT r.n, e.t FROM reach r JOIN edges e ON r.m = e.s
             |)
             |SELECT n AS doc_id, min(m) AS cluster_id
             |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "dd06_embedding_lsh",
      (s, d) => {
        // Random-hyperplane LSH: 256 Gaussian planes (one native
        // sketch expression, plane matrix built once per executor) →
        // 16 bands × 16 bits. Each band is used at TWO granularities
        // via adaptiveBuckets: a coarse 8-bit key (p^8 collision
        // probability keeps recall usable down to cosine ~0.4, where
        // this dataset's planted dups live) and, for coarse buckets
        // over the occupancy cap, the full 16-bit key — so the
        // in-bucket join is bounded by max(cap², (N/2¹⁶)²) pairs per
        // bucket at any scale, instead of the N²/256 the fixed 8-bit
        // banding degenerated to. Candidates are verified with exact
        // cosine: precision is exact, banding only affects recall
        // (measured in DedupRecallSpec).
        GraftFunctions.register(s)
        val e = table(s, d, "embeddings").select("vec_id", "embedding")
        // candidate generation carries only ids (narrow shuffle rows);
        // embeddings re-join afterwards for exact-cosine verification.
        val sketched = e.select(
          col("vec_id"), GraftFunctions.hyperplaneSketch(col("embedding")).as("sk"))
        val bands = sketched.select(
          col("vec_id"),
          explode(array((0 until 16).map { b =>
            val v16 = shiftrightunsigned(col("sk")(b / 4), 16 * (b % 4))
              .bitwiseAND(lit(0xffffL))
            struct(lit(b).as("band"),
              v16.bitwiseAND(lit(0xffL)).as("v1"), v16.as("v2"))
          }: _*)).as("bs"))
          .select(col("vec_id"), col("bs.band"), col("bs.v1"), col("bs.v2"))
        val bkeyed = adaptiveBuckets(bands, cap = 64)
        val cands = bkeyed.as("a")
          .join(bkeyed.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct()
        cands
          .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
          .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
          .withColumn("cos_sim", round(GraftFunctions.cosineSim(col("ea"), col("eb")), 4))
          .filter(col("cos_sim") >= 0.35)
          .select("vec_a", "vec_b", "cos_sim")
          .orderBy("vec_a", "vec_b")
      },
      None),

    QueryDef(
      "dd08_simhash_recall",
      (s, d) => {
        // Graded recall audit of dd04's banding: 4 bands × 16 bits
        // guarantee (pigeonhole) that every Hamming ≤ 3 pair shares a
        // band, so the banded candidate set must EQUAL the exact
        // pairwise truth — n_missed > 0 means the band split lost
        // recall, n_extra > 0 means the Hamming filter leaked. The
        // truth side is O(n²) comparisons BY DESIGN (that is what
        // exact pairwise truth means; dd04 itself is the scale path),
        // but shaped as dd05's BLOCK NESTED LOOP: doc ids hash into B
        // blocks and the B(B+1)/2 block pairs become the EQUI-join
        // key, so the comparisons land as bounded-input cells across
        // the cluster instead of one broadcast cartesian.
        GraftFunctions.register(s)
        val docs = table(s, d, "documents")
          .select(col("doc_id"), GraftFunctions.simhash64(col("text")).as("sim"))
        val truth = blockedPairJoin(docs, "doc_id", 8)(
            bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= 3)
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        val banded = defs.find(_.name == "dd04_simhash").get.fn(s, d)
          .select("doc_a", "doc_b")
        // one full-outer pair join + one aggregate (no scalar
        // cross-join): a truth pair with no banded partner was missed,
        // a banded pair with no truth partner leaked
        truth.withColumn("in_t", lit(1))
          .join(banded.withColumn("in_b", lit(1)),
            Seq("doc_a", "doc_b"), "full_outer")
          .agg(count(when(col("in_b").isNull, 1)).as("n_missed"),
            count(when(col("in_t").isNull, 1)).as("n_extra"))
      },
      // the invariant is mathematical: the oracle is the constant row
      Some("SELECT CAST(0 AS BIGINT) AS n_missed, CAST(0 AS BIGINT) AS n_extra")),

    QueryDef(
      "dd09_hyperplane_recall",
      (s, d) => {
        // Graded recall verdict for dd06's occupancy-bounded
        // hyperplane LSH against dd05's exact pairwise truth. The
        // plane matrix is deterministic (fixed seed), so recall is a
        // fixed number per dataset — observed ~0.33 at this
        // similarity regime (cosine ~0.4 → per-bit agreement ~0.63
        // over 16-bit bands); the 0.15 floor is the same one
        // DedupRecallSpec enforces, with margin. Precision needs no
        // floor: candidates are exact-cosine verified, so the subset
        // check is part of the verdict.
        val floor = 0.15
        // NOT pinned: the count/semi/anti branches share identical
        // subtrees and Spark's exchange reuse already evaluates the
        // O(n²) blocked pairwise once — an explicit localCheckpoint
        // measured 60% SLOWER (eager materialization + block overhead,
        // and it breaks AQE reuse). Measured isolated min-of-3 at
        // sf0.1: 2.6 s unpinned vs 4.2 s pinned.
        val exact = defs.find(_.name == "dd05_embedding_dup").get.fn(s, d)
          .select(col("vec_a"), col("vec_b"))
        val lsh = defs.find(_.name == "dd06_embedding_lsh").get.fn(s, d)
          .select(col("vec_a"), col("vec_b"))
        val nExact = exact.agg(count(lit(1)).as("n_exact_pairs"))
        // hits and false positives from ONE outer join (semi + anti
        // were two passes computing complements of the same match)
        val hitFalse = lsh.join(exact.withColumn("in_t", lit(1)),
            Seq("vec_a", "vec_b"), "left_outer")
          .agg(count(col("in_t")).as("hits"),
            count(when(col("in_t").isNull, 1)).as("n_false_positives"))
        nExact.crossJoin(hitFalse)
          .select(col("n_exact_pairs"),
            lit(floor).as("recall_floor"),
            // empty truth set (tiny SF) → vacuously met, not NULL
            coalesce(
              col("hits").cast("double") / col("n_exact_pairs") >= floor,
              lit(true)).as("floor_met"),
            col("n_false_positives"))
      },
      Some("""WITH t AS (
             |  SELECT count(*) AS n FROM (
             |    SELECT a.vec_id, b.vec_id FROM embeddings a
             |    JOIN embeddings b ON a.vec_id < b.vec_id
             |    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
             |                b.embedding::DOUBLE[]), 4) >= 0.35))
             |SELECT n AS n_exact_pairs, CAST(0.15 AS DOUBLE) AS recall_floor,
             |       true AS floor_met, CAST(0 AS BIGINT) AS n_false_positives
             |FROM t""".stripMargin)),

    QueryDef(
      "dd10_span_dedup",
      (s, d) => {
        // Cross-document duplicated SPANS (the substring-dedup shape
        // of Lee et al., "Deduplicating Training Data Makes Language
        // Models Better"): an 8-token shingle appearing in more than
        // one document marks a duplicated span; per document the
        // fraction of shingle positions covered by cross-doc
        // duplicates is the removal signal. Shingles key on
        // md5(gram) — fixed-width keys on the wire instead of raw
        // 8-token strings, portable across engines — and the pipeline
        // is two hash aggregations plus one semi-join, all map-side
        // combined; document order never matters, so the shuffle keys
        // are uniformly hash-distributed at any corpus size.
        val w = table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            split(trim(col("text")), "\\s+").as("ws"))
        val g = w.select(col("doc_id"), col("source"),
          explode(TextAnalysis.wordGrams("ws", 8, hashed = true)).as("gh"))
        val dups = g.groupBy("gh")
          .agg(countDistinct("doc_id").as("nd"))
          .filter(col("nd") > 1).select("gh")
        val perDoc = g.groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_sh"))
        val dupPos = g.join(dups, "gh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
        perDoc.join(dupPos, Seq("doc_id"), "left")
          .withColumn("frac",
            coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_sh"))
          .groupBy("source")
          .agg(sum(when(col("frac") > 0, 1L).otherwise(0L))
            .as("n_docs_with_dup_span"),
            round(avg("frac"), 4).as("avg_dup_frac"))
          .orderBy("source")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, source,
             |         string_split_regex(trim(text), '\s+') AS ws
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, source,
             |         md5(array_to_string(ws[u.i:u.i+7], ' ')) AS gh
             |  FROM w, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) u(i)),
             |dups AS (
             |  SELECT gh FROM (
             |    SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh)
             |  WHERE nd > 1),
             |per_doc AS (
             |  SELECT doc_id, source, count(*) AS n_sh
             |  FROM g GROUP BY doc_id, source),
             |dup_pos AS (
             |  SELECT doc_id, count(*) AS n_dup
             |  FROM g JOIN dups USING (gh) GROUP BY doc_id)
             |SELECT source,
             |       CAST(sum(CASE WHEN frac > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_docs_with_dup_span,
             |       round(avg(frac), 4) AS avg_dup_frac
             |FROM (
             |  SELECT p.source,
             |         CAST(coalesce(dp.n_dup, 0) AS DOUBLE) / p.n_sh AS frac
             |  FROM per_doc p LEFT JOIN dup_pos dp USING (doc_id))
             |GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef(
      "dd11_semdedup",
      (s, d) => {
        // SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "SemDeDup:
        // Data-efficient learning at web-scale through semantic
        // deduplication"): cluster the embedding space with k-means,
        // then search for near-duplicate pairs ONLY within a cluster.
        // At 100 TB the pairwise work drops from O(N²) to Σ|cell|²
        // (≈ N^1.5 at nlist ≈ √N) and the corpus shuffles ONCE on its
        // cell id. Every candidate is exact-cosine verified, so
        // precision is exact; clustering only affects recall, graded
        // by dd12. Output: the DROP decisions — for each vector with
        // a same-cell smaller-id duplicate at cosine >= 0.35, the
        // smallest such neighbor is kept as its survivor. Centroids
        // are PINNED deterministically (see semdedupPairs), so the
        // oracle reconstructs the identical clustering in DuckDB and
        // the drop set grades exactly, not just by recall.
        semdedupPairs(s, d)
          .groupBy(col("drop").as("vec_id"))
          .agg(min("keep").as("survivor"))
          .orderBy("vec_id")
      },
      Some("""WITH p AS (
             |  SELECT greatest(4, CAST(round(sqrt(count(*))) AS BIGINT) // 4)
             |           AS nlist
             |  FROM embeddings),
             |seeds AS (
             |  SELECT vec_id AS cid, embedding
             |  FROM embeddings
             |  QUALIFY row_number() OVER (
             |      ORDER BY ((vec_id % 2147483648) * 2654435761)
             |               % 4294967296, vec_id)
             |    <= (SELECT nlist FROM p)),
             |assign AS (
             |  SELECT e.vec_id, s.cid,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY list_cosine_similarity(
             |             e.embedding::DOUBLE[], s.embedding::DOUBLE[]) DESC,
             |             s.cid) AS rk
             |  FROM embeddings e, seeds s),
             |cells AS (SELECT vec_id, cid FROM assign WHERE rk <= 2),
             |pairs AS (
             |  SELECT DISTINCT ca.vec_id AS keep_id, cb.vec_id AS drop_id
             |  FROM cells ca
             |  JOIN cells cb ON ca.cid = cb.cid AND ca.vec_id < cb.vec_id
             |  JOIN embeddings a ON a.vec_id = ca.vec_id
             |  JOIN embeddings b ON b.vec_id = cb.vec_id
             |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
             |              b.embedding::DOUBLE[]), 4) >= 0.35)
             |SELECT drop_id AS vec_id, min(keep_id) AS survivor
             |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "dd12_semdedup_recall",
      (s, d) => {
        // Graded recall verdict for dd11's cluster-scoped search
        // against dd05's exact pairwise truth. Candidates are
        // exact-cosine verified, so false positives must be ZERO (the
        // subset check is part of the verdict); recall is what the
        // clustering costs — the dual-cell spill keeps it high on
        // this near-uniform corpus (the hardest case: real embedding
        // spaces cluster, which is the regime SemDeDup assumes).
        val floor = 0.5
        // NOT pinned (see dd09: exchange reuse beats checkpoints);
        // semi + anti folded into one outer join as in dd09
        val exact = defs.find(_.name == "dd05_embedding_dup").get.fn(s, d)
          .select(col("vec_a"), col("vec_b"))
        val sem = semdedupPairs(s, d)
          .select(col("keep").as("vec_a"), col("drop").as("vec_b"))
        val nExact = exact.agg(count(lit(1)).as("n_exact_pairs"))
        val hitFalse = sem.join(exact.withColumn("in_t", lit(1)),
            Seq("vec_a", "vec_b"), "left_outer")
          .agg(count(col("in_t")).as("hits"),
            count(when(col("in_t").isNull, 1)).as("n_false_positives"))
        nExact.crossJoin(hitFalse)
          .select(col("n_exact_pairs"),
            lit(floor).as("recall_floor"),
            // empty truth set (tiny SF) → vacuously met, not NULL
            coalesce(
              col("hits").cast("double") / col("n_exact_pairs") >= floor,
              lit(true)).as("floor_met"),
            col("n_false_positives"))
      },
      Some("""WITH t AS (
             |  SELECT count(*) AS n FROM (
             |    SELECT a.vec_id, b.vec_id FROM embeddings a
             |    JOIN embeddings b ON a.vec_id < b.vec_id
             |    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
             |                b.embedding::DOUBLE[]), 4) >= 0.35))
             |SELECT n AS n_exact_pairs, CAST(0.5 AS DOUBLE) AS recall_floor,
             |       true AS floor_met, CAST(0 AS BIGINT) AS n_false_positives
             |FROM t""".stripMargin)),

    QueryDef(
      "dd13_incremental_dedup",
      (s, d) => {
        // Incremental ingestion dedup — the shape a 100 TB corpus
        // actually runs: a new DELTA batch (doc_id % 10 ∈ {8,9} here)
        // is admitted against the already-deduped BASE without ever
        // re-scanning base content. Base side reduces to its
        // fingerprint SET (one map-side-combined aggregate — in
        // production this set is the persisted dedup index, not a
        // rescan); the delta first self-dedups (min doc_id per
        // fingerprint — first writer wins within the batch), then
        // anti-joins the base fingerprints. Both joins key on the
        // uniform 128-bit hash, so no skew; the admitted fraction is
        // the batch's novelty rate, the metric an ingest monitor
        // alerts on.
        val fp = md5(regexp_replace(lower(col("text")), "\\s+", " "))
        val docs = table(s, d, "documents")
          .select(col("doc_id"), fp.as("fp"))
        val base = docs.filter(col("doc_id") % 10 < 8)
          .select("fp").distinct()
        val delta = docs.filter(col("doc_id") % 10 >= 8)
        delta.groupBy("fp")
          .agg(min("doc_id").as("doc_id"),
            count(lit(1)).as("n_in_batch"))
          .join(base, Seq("fp"), "left_anti")
          .select("doc_id", "fp", "n_in_batch")
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |         md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
             |  FROM documents),
             |base AS (SELECT DISTINCT fp FROM docs WHERE doc_id % 10 < 8),
             |delta AS (
             |  SELECT fp, min(doc_id) AS doc_id, count(*) AS n_in_batch
             |  FROM docs WHERE doc_id % 10 >= 8 GROUP BY fp)
             |SELECT doc_id, fp, n_in_batch
             |FROM delta WHERE fp NOT IN (SELECT fp FROM base)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "dd14_canonical_pick",
      (s, d) => {
        // Canonical selection per near-duplicate cluster: dd07 labels
        // clusters; this picks WHICH copy survives — the longest
        // document (near-dups differ, and pipelines keep the most
        // complete copy, not the smallest id), ties to the smaller
        // doc_id. One broadcast-sized join of the cluster labels back
        // to doc lengths and a per-cluster window (partitions bounded
        // by cluster size — the star-exchange CC already guarantees
        // no giant unlabeled component sneaks through unconverged).
        val clusters = defs.find(_.name == "dd07_dup_clusters").get.fn(s, d)
        val lens = table(s, d, "documents").select("doc_id", "n_chars")
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))
        clusters.join(lens, "doc_id")
          .withColumn("rnk", row_number().over(w))
          .groupBy("cluster_id")
          .agg(
            min(when(col("rnk") === 1, col("doc_id"))).as("canonical_id"),
            max(when(col("rnk") === 1, col("n_chars"))).as("canonical_chars"),
            count(lit(1)).as("n_members"))
          .orderBy("cluster_id")
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, n_chars,
             |         list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3
             |), pairs AS (
             |  SELECT doc_a, doc_b FROM (
             |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |           round(len(list_intersect(a.s, b.s))::DOUBLE
             |                 / len(list_distinct(a.s || b.s)), 4) AS jac
             |    FROM sh a JOIN sh b
             |      ON a.doc_id < b.doc_id
             |     AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
             |  ) WHERE jac >= 0.5
             |), edges AS (
             |  SELECT doc_a AS s, doc_b AS t FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs
             |), reach(n, m) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT r.n, e.t FROM reach r JOIN edges e ON r.m = e.s
             |), clusters AS (
             |  SELECT n AS doc_id, min(m) AS cluster_id
             |  FROM reach GROUP BY n
             |), ranked AS (
             |  SELECT c.cluster_id, c.doc_id, d.n_chars,
             |         row_number() OVER (PARTITION BY c.cluster_id
             |                            ORDER BY d.n_chars DESC, c.doc_id)
             |           AS rnk
             |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
             |SELECT cluster_id,
             |       min(CASE WHEN rnk = 1 THEN doc_id END) AS canonical_id,
             |       max(CASE WHEN rnk = 1 THEN n_chars END) AS canonical_chars,
             |       count(*) AS n_members
             |FROM ranked GROUP BY cluster_id ORDER BY cluster_id"""
        .stripMargin)),

    QueryDef(
      "dd15_soft_dedup",
      (s, d) => {
        // SOFT dedup: instead of dropping near-duplicates, every
        // document gets a training weight 1/|cluster| (singletons
        // weigh 1.0) — duplicated CONTENT contributes one document's
        // worth of gradient in expectation while no individual copy
        // (with its distinct metadata) is lost. The cluster frame is
        // dd07's connected components (metadata-sized: one row per
        // CLUSTERED doc); the corpus-wide pass is a broadcast-friendly
        // left join against it, so at 100 TB the full scan never
        // shuffles on the cluster side.
        val clusters = defs.find(_.name == "dd07_dup_clusters").get.fn(s, d)
          .select(col("doc_id").as("c_doc"), col("cluster_id"))
        val sizes = clusters.groupBy("cluster_id")
          .agg(count(lit(1)).as("csize"))
        val weighted = clusters.join(sizes, "cluster_id")
        table(s, d, "documents").select("doc_id")
          .join(broadcast(weighted), col("doc_id") === col("c_doc"),
            "left_outer")
          .select(col("doc_id"),
            coalesce(col("csize"), lit(1L)).as("cluster_size"),
            round(lit(1.0) / coalesce(col("csize"), lit(1L)), 6).as("weight"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, n_chars,
             |         list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)
             |  WHERE len(w) >= 3
             |), pairs AS (
             |  SELECT doc_a, doc_b FROM (
             |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |           round(len(list_intersect(a.s, b.s))::DOUBLE
             |                 / len(list_distinct(a.s || b.s)), 4) AS jac
             |    FROM sh a JOIN sh b
             |      ON a.doc_id < b.doc_id
             |     AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
             |  ) WHERE jac >= 0.5
             |), edges AS (
             |  SELECT doc_a AS s, doc_b AS t FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs
             |), reach(n, m) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT r.n, e.t FROM reach r JOIN edges e ON r.m = e.s
             |), clusters AS (
             |  SELECT n AS doc_id, min(m) AS cluster_id
             |  FROM reach GROUP BY n
             |), sizes AS (
             |  SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY 1
             |)
             |SELECT d.doc_id,
             |       coalesce(z.csize, 1) AS cluster_size,
             |       round(CAST(1.0 AS DOUBLE) / coalesce(z.csize, 1), 6) AS weight
             |FROM documents d
             |LEFT JOIN clusters c ON d.doc_id = c.doc_id
             |LEFT JOIN sizes z ON c.cluster_id = z.cluster_id
             |ORDER BY d.doc_id""".stripMargin)),

    QueryDef(
      "dd16_containment",
      (s, d) => {
        // ASYMMETRIC containment dedup: C(A,B) = |grams A ∩ grams B|
        // / min(|A|, |B|) — catches a short document quoted inside a
        // long one, which Jaccard (dd03) structurally misses because
        // the union in its denominator grows with the LONGER doc.
        // Scale shape is inverted-index + verify: (1) distinct hashed
        // 5-gram postings per doc; (2) STOP-GRAM removal — grams in
        // > 20 docs carry no pair signal and are what makes a naive
        // postings self-join quadratic on boilerplate — then the rare
        // postings self-join on the gram yields candidate pairs;
        // (3) exact shared-gram recount over the FULL gram sets for
        // candidates only, so the df cutoff bounds work without
        // changing reported scores. All stages are hash equi-joins /
        // aggregations on uniformly-distributed md5 keys.
        val w = table(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
        // the postings frame feeds FOUR consumers (sizes, df filter,
        // candidate join ×2-sided, exact recount ×2-sided); pin it
        // once instead of re-exploding the corpus per consumer — the
        // cluster equivalent is materializing the inverted index
        val g = w.select(col("doc_id"),
            explode(TextAnalysis.wordGrams("ws", 5, hashed = true)).as("gh"))
          .distinct().localCheckpoint()
        val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val rare = g.groupBy("gh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("gh")
        val gr = g.join(rare, "gh")
        val cand = gr.as("a").join(gr.as("b"),
            col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val shared = cand
          .join(g.as("ga"), col("ga.doc_id") === col("doc_a"))
          .join(g.as("gb"),
            col("gb.doc_id") === col("doc_b") && col("ga.gh") === col("gb.gh"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
        shared
          .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("na")),
            "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")),
            "doc_b")
          .withColumn("n_small", least(col("na"), col("nb")))
          .withColumn("containment",
            round(col("n_shared").cast("double") / col("n_small"), 4))
          .filter(col("n_shared").cast("double") / col("n_small") >= 0.6)
          .select("doc_a", "doc_b", "n_shared", "n_small", "containment")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
             |  FROM documents),
             |g AS (
             |  SELECT DISTINCT doc_id,
             |         md5(array_to_string(ws[u.i:u.i+4], ' ')) AS gh
             |  FROM w, unnest(range(1, greatest(len(ws) - 4, 0) + 1)) u(i)),
             |sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
             |rare AS (
             |  SELECT gh FROM (SELECT gh, count(*) AS df FROM g GROUP BY gh)
             |  WHERE df <= 20),
             |gr AS (SELECT doc_id, gh FROM g JOIN rare USING (gh)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM gr a JOIN gr b ON a.gh = b.gh AND a.doc_id < b.doc_id),
             |shared AS (
             |  SELECT c.doc_a, c.doc_b, count(*) AS n_shared
             |  FROM cand c
             |  JOIN g ga ON ga.doc_id = c.doc_a
             |  JOIN g gb ON gb.doc_id = c.doc_b AND gb.gh = ga.gh
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, n_shared,
             |       least(sa.n_grams, sb.n_grams) AS n_small,
             |       round(CAST(n_shared AS DOUBLE)
             |             / least(sa.n_grams, sb.n_grams), 4) AS containment
             |FROM shared
             |JOIN sizes sa ON sa.doc_id = doc_a
             |JOIN sizes sb ON sb.doc_id = doc_b
             |WHERE CAST(n_shared AS DOUBLE) / least(sa.n_grams, sb.n_grams) >= 0.6
             |ORDER BY doc_a, doc_b""".stripMargin))
  )

  /** Block-nested-loop pairing scaffold shared by dd05, dd08's truth
    * side, and semdedup: rows hash on `idCol` into `blocks` blocks and
    * the B(B+1)/2 unordered block pairs become the COMPOSITE equi-join
    * key (bi, bj) — bounded-input cells across the cluster instead of
    * one broadcast cartesian. The built-in condition places each
    * unordered row pair in EXACTLY one cell (cross-block pairs in
    * (min-blk, max-blk); same-block pairs deduped by id order);
    * `pairCond` adds the caller's pairwise predicate, evaluated inside
    * the cell's inner loop so rejected pairs never materialize. Sides
    * are aliased "a"/"b" for the caller's select.
    */
  private def blockedPairJoin(df: DataFrame, idCol: String, blocks: Int)(
      pairCond: org.apache.spark.sql.Column): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val withBlk = df.withColumn("blk", pmod(hash(col(idCol)), lit(blocks)))
    val pairs =
      (0 until blocks).flatMap(i => (i until blocks).map(j => (i, j)))
    // NOT repartitioned by cell: an explicit
    // `.repartition(col("bi"), col("bj"))` after the broadcast fan-out
    // (to spread the cells' inner loops across tasks) showed NO
    // reproducible win at sf0.1/32 cpus — dd05 same-batch A/B pairs
    // landed inside the ±40% cross-session noise band in both
    // directions while the shuffle moves every replicated embedding
    // payload. The scan side already splits by parquet row group,
    // which is the scale story too; the cell key exists so a cluster
    // CAN redistribute explicitly if its scan arrives unsplit.
    val a = withBlk.as("a").join(broadcast(pairs.toDF("bi", "bj")),
      col("a.blk") === col("bi"))
    val b = withBlk.as("b").join(broadcast(pairs.toDF("bi2", "bj2")),
      col("b.blk") === col("bj2"))
    a.join(b,
      col("bi") === col("bi2") && col("bj") === col("bj2") &&
        (col("bi") < col("bj") || col(s"a.$idCol") < col(s"b.$idCol")) &&
        pairCond)
  }

  /** dd11/dd12's shared candidate machinery: k-means cells (shared IVF
    * trainer — hash-spread seeds, 3 Lloyd rounds, map-side
    * assignment), each vector indexed under its TWO nearest cells
    * (the ss02 boundary spill: a pair split by one cell boundary is
    * still co-indexed), pairwise within a cell blocked dd05-style so
    * one hot cell still lands as bounded-input tasks, every pair
    * exact-cosine verified. Returns distinct (keep = smaller vec_id,
    * drop = larger, cos_sim) rows.
    */
  private def semdedupPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val e = table(s, d, "embeddings").select("vec_id", "embedding")
    // coarser than ss02's √N: dedup recall depends on co-clustering
    // the mid-similarity pairs, so cells hold ~4√N vectors — the
    // Σ|cell|² trade stays ~N^1.5, with a 4× constant bought for
    // recall (tunable; real clustered corpora can afford √N)
    val nlist = s.conf.getOption("spark.graft.semdedup.nlist").map(_.toInt)
      .getOrElse {
        val n = e.count()
        math.max(4, math.round(math.sqrt(n.toDouble)).toInt / 4)
      }
    val nlistMax = s.conf.getOption("spark.graft.ann.nlist-max")
      .map(_.toInt).getOrElse(1 << 17)
    require(nlist <= nlistMax,
      s"spark.graft.semdedup.nlist = $nlist exceeds the driver-held " +
        s"centroid ceiling $nlistMax")
    // PINNED deterministic centroids: the nlist corpus vectors
    // smallest under a fixed multiplicative spread of vec_id (Knuth's
    // 2654435761) are the cell centers VERBATIM — no Lloyd float
    // averaging, so the clustering is integer-reproducible and dd11's
    // drop decisions grade EXACTLY against a DuckDB reconstruction
    // (assignment ties break by centroid id in both engines; the
    // cosine loops are sequential double accumulation on both sides).
    // The spread multiplies in 2^31 modular space: (2^31-1) * K fits
    // signed 64-bit on BOTH engines (a raw vec_id * K overflows Long
    // past vec_id ≈ 3.5e9 — Spark would wrap where DuckDB errors,
    // breaking the exact grade at exactly the 100 TB id range this
    // targets). Ids differing by 2^31 share a spread key and fall to
    // the deterministic vec_id tiebreak; for vec_id < 2^31 the key is
    // bit-identical to the unreduced form. Lloyd-trained quality stays
    // graded where the trainer lives (ss03/ss07 recall gates); dd12
    // still gates THIS clustering.
    val seeds = e
      .orderBy(((col("vec_id") % lit(2147483648L)) * lit(2654435761L))
          % lit(4294967296L),
        col("vec_id"))
      .limit(nlist) // centroid-sized by construction (≤ nlist-max)
      .collect()
    val indexed = e.withColumn("cell",
      explode(GraftFunctions.nearestCentroids(col("embedding"),
        seeds.toSeq.map(r => r.getSeq[Float](1).map(_.toDouble)),
        seeds.toSeq.map(_.getLong(0)), 2)))
    val cos =
      round(GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")), 4)
    blockedPairJoin(indexed, "vec_id", 4)(
        col("a.cell") === col("b.cell") && cos >= 0.35)
      .select(least(col("a.vec_id"), col("b.vec_id")).as("keep"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("drop"),
        cos.as("cos_sim"))
      .distinct() // the dual-cell spill can co-index a pair twice
  }
}
