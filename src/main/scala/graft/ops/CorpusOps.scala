package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond per-pair dedup: duplicate-CLUSTER discovery
  * (connected components over near-dup edges), TF-IDF term scoring,
  * stratified class-balanced sampling, and incremental dedup of a new
  * batch against an existing corpus snapshot.
  *
  * Scale design notes are on each operator; the common theme is that
  * nothing here materializes an all-pairs set or collects unbounded
  * data to the driver — edges come from the banded LSH candidates,
  * iteration state lives in checkpointed DataFrames, and snapshots
  * are joined on 8-byte fingerprints rather than document bodies.
  */
object CorpusOps {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------ dup clusters (CC)
  /** Near-duplicate CLUSTERS: connected components over the SimHash
    * near-dup pair edges (q60), via iterative min-label propagation —
    * each round every node adopts the smallest component id among
    * itself and its neighbours, so labels converge to the cluster-wide
    * min doc_id in at most `diameter` rounds (near-dup clusters are
    * shallow; the loop is capped and convergence-checked with a
    * bounded count per round).
    *
    * 100 TB design: this is the standard distributed-CC layout (the
    * "hash-to-min" scheme of Rastogi et al., the simple special case
    * of large-star/small-star) — state is a (doc_id, comp) table
    * re-shuffled on doc_id each round, edges are re-used from cache,
    * and every iteration ends in `localCheckpoint` so the plan/lineage
    * stays O(1) deep instead of growing with the iteration count (on a
    * cluster this is `checkpoint` to reliable storage). No transitive
    * closure is ever materialized — only the component census the
    * curation pipeline actually needs (which canonical doc represents
    * each cluster, and how big the cluster is).
    */
  val q83DupClusters: Q = (s, d) => {
    val pairs = DedupOps.q60SimHashPairs(s, d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // symmetric edge list, materialized once (the LSH candidate
    // generation is the expensive part — never recomputed per round)
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("comp", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("comp")).as("nbr_comp"))
        .withColumnRenamed("dst", "doc_id")
      // carry the previous label through the checkpoint so the
      // convergence count reads materialized data instead of paying a
      // second join+action per round
      val next = labels
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"))
        .localCheckpoint()
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select(col("doc_id"), col("comp"))
      iter += 1
    }
    val sizes = labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }
  /** Oracle: transitive closure by recursive CTE (tractable at oracle
    * scale because near-dup clusters are tiny), component = min
    * reachable id — same fixpoint the propagation loop converges to. */
  val o83: String = s"""
    WITH RECURSIVE pairs AS (${DedupOps.o60}),
    e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT reach.doc_id, e.dst FROM reach JOIN e ON e.src = reach.r),
    comp AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN sizes s USING (cluster_id)"""

  // ------------------------------------------------------------ TF-IDF
  /** TF-IDF-style term relevance: term frequency per (doc, term) ×
    * inverse document frequency, top-3 terms per sampled doc.
    *
    * The damping is `tf / sqrt(df)` rather than `tf·ln(N/df)`:
    * +,*,/,sqrt are IEEE-754 correctly rounded in every engine so the
    * scores (and therefore the ranking) are bit-identical cross-engine,
    * while `ln` is libm-dependent; sqrt-damped idf is the same
    * monotone-in-df family (Lucene's classic similarity damps with
    * sqrt/log the same way). Structure is the real thing: one pass for
    * the corpus df census, one for per-doc tf, joined on term.
    *
    * 100 TB design: df is a map-side-combined census keyed on term
    * (the hot-token skew collapses in the combiner); the tf side is
    * filtered to the requested docs BEFORE the join; the join key is
    * the term string (at petabyte scale: a token id). Top-k per doc is
    * a bounded window over each doc's own terms.
    */
  val q85TfIdf: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dfc = tok.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tf = tok.filter(col("doc_id") % 20 === 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfc, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") / sqrt(col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
  val o85: String = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    dfc AS (
      SELECT term, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE doc_id % 20 = 0 GROUP BY doc_id, term),
    scored AS (
      SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) / sqrt(CAST(df AS DOUBLE)) AS score
      FROM tf JOIN dfc USING (term))
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY score DESC, term ASC) AS rank
      FROM scored)
    WHERE rank <= 3"""

  // ------------------------------------------------ stratified sample
  /** Class-balanced stratified sampling: each language stratum keeps a
    * different deterministic fraction (downsample the over-represented
    * head, keep the tail) — the rebalancing step before training-data
    * mixing. Membership is a Knuth-mix hash of the doc id against the
    * stratum's target percentage, so the sample is reproducible on any
    * engine and any partitioning (`rand(seed)` is neither). Emitted as
    * the per-stratum census: total, sampled, achieved rate.
    *
    * 100 TB design: the sample predicate is a per-row expression —
    * no shuffle at all until the tiny census aggregate; the same
    * predicate applied at the scan is how the sampled corpus itself
    * would be written out. */
  val q86StratifiedSample: Q = (s, d) => {
    val target =
      when(col("lang") === "en", 10)
        .when(col("lang") === "es", 25)
        .when(col("lang") === "fr", 40)
        .when(col("lang") === "de", 60)
        .otherwise(80)
    Tables.documents(s, d)
      .withColumn("target_pct", target)
      .withColumn("keep",
        when(pmod(col("doc_id") * lit(2654435761L), lit(100))
          < col("target_pct"), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_sampled"),
        max(col("target_pct")).as("target_pct"))
      .withColumn("sampled_pct",
        col("n_sampled").cast("double") * 100.0
          / col("n_docs").cast("double"))
  }
  val o86: String = """
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(keep) AS BIGINT) AS n_sampled,
      MAX(target_pct) AS target_pct,
      CAST(SUM(keep) AS DOUBLE) * 100.0 / CAST(COUNT(*) AS DOUBLE)
        AS sampled_pct
    FROM (
      SELECT lang,
        CASE WHEN lang = 'en' THEN 10 WHEN lang = 'es' THEN 25
             WHEN lang = 'fr' THEN 40 WHEN lang = 'de' THEN 60
             ELSE 80 END AS target_pct,
        CASE WHEN (doc_id * 2654435761) % 100 <
          (CASE WHEN lang = 'en' THEN 10 WHEN lang = 'es' THEN 25
                WHEN lang = 'fr' THEN 40 WHEN lang = 'de' THEN 60
                ELSE 80 END) THEN 1 ELSE 0 END AS keep
      FROM documents)
    GROUP BY lang"""

  // ---------------------------------------------- incremental dedup
  /** Incremental dedup of an incoming batch against the existing
    * corpus snapshot: the batch (doc_id % 10 ≥ 7 here) is semi-joined
    * on the 8-byte content fingerprint (q53) against the snapshot's
    * fingerprint set; already-seen docs are dropped, and the per-source
    * intake census reports how much of the batch was novel.
    *
    * 100 TB design: the join ships fingerprints, never text; the
    * snapshot side is a distinct-fp table a real pipeline keeps as a
    * bucketed/sorted index keyed on fp, so the daily intake join is
    * shuffle-free on the snapshot side (and a bloom filter built from
    * the snapshot prunes the batch before the join even starts —
    * Spark's runtime row-group filtering does exactly this for free
    * when the fp index is a parquet table sorted on fp). Fingerprint
    * collisions would need a text verify pass; with a 10^9+7 modulus
    * the oracle-checked census treats fp equality as identity, the
    * same contract q55 uses. */
  val q87IncrementalDedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("fp", TextOps.fingerprintCol)
    val snapshot = docs.filter(col("doc_id") % 10 < 7)
      .select(col("fp")).distinct()
    docs.filter(col("doc_id") % 10 >= 7)
      .join(snapshot.withColumn("seen", lit(1L)), Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(coalesce(col("seen"), lit(0L))).cast("long").as("n_seen"),
        (count(lit(1)) - sum(coalesce(col("seen"), lit(0L))))
          .cast("long").as("n_new"))
  }
  val o87: String = s"""
    WITH fps AS (
      SELECT doc_id, source, ${TextOps.fingerprintSql} AS fp
      FROM documents),
    snapshot AS (
      SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 7),
    incoming AS (
      SELECT f.source,
             CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END AS seen
      FROM fps f LEFT JOIN snapshot s ON f.fp = s.fp
      WHERE f.doc_id % 10 >= 7)
    SELECT source, COUNT(*) AS n_incoming,
      CAST(SUM(seen) AS BIGINT) AS n_seen,
      CAST(COUNT(*) - SUM(seen) AS BIGINT) AS n_new
    FROM incoming GROUP BY source"""

  val queries: Map[String, Q] = Map(
    "q83_dup_clusters" -> q83DupClusters,
    "q85_tfidf_topk" -> q85TfIdf,
    "q86_stratified_sample" -> q86StratifiedSample,
    "q87_incremental_dedup" -> q87IncrementalDedup)

  val oracles: Map[String, String] = Map(
    "q83_dup_clusters" -> o83,
    "q85_tfidf_topk" -> o85,
    "q86_stratified_sample" -> o86,
    "q87_incremental_dedup" -> o87)
}
