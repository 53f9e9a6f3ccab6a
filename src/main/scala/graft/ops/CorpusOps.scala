package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** Min-label propagation over an undirected `(src, dst)` edge list →
    * `(doc_id, comp)` labels, comp = min reachable id. Shared by q83
    * (single-signal edges) and q98 (union-of-evidence edges). The
    * symmetric edge list is materialized once (candidate generation is
    * the expensive part — never recomputed per round); every round
    * ends in `localCheckpoint` so lineage stays O(1) deep (on a
    * cluster: `checkpoint` to reliable storage). */
  /** Edge-count threshold below which components are solved by local
    * union-find instead of the distributed propagation loop. Near-dup
    * edge sets are a minuscule fraction of the corpus (verified pairs,
    * not rows): at this cap the collected edge list is ≤ ~80 MB on a
    * driver that holds gigabytes, and the local solve replaces 3–4
    * full shuffle+checkpoint rounds with one pass. This is how
    * production corpus dedup composes the two tiers — distributed
    * candidate generation + verification, local union-find over the
    * surviving edges — while the propagation loop below remains the
    * exact same-answer path for edge sets that outgrow the driver. */
  private val LocalCcMaxEdges = 5000000L

  /** Union-find with path halving; roots are the component MIN because
    * union always attaches the larger root under the smaller — the
    * same fixpoint the distributed loop converges to. */
  private def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    // snapshot the keys before the final resolve: find() path-halves
    // (writes into the map), and iterating a mutable map while
    // mutating it is only safe under undocumented LongMap internals
    // (writes to existing keys never repack) — an invariant a future
    // edit could silently break
    parent.keys.toArray.map(k => k -> find(k)).toMap
  }

  private[ops] def connectedComponents(pairs: DataFrame): DataFrame = {
    val materialized = pairs.localCheckpoint(eager = false)
    if (materialized.count() <= LocalCcMaxEdges) {
      val comp = localUnionFind(materialized
        .select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val s = pairs.sparkSession
      import s.implicits._
      return comp.toSeq.toDF("doc_id", "comp")
    }
    val edges = materialized
      .union(materialized.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = false)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("comp", col("doc_id"))
      .localCheckpoint(eager = false)
    // no iteration cap: every round strictly decreases at least one
    // label or sets changed = 0, and labels are bounded below by the
    // component min, so termination is guaranteed in ≤ diameter
    // rounds — a cap would silently emit split clusters on long
    // near-dup chains instead
    var changed = 1L
    while (changed > 0) {
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
        .localCheckpoint(eager = false)
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select(col("doc_id"), col("comp"))
    }
    labels
  }

  val q83DupClusters: Q = (s, d) => {
    // cluster-grain edges (star + one rep edge per verified signature
    // pair): identical components to the all-pairs census in LINEAR
    // edge volume — the oracle keeps computing components from the
    // all-pairs SQL, independently witnessing the equivalence
    // (see DedupOps.simhashClusterEdges).
    val labels = connectedComponents(DedupOps.q60ClusterEdges(s, d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
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
    WITH RECURSIVE pairs AS MATERIALIZED (${DedupOps.o60}),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT reach.doc_id, e.dst FROM reach JOIN e ON e.src = reach.r),
    comp AS MATERIALIZED (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    sizes AS MATERIALIZED (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN sizes s USING (cluster_id)"""

  // --------------------------------- padding-waste batching audit
  private val PadBatch = 32L

  /** Padding-waste audit of two batching strategies: documents packed
    * into fixed-size training batches of [[PadBatch]], each batch
    * padded to its longest member (the attention-mask cost every
    * non-packing trainer pays) — compared between ARRIVAL order
    * (batch = doc_id div B; intake ids are monotone) and
    * LENGTH-SORTED order (the dynamic-batching / bucketing trick:
    * rank by (n_tokens, doc_id), batch = (rank−1) div B). Reports per
    * strategy: batches, real tokens, padding tokens, padding share —
    * the "is length bucketing worth the shuffle" number (q233/q234
    * audit the PACKING alternative that eliminates padding entirely;
    * this prices the strategy most fine-tune stacks actually run).
    *
    * 100 TB design: the sorted rank NEVER runs an unpartitioned
    * window over the corpus — it rides q153's valueBucket two-level
    * layout (bounded token-length histogram cumsum for offsets,
    * per-bucket refinement windows); the per-batch census is one
    * map-side combined aggregate; the report is 2 rows. The oracle is
    * the naive global row_number spelling, pinning the two-level
    * refinement row-identical. */
  val q261PaddingWaste: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("ntok"))
      .localCheckpoint(eager = false) // feeds both strategies + the bucket census
    def report(batched: DataFrame, strategy: String): DataFrame =
      batched.groupBy(col("batch_id"))
        .agg(count(lit(1)).as("bn"),
          max(col("ntok")).as("mx"),
          sum(col("ntok")).cast("long").as("st"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("st")).cast("long").as("total_tokens"),
          sum(col("bn") * col("mx") - col("st")).cast("long")
            .as("total_padding"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("total_tokens"), col("total_padding"),
          (col("total_padding").cast("double")
            / (col("total_tokens") + col("total_padding"))
              .cast("double")).as("padding_share"))
    val arrival = report(
      docs.withColumn("batch_id", expr(s"doc_id div $PadBatch")),
      "arrival")
    val sorted = report(
      Relational.twoLevelRank(docs, "ntok", "doc_id", asc = true)
        .withColumn("batch_id", expr(s"(rank - 1) div $PadBatch")),
      "length_sorted")
    arrival.unionByName(sorted)
  }
  val o261: String = s"""
    WITH pd AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      FROM documents),
    arrival AS (
      SELECT doc_id // $PadBatch AS batch_id, ntok FROM pd),
    sorted AS (
      SELECT (row_number() OVER (ORDER BY ntok ASC, doc_id ASC) - 1)
        // $PadBatch AS batch_id, ntok
      FROM pd),
    ra AS (
      SELECT batch_id, COUNT(*) AS bn, MAX(ntok) AS mx,
        CAST(SUM(ntok) AS BIGINT) AS st
      FROM arrival GROUP BY batch_id),
    rs AS (
      SELECT batch_id, COUNT(*) AS bn, MAX(ntok) AS mx,
        CAST(SUM(ntok) AS BIGINT) AS st
      FROM sorted GROUP BY batch_id),
    rep AS (
      SELECT 'arrival' AS strategy, COUNT(*) AS n_batches,
        CAST(SUM(st) AS BIGINT) AS total_tokens,
        CAST(SUM(bn * mx - st) AS BIGINT) AS total_padding
      FROM ra
      UNION ALL
      SELECT 'length_sorted', COUNT(*),
        CAST(SUM(st) AS BIGINT), CAST(SUM(bn * mx - st) AS BIGINT)
      FROM rs)
    SELECT strategy, n_batches, total_tokens, total_padding,
      CAST(total_padding AS DOUBLE)
        / CAST(total_tokens + total_padding AS DOUBLE)
        AS padding_share
    FROM rep"""

  // --------------------------------- cluster density / chaining audit
  /** Density audit of the q83 near-dup clusters — the LSH-CHAINING
    * detector: transitive closure merges A–B and B–C into one cluster
    * even when A and C share nothing, so a cluster's VERIFIED-edge
    * density (n_edges / C(n,2)) is the one number separating a true
    * replay group (a clique, density 1) from a chained artifact that
    * would over-delete under q121's survivor election. Per cluster:
    * members, verified q60 edges, density, and `is_complete`
    * (edges = C(n,2) exactly).
    *
    * 100 TB design: rides q83's label frame (iterative CC with
    * per-round checkpoints) and q60's capped banded edges; the edge
    * census joins labels on ONE side only (both endpoints of an edge
    * share a component by construction — the second join would be a
    * no-op); everything after is (cluster, count) arithmetic. C(n,2)
    * stays in int64 because cluster sizes are bounded by the banded
    * pair generation caps upstream. */
  val q259ClusterDensity: Q = (s, d) => {
    val edges = DedupOps.q60SimHashPairs(s, d)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = false) // feeds CC AND the per-cluster edge census
    val labels = connectedComponents(
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val sizes = labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val edgeCensus = edges
      .join(labels.select(col("doc_id").as("doc_a"),
        col("comp").as("cluster_id")), Seq("doc_a"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_edges"))
    sizes.join(edgeCensus, Seq("cluster_id"))
      .withColumn("density", col("n_edges").cast("double") * 2.0
        / (col("n_members").cast("double")
          * (col("n_members").cast("double") - 1.0)))
      .withColumn("is_complete",
        when(col("n_edges") * 2 === col("n_members")
          * (col("n_members") - 1), 1L).otherwise(0L))
      .select(col("cluster_id"), col("n_members"), col("n_edges"),
        col("density"), col("is_complete"))
  }
  val o259: String = s"""
    WITH RECURSIVE pairs AS MATERIALIZED (${DedupOps.o60}),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT reach.doc_id, e.dst FROM reach JOIN e ON e.src = reach.r),
    comp AS MATERIALIZED (SELECT doc_id, MIN(r) AS cluster_id FROM reach
             GROUP BY doc_id),
    sizes AS MATERIALIZED (SELECT cluster_id, COUNT(*) AS n_members
              FROM comp GROUP BY cluster_id),
    ec AS MATERIALIZED (
      SELECT c.cluster_id, COUNT(*) AS n_edges
      FROM pairs p JOIN comp c ON c.doc_id = p.doc_a
      GROUP BY c.cluster_id)
    SELECT s.cluster_id, s.n_members, ec.n_edges,
      CAST(ec.n_edges AS DOUBLE) * 2.0
        / (CAST(s.n_members AS DOUBLE)
          * (CAST(s.n_members AS DOUBLE) - 1.0)) AS density,
      CAST(CASE WHEN ec.n_edges * 2 = s.n_members * (s.n_members - 1)
        THEN 1 ELSE 0 END AS BIGINT) AS is_complete
    FROM sizes s JOIN ec USING (cluster_id)"""

  // --------------------------------------------- KS distribution drift
  /** Exact two-sample Kolmogorov–Smirnov drift: for every source, the
    * KS statistic D = max_v |CDF_source(v) − CDF_global(v)| of its
    * document-length distribution against the whole corpus, plus the
    * length at which the maximum divergence occurs — the
    * distribution-shift alarm a mixture pipeline reads when one
    * source's content changes shape (CUSUM q158 watches a MEAN drift;
    * KS sees any distributional change).
    *
    * Exact-parity spelling: CDFs are integer cumulative counts on the
    * shared value grid, compared cross-multiplied
    * (|cum_s·n_g − cum_g·n_s|, routed through decimal(38,0)/HUGEINT
    * by [[crossDevAbs]] so the products stay exact at ANY corpus
    * size — int64 would overflow past ~3e9 rows), so the only
    * floating point is the final division of the winning numerator.
    *
    * 100 TB design: the corpus collapses to a (source, length) census
    * first (map-side combine); everything after runs on the value
    * GRID (distinct lengths — a bounded domain; an unbounded
    * continuous statistic would be quantized first), including the
    * sources × grid cross join, both cumulative windows, and the
    * argmax join-back. Corpus rows are touched once. */
  /** The shared CDF grid behind the distribution-drift statistics
    * (q179 KS, q184 Wasserstein): per (source, grid length v), the
    * source and global cumulative counts plus both totals. The
    * corpus collapses to the (source, length) census once; every
    * row here is grid-scale (sources × distinct lengths). */
  private def lengthCdfGrid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .groupBy($"source", $"n_chars".as("v"))
      .agg(count(lit(1)).as("c"))
    val grid = counts.groupBy($"v").agg(sum($"c").cast("long").as("cg"))
    val wg = Window.orderBy($"v".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = grid
      .withColumn("cum_g", sum($"cg").over(wg).cast("long"))
    val totals = counts.groupBy($"source")
      .agg(sum($"c").cast("long").as("n_s"))
    val ngRow = grid.agg(sum($"cg").cast("long").as("n_g"))
    val ws = Window.partitionBy($"source").orderBy($"v".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gcum.crossJoin(broadcast(totals))
      .join(counts, Seq("source", "v"), "left")
      .withColumn("c0", coalesce($"c", lit(0L)))
      .withColumn("cum_s", sum($"c0").over(ws).cast("long"))
      .crossJoin(broadcast(ngRow))
      .select($"source", $"v", $"cum_s", $"cum_g", $"n_s", $"n_g")
  }

  /** DuckDB twin of [[lengthCdfGrid]] — CTE bodies ending in `f`
    * with (source, v, cum_s, cum_g, n_s, n_g); callers prepend
    * `WITH` and build on `f`. */
  private val lengthCdfGridSql: String = """
    counts AS (
      SELECT source, n_chars AS v, COUNT(*) AS c
      FROM documents GROUP BY 1, 2),
    grid AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cg
             FROM counts GROUP BY v),
    gcum AS (
      SELECT v, cg, CAST(SUM(cg) OVER (ORDER BY v ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_g
      FROM grid),
    totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
               FROM counts GROUP BY source),
    ng AS (SELECT CAST(SUM(cg) AS BIGINT) AS n_g FROM grid),
    f AS (
      SELECT t.source, g.v, g.cum_g, t.n_s, (SELECT n_g FROM ng) AS n_g,
        CAST(SUM(COALESCE(c.c, 0)) OVER (PARTITION BY t.source
          ORDER BY g.v ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_s
      FROM gcum g
      CROSS JOIN totals t
      LEFT JOIN counts c ON c.source = t.source AND c.v = g.v)"""

  /** |a·b − c·d| over int64 inputs routed through decimal(38,0) so
    * the cross-products stay exact past the 3e9-row point where
    * a·b overflows int64 — the shared deviation kernel of the q179
    * KS and q184 Wasserstein numerators (factored out so the
    * planted-large-count overflow test can drive it directly). */
  private[graft] def crossDevAbs(a: Column, b: Column,
                                 c: Column, d: Column): Column =
    abs(a.cast("decimal(38,0)") * b - c.cast("decimal(38,0)") * d)

  val q179KsDrift: Q = (s, d) => {
    import s.implicits._
    val scored = lengthCdfGrid(s, d)
      .withColumn("num",
        crossDevAbs($"cum_s", $"n_g", $"cum_g", $"n_s"))
    val m = scored.groupBy($"source")
      .agg(max($"num").as("maxnum"), max($"n_s").as("n_docs"),
        max($"n_g").as("n_g"))
    m.join(scored.select($"source", $"num", $"v"),
        m("source") === scored("source") && $"num" === m("maxnum"))
      .groupBy(m("source").as("source"), $"n_docs", $"maxnum", $"n_g")
      .agg(min($"v").as("ks_at"))
      .select($"source", $"n_docs", $"ks_at",
        ($"maxnum".cast("double")
          / ($"n_docs".cast("double") * $"n_g".cast("double")))
          .as("d_stat"))
  }
  val o179: String = s"""
    WITH $lengthCdfGridSql,
    scored AS (
      SELECT source, v, n_s,
        abs(CAST(cum_s AS HUGEINT) * n_g
            - CAST(cum_g AS HUGEINT) * n_s) AS num
      FROM f),
    m AS (SELECT source, MAX(num) AS maxnum, MAX(n_s) AS n_docs
          FROM scored GROUP BY source)
    SELECT m.source, m.n_docs, MIN(s.v) AS ks_at,
      CAST(m.maxnum AS DOUBLE)
        / (CAST(m.n_docs AS DOUBLE)
           * CAST((SELECT n_g FROM ng) AS DOUBLE)) AS d_stat
    FROM m JOIN scored s
      ON s.source = m.source AND s.num = m.maxnum
    GROUP BY m.source, m.n_docs, m.maxnum"""

  // ----------------------------------------- Wasserstein drift
  /** 1-D Wasserstein (earth mover's) drift: per source, the
    * transport cost ∫|F_source − F_corpus| dv between its length
    * distribution and the pooled corpus — the metric that SIZES a
    * drift (how many character-units of mass must move) where q179's
    * KS only reports the worst single point and so cannot tell a
    * narrow spike from a wholesale shift.
    *
    * Same shared CDF grid; the cross-multiplied deviation routes
    * through decimal(38,0)/HUGEINT ([[crossDevAbs]]) so it stays
    * exact at any corpus size; each grid segment's term maps to 1e-9
    * fixed point
    * BEFORE the cross-segment sum (identical operation order both
    * engines), so the statistic never depends on summation order. */
  val q184WassersteinDrift: Q = (s, d) => {
    import s.implicits._
    val wl = Window.partitionBy($"source").orderBy($"v".asc)
    lengthCdfGrid(s, d)
      .withColumn("dv",
        coalesce(lead($"v", 1).over(wl) - $"v", lit(0L)))
      .withColumn("term_fp", floor(
        crossDevAbs($"cum_s", $"n_g", $"cum_g", $"n_s").cast("double")
          / ($"n_s".cast("double") * $"n_g".cast("double"))
          * $"dv".cast("double") * lit(1.0e9)))
      .groupBy($"source")
      .agg(max($"n_s").cast("long").as("n_docs"),
        sum($"term_fp").as("emd_fp"))
      .select($"source", $"n_docs",
        ($"emd_fp".cast("double") / lit(1.0e9)).as("emd"))
  }
  val o184: String = s"""
    WITH $lengthCdfGridSql,
    seg AS (
      SELECT source, n_s, cum_s, cum_g, n_g,
        COALESCE(lead(v) OVER (PARTITION BY source ORDER BY v ASC) - v,
          0) AS dv
      FROM f),
    terms AS (
      SELECT source, n_s,
        CAST(FLOOR(
          CAST(abs(CAST(cum_s AS HUGEINT) * n_g
                   - CAST(cum_g AS HUGEINT) * n_s) AS DOUBLE)
            / (CAST(n_s AS DOUBLE) * CAST(n_g AS DOUBLE))
            * CAST(dv AS DOUBLE) * 1e9) AS BIGINT) AS term_fp
      FROM seg)
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
      CAST(SUM(term_fp) AS DOUBLE) / 1e9 AS emd
    FROM terms GROUP BY source"""

  // ----------------------------------------- chi-squared drift
  /** Chi-squared categorical drift: per source, the χ² statistic of
    * its LANGUAGE distribution against the pooled corpus expectation
    * e = n_s·n_l/N — the categorical twin of q179's KS (KS sees a
    * shifted ordinal distribution; χ² sees a reshuffled categorical
    * one, e.g. a crawler suddenly returning the wrong-language pages).
    * Missing (source, lang) cells still contribute n_s·n_l/N, so the
    * grid completes via a census-scale cross join.
    *
    * Parity: each cell's deviation d = o·N − n_s·n_l routes through
    * decimal(38,0)/HUGEINT (the [[crossDevAbs]] convention — exact at
    * any corpus size, not just below the old int64 3e9-row bound);
    * the cell term (d²/(N·n_s·n_l)) is computed in doubles from
    * identical integers and FLOORED to 1e-9 fixed point before the
    * cross-cell sum, so the statistic never depends on Spark's vs
    * DuckDB's summation order.
    *
    * 100 TB design: corpus collapses to the (source, lang) census
    * first; everything downstream is |sources|×|langs| cells. */
  val q183Chi2Drift: Q = (s, d) => {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("o"))
    val langTot = counts.groupBy($"lang")
      .agg(sum($"o").cast("long").as("n_l"))
    val srcTot = counts.groupBy($"source")
      .agg(sum($"o").cast("long").as("n_s"))
    val nRow = langTot.agg(sum($"n_l").cast("long").as("n"))
    srcTot.crossJoin(broadcast(langTot))
      .join(counts, Seq("source", "lang"), "left")
      .withColumn("o0", coalesce($"o", lit(0L)))
      .crossJoin(broadcast(nRow))
      .withColumn("dev",
        $"o0".cast("decimal(38,0)") * $"n"
          - $"n_s".cast("decimal(38,0)") * $"n_l")
      .withColumn("term_fp", floor(
        ($"dev".cast("double") * $"dev".cast("double"))
          / ($"n".cast("double") * $"n_s".cast("double")
            * $"n_l".cast("double")) * lit(1.0e9)))
      .groupBy($"source")
      .agg(max($"n_s").as("n_docs"),
        count(lit(1)).cast("long").as("n_cells"),
        sum($"term_fp").as("chi2_fp"))
      .select($"source", $"n_docs", $"n_cells",
        ($"chi2_fp".cast("double") / lit(1.0e9)).as("chi2"))
  }
  val o183: String = """
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS o
      FROM documents GROUP BY 1, 2),
    lang_tot AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS n_l
                 FROM counts GROUP BY lang),
    src_tot AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_s
                FROM counts GROUP BY source),
    nt AS (SELECT CAST(SUM(n_l) AS BIGINT) AS n FROM lang_tot),
    cells AS (
      SELECT s.source, s.n_s, l.lang, l.n_l,
        COALESCE(c.o, 0) AS o0, (SELECT n FROM nt) AS n
      FROM src_tot s
      CROSS JOIN lang_tot l
      LEFT JOIN counts c ON c.source = s.source AND c.lang = l.lang),
    terms AS (
      SELECT source, n_s,
        CAST(FLOOR(
          (CAST(CAST(o0 AS HUGEINT) * n - CAST(n_s AS HUGEINT) * n_l
             AS DOUBLE)
            * CAST(CAST(o0 AS HUGEINT) * n - CAST(n_s AS HUGEINT) * n_l
               AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(n_s AS DOUBLE)
            * CAST(n_l AS DOUBLE)) * 1e9) AS BIGINT) AS term_fp
      FROM cells)
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
      CAST(COUNT(*) AS BIGINT) AS n_cells,
      CAST(SUM(term_fp) AS DOUBLE) / 1e9 AS chi2
    FROM terms GROUP BY source"""

  // --------------------------------------------- replica checksums
  /** Merkle-lite replica reconciliation: per-partition (here: per
    * source) ORDER-INDEPENDENT checksums — row count, bit_xor of the
    * content fingerprint, and a modular fingerprint sum — computed on
    * two replicas of the corpus and compared at checksum grain. This
    * is how a 100 TB mirror is audited: each side scans itself once,
    * ships one census row per partition, and only partitions whose
    * checksums disagree ever get row-level diffing (q169 is the
    * row-grain diff that follows). Replica B plants the divergence
    * deterministically (drops doc_ids ≡0 mod 83, rewrites the text of
    * ids ≡0 mod 101), so exactly the sources holding those ids
    * mismatch.
    *
    * XOR is associative/commutative with no overflow, so it combines
    * map-side in any order; the mod-1e9+7 sum is a second independent
    * lane (XOR alone is blind to an even number of identical flips).
    * Both engines compute identical values — the checksums themselves
    * are the oracle-checked output. */
  val q177ReplicaChecksums: Q = (s, d) => {
    import s.implicits._
    val a = Tables.documents(s, d).select($"doc_id", $"source", $"text")
    val b = a.filter($"doc_id" % 83 =!= 0)
      .withColumn("text",
        when($"doc_id" % 101 === 0, concat($"text", lit(" [edited]")))
          .otherwise($"text"))
    def census(df: org.apache.spark.sql.DataFrame, side: String) =
      df.withColumn("fp", TextOps.fingerprintCol)
        .groupBy($"source")
        .agg(count(lit(1)).as(s"n_rows_$side"),
          expr("bit_xor(fp)").as(s"xor_$side"),
          sum(pmod($"fp", lit(1000000007L))).cast("long")
            .as(s"sum_$side"))
    census(a, "a").join(census(b, "b"), Seq("source"), "full_outer")
      .select($"source",
        coalesce($"n_rows_a", lit(0L)).as("n_rows_a"),
        coalesce($"n_rows_b", lit(0L)).as("n_rows_b"),
        coalesce($"xor_a", lit(0L)).as("xor_a"),
        coalesce($"xor_b", lit(0L)).as("xor_b"),
        when($"n_rows_a" === $"n_rows_b"
          && $"xor_a" === $"xor_b" && $"sum_a" === $"sum_b", 1L)
          .otherwise(0L).as("is_match"))
  }
  val o177: String = s"""
    WITH a AS (SELECT doc_id, source, text FROM documents),
    b AS (
      SELECT doc_id, source,
        CASE WHEN doc_id % 101 = 0 THEN text || ' [edited]'
             ELSE text END AS text
      FROM a WHERE doc_id % 83 <> 0),
    ca AS (
      SELECT source, COUNT(*) AS n_rows_a,
        bit_xor(${TextOps.fingerprintSql}) AS xor_a,
        CAST(SUM(((${TextOps.fingerprintSql}) % 1000000007 + 1000000007)
          % 1000000007) AS BIGINT) AS sum_a
      FROM a GROUP BY source),
    cb AS (
      SELECT source, COUNT(*) AS n_rows_b,
        bit_xor(${TextOps.fingerprintSql}) AS xor_b,
        CAST(SUM(((${TextOps.fingerprintSql}) % 1000000007 + 1000000007)
          % 1000000007) AS BIGINT) AS sum_b
      FROM b GROUP BY source)
    SELECT source,
      COALESCE(n_rows_a, 0) AS n_rows_a,
      COALESCE(n_rows_b, 0) AS n_rows_b,
      COALESCE(xor_a, 0) AS xor_a,
      COALESCE(xor_b, 0) AS xor_b,
      CAST(CASE WHEN n_rows_a = n_rows_b AND xor_a = xor_b
            AND sum_a = sum_b THEN 1 ELSE 0 END AS BIGINT) AS is_match
    FROM ca FULL OUTER JOIN cb USING (source)"""

  // --------------------------------------------- vocabulary coverage
  /** Out-of-vocabulary census: build the global top-1000 vocabulary
    * (count desc, term asc — deterministic), then report each
    * source's token coverage against it — total tokens, in-vocab
    * tokens, distinct OOV types, and the OOV rate. This is the
    * tokenizer-coverage report read before fixing a vocab size or
    * shipping a tokenizer to a new domain: a source with high OOV
    * rate will fragment into subwords and blow the token budget.
    *
    * 100 TB design: term census map-side combines; the global top-k
    * is a TakeOrdered heap (no full sort), and its 1000 rows
    * broadcast back into the per-source census join — the corpus
    * text itself is scanned once and never shuffled. */
  val q175OovCoverage: Q = (s, d) => {
    import s.implicits._
    val occ = Tables.documents(s, d)
      .select($"source", explode(split($"text", " ")).as("term"))
      .groupBy($"source", $"term")
      .agg(count(lit(1)).as("c"))
    val vocab = occ.groupBy($"term")
      .agg(sum($"c").as("n"))
      .orderBy($"n".desc, $"term".asc)
      .limit(1000)
      .select($"term", lit(1L).as("in_vocab"))
    occ.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("in_vocab", coalesce($"in_vocab", lit(0L)))
      .groupBy($"source")
      .agg(sum($"c").cast("long").as("n_tokens"),
        sum($"c" * $"in_vocab").cast("long").as("n_in_vocab"),
        sum(lit(1L) - $"in_vocab").cast("long").as("n_oov_types"),
        ((sum($"c") - sum($"c" * $"in_vocab")).cast("double")
          / sum($"c").cast("double")).as("oov_rate"))
  }
  val o175: String = """
    WITH occ AS (
      SELECT source, term, COUNT(*) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2),
    vocab AS (
      SELECT term, 1 AS in_vocab
      FROM (SELECT term, SUM(c) AS n FROM occ GROUP BY term)
      ORDER BY n DESC, term ASC LIMIT 1000),
    j AS (
      SELECT occ.source, occ.c,
        COALESCE(vocab.in_vocab, 0) AS in_vocab
      FROM occ LEFT JOIN vocab USING (term))
    SELECT source,
      CAST(SUM(c) AS BIGINT) AS n_tokens,
      CAST(SUM(c * in_vocab) AS BIGINT) AS n_in_vocab,
      CAST(SUM(1 - in_vocab) AS BIGINT) AS n_oov_types,
      CAST(SUM(c) - SUM(c * in_vocab) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
        AS oov_rate
    FROM j GROUP BY source"""

  // --------------------------------------------- token diversity
  /** Simpson token-diversity census per source: Simpson index
    * λ = Σc²/n² (the probability two random tokens coincide), its
    * Gini–Simpson complement 1−λ, and the inverse-Simpson effective
    * vocabulary size n²/Σc² — the diversity numbers an ecology-style
    * corpus audit quotes (and the entropy-free spelling: both factors
    * are EXACT integer sums, so unlike Shannon entropy no ln() has to
    * agree across engines — the only floating point is one
    * correctly-rounded divide per output cell).
    *
    * 100 TB design: two nested map-side-combined aggregates over
    * (source, term) then source — the word-count shape; no
    * countDistinct, no window, text never shuffles. */
  val q176TokenDiversity: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(split($"text", " ")).as("term"))
      .groupBy($"source", $"term")
      .agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum($"c" * $"c").cast("long").as("sum_c2"))
      .select($"source", $"n_tokens", $"n_types",
        ($"sum_c2".cast("double")
          / ($"n_tokens".cast("double") * $"n_tokens".cast("double")))
          .as("simpson"),
        (lit(1.0) - $"sum_c2".cast("double")
          / ($"n_tokens".cast("double") * $"n_tokens".cast("double")))
          .as("gini_simpson"),
        (($"n_tokens".cast("double") * $"n_tokens".cast("double"))
          / $"sum_c2".cast("double")).as("inv_simpson"))
  }
  val o176: String = """
    WITH c AS (
      SELECT source, term, COUNT(*) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2),
    s AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        COUNT(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS sum_c2
      FROM c GROUP BY source)
    SELECT source, n_tokens, n_types,
      CAST(sum_c2 AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        AS simpson,
      1.0 - CAST(sum_c2 AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        AS gini_simpson,
      (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        / CAST(sum_c2 AS DOUBLE) AS inv_simpson
    FROM s"""

  // --------------------------------------------- duplication PageRank
  /** PageRank (3 unrolled power iterations, damping 0.85) over the
    * UNDIRECTED near-dup graph of q60's verified SimHash pairs —
    * duplication centrality: the "template hub" documents whose text
    * radiates through the most near-copies. q83's connected
    * components say WHICH docs cluster together; this ranks WITHIN
    * the cluster structure (a hub joined to many satellites outranks
    * a chain member even in the same component), which is what a
    * boilerplate hunt actually reads. Every node has degree ≥ 1 by
    * construction (nodes are edge endpoints), so there is no
    * dangling-mass term.
    *
    * Float parity: each neighbor contribution r/deg is floored to a
    * 1e-12 fixed-point long BEFORE the cross-row sum (the memory-
    * cookbook spelling — cross-row double addition is
    * order-dependent; the long sum is exact), then one double
    * multiply-add per node per iteration.
    *
    * 100 TB design: PageRank runs at SIGNATURE grain (see the
    * two-level note in the body) — the weighted edge list (with
    * source degree) materializes ONCE (localCheckpoint; Catalyst has
    * no DataFrame-level common-subtree reuse, so the unrolled loop
    * would otherwise recompute the candidate generation every
    * iteration), each iteration is one join on the rank frontier +
    * one map-side-combined sum keyed on the destination, and the
    * member expansion is a final join on the signature. Iteration
    * state is (signature, rank) — 16 bytes — never text, and the
    * edge volume is linear in distinct signatures even when a
    * boilerplate clique holds 10⁸ members. */
  val q171PagerankDupGraph: Q = (s, d) => {
    import s.implicits._
    // TWO-LEVEL respelling (round 8): every member of an identical-
    // signature group has the SAME neighborhood in the all-pairs dup
    // graph (all other members of its group + all members of every
    // verified neighbor group), so degree and rank are constant
    // within a group and PageRank can run at SIGNATURE grain with
    // multiplicities — |signatures| nodes instead of |docs|, and
    // LINEAR edge volume instead of the 10⁸-edge all-pairs census the
    // scale rehearsal measured on a boilerplate-grade corpus.
    // EXACTNESS: the fixed-point contribution floor(r/deg·1e12) is
    // identical for every member of a group, so the member-level sum
    // Σ floor(...) equals the weighted w·floor(...) EXACTLY in int64
    // (no float reordering) — the unchanged all-pairs oracle is the
    // bit-level witness. Weight INTO t from neighbor group s is m_s;
    // the within-clique term is a self-edge of weight m_t − 1.
    // int64 bound: w·c_fp ≤ N·max(r/deg)·1e12 — the SAME bound as the
    // member-level sum (ROADMAP §int64 note applies to both).
    val sig = DedupOps.q59SimHash(s, d)
    val groups = sig.groupBy($"simhash")
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("m"))
      .localCheckpoint(eager = false)
    val sp = DedupOps.verifiedSigPairs(groups.select($"simhash"))
      .select($"sa", $"sb")
    val dir = sp.select($"sa".as("src"), $"sb".as("dst"))
      .unionByName(sp.select($"sb".as("src"), $"sa".as("dst")))
      .join(groups.select($"simhash".as("src"), $"m".as("w")), Seq("src"))
    val self = groups.filter($"m" > 1)
      .select($"simhash".as("src"), $"simhash".as("dst"),
        ($"m" - 1).as("w"))
    val wed = dir.unionByName(self)
    // member degree of group t = Σ incoming weights (= (m_t − 1) +
    // Σ_{verified nbr s} m_s) — identical to the all-pairs degree
    val deg = wed.groupBy($"dst").agg(sum($"w").as("deg"))
      .select($"dst".as("src"), $"deg")
    val edeg = wed.join(deg, Seq("src")).localCheckpoint(eager = false)
    var ranks = deg.select($"src", lit(1.0).as("r"))
    for (_ <- 1 to 3) {
      ranks = edeg.join(ranks, Seq("src"))
        .withColumn("c_fp",
          floor($"r" / $"deg".cast("double") * lit(1.0e12)))
        .groupBy($"dst")
        .agg(sum($"w" * $"c_fp").as("s_fp"))
        .select($"dst".as("src"),
          (lit(0.15) + lit(0.85) *
            ($"s_fp".cast("double") / lit(1.0e12))).as("r"))
    }
    // expand back to members: every doc inherits its group's
    // (degree, rank) — the exact member-level values
    sig
      .join(deg.select($"src".as("simhash"), $"deg"), Seq("simhash"))
      .join(ranks.select($"src".as("simhash"), $"r"), Seq("simhash"))
      .select($"doc_id", $"deg".cast("long").as("degree"),
        $"r".as("pagerank"))
  }
  val o171: String = {
    def iter(prev: String, next: String) = s"""
    $next AS (
      SELECT ed.v AS u,
        0.15 + 0.85 * (CAST(SUM(CAST(FLOOR(
            $prev.r / CAST(deg.deg AS DOUBLE) * 1e12) AS BIGINT))
          AS DOUBLE) / 1e12) AS r
      FROM ed
      JOIN $prev ON ed.u = $prev.u
      JOIN deg ON deg.u = ed.u
      GROUP BY ed.v)"""
    s"""
    WITH e0 AS MATERIALIZED (${DedupOps.o60}),
    ed AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM e0
           UNION ALL
           SELECT doc_b AS u, doc_a AS v FROM e0),
    deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM ed GROUP BY u),
    r0 AS (SELECT u, 1.0 AS r FROM deg),${iter("r0", "r1")},${iter("r1", "r2")},${iter("r2", "r3")}
    SELECT deg.u AS doc_id, CAST(deg.deg AS BIGINT) AS degree,
           r3.r AS pagerank
    FROM deg JOIN r3 ON r3.u = deg.u"""
  }

  // --------------------------------------- incremental cluster upkeep
  /** Incremental duplicate-cluster maintenance: yesterday's labels +
    * today's NEW edges → updated labels, WITHOUT re-scanning the old
    * edge set — the nightly path of a corpus-scale dedup service
    * (q83's batch CC is the weekly rebuild; q141 proves the same
    * incremental-vs-recompute contract for mart algebra).
    *
    * Old clusters enter the propagation CONTRACTED to their label
    * edges (member → comp), so the incremental graph is
    * |old labels| + |new edges| rows, not |all edges|. Labels are
    * member-min ids and contraction preserves both connectivity and
    * the component min, so the result is IDENTICAL to a batch
    * recompute over all edges — which is exactly what the oracle
    * runs. The deterministic old/new split (an edge is "new" when
    * either endpoint ≡ 0 mod 7) makes both engines construct the
    * same scenario. */
  val q163IncrementalClusters: Q = (s, d) => {
    // cluster-grain edges: the old/new split partitions a DIFFERENT
    // (linear) edge set than the all-pairs census, but the final
    // labels are CC over the union of both partitions = CC over the
    // full cluster-edge graph = the same components the all-pairs
    // oracle computes — the contraction-algebra witness is unchanged
    val edges = DedupOps.q60ClusterEdges(s, d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint(eager = false)
    val isNew = col("src") % 7 === 0 || col("dst") % 7 === 0
    val oldLabels = connectedComponents(edges.filter(!isNew))
    // contracted old state: every member points at its label; the
    // self-edge of each representative is redundant and dropped
    val inc = oldLabels.filter(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as("src"), col("comp").as("dst"))
      .unionByName(edges.filter(isNew))
    val labels = connectedComponents(inc)
    val sizes = labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }
  /** Oracle: the FULL batch recompute (o83 verbatim) — identical
    * output proves the contraction algebra lossless. */
  val o163: String = o83

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
    val scored = tf.join(dfc, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") / sqrt(col("df").cast("double")))
    // top-3 per doc through the custom two-phase heap operator
    // (plans/TopKPlan) instead of a row_number window: thousands of
    // doc groups, and the heap pass never sorts whole partitions
    graft.plans.TopK.perGroup(scored, Seq("doc_id"),
      Seq(("score", true), ("term", false)), 3)
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
        // mod-prime reduce before the multiply (Int64-safe at any id)
        when(pmod(pmod(col("doc_id"), lit(1000000007L)) *
          lit(2654435761L), lit(100))
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
        CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 <
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

  // ------------------------------- bloom-prefiltered incremental dedup
  /** q87's incremental dedup with Spark's OWN bloom expressions on the
    * front: the snapshot's fingerprint set is folded into one compact
    * bloom filter (`bloom_filter_agg` — the build side of Spark's
    * internal runtime row-level filters, exposed through
    * GraftExtensions), collected as a few-KB binary, and probed per
    * batch row as a LITERAL (`bloom_might_contain`). Rows the bloom
    * clears are definitely novel (no false negatives) and skip the
    * join entirely; only might-contain suspects pay the exact fp join.
    * The bloom's false positives change only how many rows take the
    * join path — the OUTPUT is bit-identical to q87's exact census,
    * which is why the same oracle construction checks it.
    *
    * 100 TB design: this is the distributed-join prefilter pattern —
    * the bloom build is one map-side-combined aggregate over 8-byte
    * keys, the driver ships ~KBs, and the expensive shuffle join sees
    * only the (tiny) suspect fraction of the intake instead of all of
    * it. */
  val q109BloomDedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("fp", TextOps.fingerprintCol)
    // materialize the distinct-fp snapshot ONCE: the bloom build (an
    // eager driver action) and the exact verify join both read it —
    // without this the scan+fingerprint+distinct subtree runs twice
    val snapshot = docs.filter(col("doc_id") % 10 < 7)
      .select(col("fp")).distinct().localCheckpoint(eager = false)
    val bloomBytes = snapshot
      .agg(expr("bloom_filter_agg(fp)").as("bf"))
      .head().getAs[Array[Byte]](0)
    val bridge = org.apache.spark.sql.GraftPlanBridge
    val mightContain = bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        bridge.expression(lit(bloomBytes)),
        bridge.expression(col("fp"))))
    // a NULL fingerprint probes to NULL, which would fail BOTH filters
    // below and silently drop the row — treat it as a suspect so the
    // exact join decides (NULL never matches there → counted as new,
    // exactly like q87's left join)
    // materialize the probed batch once, projected to 17 bytes/row
    // (source, fp, flag — never the text): both the cleared and the
    // verified branch read it, instead of each re-scanning and
    // re-fingerprinting the intake
    val batch = docs.filter(col("doc_id") % 10 >= 7)
      .withColumn("maybe_seen", coalesce(mightContain, lit(true)))
      .select(col("source"), col("fp"), col("maybe_seen"))
      .localCheckpoint(eager = false)
    // bloom-cleared rows never reach the join; suspects verify exactly
    val cleared = batch.filter(!col("maybe_seen"))
      .select(col("source"), lit(0L).as("seen"))
    val verified = batch.filter(col("maybe_seen"))
      .join(snapshot.withColumn("seen", lit(1L)), Seq("fp"), "left")
      .select(col("source"), coalesce(col("seen"), lit(0L)).as("seen"))
    cleared.unionByName(verified)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(col("seen")).cast("long").as("n_seen"),
        (count(lit(1)) - sum(col("seen"))).cast("long").as("n_new"))
  }
  /** Same oracle construction as q87 — the bloom is a pure prefilter
    * and must not change the census. */
  val o109: String = o87

  // ------------------------------------------- repetition filter
  /** Gopher-style repetition quality gates: the fraction of a doc's
    * tokens that are repeats of an earlier token, and the share of its
    * 2-grams taken by the single most frequent 2-gram — boilerplate
    * and template spam score high on both. The dup-token fraction is a
    * pure in-row expression (array_distinct fold, codegen'd, no
    * shuffle); the top-bigram share needs a per-(doc, gram) count, so
    * it explodes ONCE and map-side combines — keyed on (doc_id, gram),
    * which cannot skew across docs. Thresholds (0.3 / 0.18) follow the
    * Gopher paper's repetition-filter family. */
  val q88RepetitionFilter: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("dup_token_frac",
        (col("n_tokens") - size(array_distinct(col("t")))).cast("double")
          / col("n_tokens").cast("double"))
    val bigrams = docs
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, greatest(size(t) - 1, 1))")).as("i"))
      .filter(col("i") + 1 <= size(col("t")))
      .select(col("doc_id"), concat(element_at(col("t"), col("i")),
        lit(" "), element_at(col("t"), col("i") + 1)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"),
        sum(col("c")).cast("long").as("n_grams"))
      .withColumn("top_bigram_frac",
        col("top_c").cast("double") / col("n_grams").cast("double"))
    docs.select(col("doc_id"), col("dup_token_frac"))
      .join(bigrams.select(col("doc_id"), col("top_bigram_frac")),
        Seq("doc_id"))
      .withColumn("keep",
        when(col("dup_token_frac") <= 0.3
          && col("top_bigram_frac") <= 0.18, 1L).otherwise(0L))
  }
  val o88: String = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    dup AS (
      SELECT doc_id,
        CAST(len(t) - len(list_distinct(t)) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) AS dup_token_frac
      FROM toks),
    grams AS (
      SELECT doc_id,
        unnest(list_transform(generate_series(1, len(t) - 1),
          i -> t[i] || ' ' || t[i + 1])) AS gram
      FROM toks),
    gc AS (
      SELECT doc_id, gram, COUNT(*) AS c
      FROM grams GROUP BY doc_id, gram),
    tb AS (
      SELECT doc_id,
        CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
          AS top_bigram_frac
      FROM gc GROUP BY doc_id)
    SELECT d.doc_id, d.dup_token_frac, tb.top_bigram_frac,
      CASE WHEN d.dup_token_frac <= 0.3 AND tb.top_bigram_frac <= 0.18
           THEN 1 ELSE 0 END AS keep
    FROM dup d JOIN tb USING (doc_id)"""

  // --------------------------------------------- decontamination
  /** Eval-set decontamination: a training doc is contaminated when it
    * shares ≥ 2 distinct token-3-gram shingles with ANY doc of the
    * held-out eval set (doc_id % 97 = 0 stands in for the benchmark
    * suite). Reported as the per-source contamination census the
    * pipeline would alert on.
    *
    * 100 TB design: the eval side is benchmarks — thousands of docs,
    * not billions — so its distinct-shingle set broadcasts and the
    * train side is a map-side semi-join (no shuffle of the corpus);
    * the per-(train doc) distinct-overlap count is keyed on doc_id,
    * which cannot skew. */
  val q89Decontaminate: Q = (s, d) => {
    val sh = DedupOps.withShingles(Tables.documents(s, d))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(col("shs"))).as("sh"))
    val evalSh = sh.filter(col("doc_id") % 97 === 0)
      .select(col("sh")).distinct()
    val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .select(col("doc_id"), lit(1L).as("bad"))
    Tables.documents(s, d).filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("bad"), lit(0L))).cast("long")
          .as("n_contaminated"))
      .withColumn("contaminated_pct",
        col("n_contaminated").cast("double") * 100.0
          / col("n_docs").cast("double"))
  }
  val o89: String = s"""
    WITH sh0 AS (
      SELECT DISTINCT doc_id, source, unnest(shs) AS sh
      FROM (SELECT doc_id, source, ${DedupOps.shinglesSql} AS shs
            FROM (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents))),
    evalsh AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT doc_id FROM sh0
      JOIN evalsh USING (sh)
      WHERE doc_id % 97 <> 0
      GROUP BY doc_id HAVING COUNT(*) >= 2)
    SELECT d.source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS n_contaminated,
      CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        AS DOUBLE) * 100.0 / CAST(COUNT(*) AS DOUBLE)
        AS contaminated_pct
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 97 <> 0
    GROUP BY d.source"""

  // --------------------------------------------- mixture weights
  /** Training-mixture reweighting: given a target language share, the
    * per-doc sampling weight is target_share / actual_token_share —
    * the quantity a data-mixing stage multiplies into each domain's
    * sampling rate to hit the recipe. Exact integer token sums; the
    * shares and weights are single IEEE divisions of those sums, so
    * they hash-match cross-engine. A two-level aggregate (per-lang,
    * then corpus total joined back) — at 100 TB both are tiny. */
  // ------------------------------------ mixture-temperature sweep
  /** Temperature-scaled sampling mixture: per source, its share of
    * the training mixture under w ∝ n^τ for τ ∈ {1, 0.5, 0.25} — the
    * ONE practical knob multilingual/multi-source pipelines turn
    * (τ=1 is proportional sampling that drowns small sources; lower τ
    * flattens toward uniform, the mT5/XLM-R recipe). q90 computes
    * weights for a FIXED target mixture; this sweeps the temperature
    * family so a curator can read how much each setting up-samples
    * the tail before committing epochs to it.
    *
    * Float parity: n^0.5 and n^0.25 are sqrt and sqrt∘sqrt of the
    * exact integer census — identical IEEE on both engines — then
    * FIXED-POINTED (floor ×1e9) before the cross-source sums, so the
    * share denominators are exact int64 regardless of summation
    * order; each share is one IEEE divide.
    *
    * 100 TB design: one corpus scan to the |sources| census;
    * everything after rides census rows + one broadcast totals row
    * (intended single-row cross — whitelisted). */
  val q239TemperatureSweep: Q = (s, d) => {
    val per = Tables.documents(s, d)
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("ntok")).cast("long").as("n_tokens"))
      .withColumn("w05_fp",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1.0e9))
          .cast("long"))
      .withColumn("w025_fp",
        floor(sqrt(sqrt(col("n_tokens").cast("double"))) * lit(1.0e9))
          .cast("long"))
    val totals = per.agg(
      sum(col("n_tokens")).cast("long").as("t10"),
      sum(col("w05_fp")).cast("long").as("t05"),
      sum(col("w025_fp")).cast("long").as("t025"))
    per.join(broadcast(totals))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("t10").cast("double"))
          .as("share_t100"),
        (col("w05_fp").cast("double") / col("t05").cast("double"))
          .as("share_t050"),
        (col("w025_fp").cast("double") / col("t025").cast("double"))
          .as("share_t025"))
  }
  val o239: String = """
    WITH per AS (
      SELECT source,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    fp AS (
      SELECT source, n_tokens,
        CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT)
          AS w05_fp,
        CAST(FLOOR(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1e9)
          AS BIGINT) AS w025_fp
      FROM per),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS t10,
        CAST(SUM(w05_fp) AS BIGINT) AS t05,
        CAST(SUM(w025_fp) AS BIGINT) AS t025
      FROM fp)
    SELECT source, n_tokens,
      CAST(n_tokens AS DOUBLE) / CAST(t10 AS DOUBLE) AS share_t100,
      CAST(w05_fp AS DOUBLE) / CAST(t05 AS DOUBLE) AS share_t050,
      CAST(w025_fp AS DOUBLE) / CAST(t025 AS DOUBLE) AS share_t025
    FROM fp, tot"""

  val q90MixtureWeights: Q = (s, d) => {
    val target =
      when(col("lang") === "en", 0.4)
        .when(col("lang") === "es", 0.2)
        .when(col("lang") === "fr", 0.2)
        .when(col("lang") === "de", 0.1)
        .otherwise(0.1)
    val perLang = Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(sum(col("n_tokens")).cast("long").as("total_tokens"))
      .withColumn("target_share", target)
    val total = perLang.agg(
      sum(col("total_tokens")).cast("long").as("corpus_tokens"))
    perLang.join(broadcast(total))
      .withColumn("actual_share",
        col("total_tokens").cast("double")
          / col("corpus_tokens").cast("double"))
      .withColumn("weight", col("target_share") / col("actual_share"))
      .select(col("lang"), col("total_tokens"), col("actual_share"),
        col("target_share"), col("weight"))
  }
  val o90: String = """
    WITH per_lang AS (
      SELECT lang,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
          AS total_tokens,
        CASE WHEN lang = 'en' THEN 0.4 WHEN lang = 'es' THEN 0.2
             WHEN lang = 'fr' THEN 0.2 WHEN lang = 'de' THEN 0.1
             ELSE 0.1 END AS target_share
      FROM documents GROUP BY lang),
    tot AS (
      SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus_tokens
      FROM per_lang)
    SELECT lang, total_tokens,
      CAST(total_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE)
        AS actual_share,
      target_share,
      target_share / (CAST(total_tokens AS DOUBLE)
        / CAST(corpus_tokens AS DOUBLE)) AS weight
    FROM per_lang, tot"""

  // ------------------------------------------------- length histogram
  /** Corpus profiling histogram: fixed-width bins over document length
    * (100-char bins, top bin open) with count and share — the
    * distribution census a curation pipeline renders before choosing
    * its length filters. Integer binning (`div` + `least`) so both
    * engines bucket identically; one map-side-combined aggregate. */
  val q96LengthHistogram: Q = (s, d) => {
    val binned = Tables.documents(s, d)
      .withColumn("bin", expr("least(n_chars div 100, 9)").cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"))
    // total = sum over the (tiny) binned census — NOT a second scan of
    // the documents table
    binned
      .join(broadcast(binned.agg(
        sum(col("n_docs")).cast("long").as("n_total"))))
      .select(col("bin"), (col("bin") * 100).as("lo_chars"),
        col("n_docs"),
        (col("n_docs").cast("double") * 100.0
          / col("n_total").cast("double")).as("pct"))
  }
  val o96: String = """
    WITH binned AS (
      SELECT least(n_chars // 100, 9) AS bin, COUNT(*) AS n_docs
      FROM documents GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_total FROM documents)
    SELECT bin, bin * 100 AS lo_chars, n_docs,
      CAST(n_docs AS DOUBLE) * 100.0 / CAST(n_total AS DOUBLE) AS pct
    FROM binned, tot"""

  // --------------------------------------- union-of-evidence clusters
  /** Duplicate clusters over the UNION of all three near-dup signals:
    * SimHash Hamming pairs (q60 — token-level edits), n-gram Jaccard
    * pairs (q58 — shingle overlap), and embedding-cosine pairs (q64 —
    * semantic paraphrase). Each signal has blind spots; a paraphrased
    * document shares no shingles but sits next to its source in
    * embedding space, while a near-verbatim copy with one shuffled
    * paragraph is the reverse — union-of-evidence is how production
    * corpus dedup (e.g. the Gopher/FineWeb-style pipelines) composes
    * them. Emits per-doc cluster membership plus `n_signals`, the
    * count of DISTINCT evidence kinds inside the cluster — a 3-signal
    * cluster is a confident kill, a 1-signal singleton pair is review
    * material.
    *
    * 100 TB design: each edge source is already bucketed/banded (never
    * all-pairs); the corpus is scanned and tokenized ONCE
    * (`DedupOps.sharedTextSignals` materializes the shingle and
    * token-hash arrays together) and both text signals derive from
    * that frame, and the edge union is materialized once
    * (`localCheckpoint`) and consumed by both the CC loop and the
    * signal census — so the expensive scan+tokenize and the three
    * candidate generations each run exactly once. The CC loop
    * shuffles only (doc_id, comp) pairs — never text. */
  val q98UnionDupClusters: Q = (s, d) => {
    val shared = DedupOps.sharedTextSignals(s, d)
    // cluster-grain simhash edges: same components/incidence as the
    // all-pairs census in linear volume (a boilerplate clique of m
    // docs contributes m−1 star edges, not C(m,2) — the round-8 scale
    // rehearsal measured 10⁸ all-pairs edges on a 40k corpus before
    // this). The oracle still unions the all-pairs o60 — identical
    // clusters, independently witnessed.
    val sim = DedupOps.simhashClusterEdges(DedupOps.simhashFrom(shared))
      .select(col("doc_a"), col("doc_b"), lit("simhash").as("kind"))
    val jac = DedupOps.jaccardFrom(shared)
      .select(col("doc_a"), col("doc_b"), lit("jaccard").as("kind"))
    val emb = VectorOps.q64CosineNearDup(s, d)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        lit("embedding").as("kind"))
    val ev = sim.unionByName(jac).unionByName(emb).localCheckpoint(eager = false)
    val labels = connectedComponents(
      ev.select(col("doc_a").as("src"), col("doc_b").as("dst")).distinct())
    val sizes = labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val kinds = ev
      .join(labels.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .groupBy(col("comp").as("cluster_id"))
      .agg(countDistinct(col("kind")).as("n_signals"))
    labels.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .join(kinds, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        col("cluster_size"), col("n_signals"))
  }
  val o98: String = s"""
    WITH RECURSIVE
    sim AS MATERIALIZED (${DedupOps.o60}),
    jac AS MATERIALIZED (${DedupOps.o58}),
    emb AS MATERIALIZED (${VectorOps.o64}),
    ev AS MATERIALIZED (
      SELECT doc_a, doc_b, 'simhash' AS kind FROM sim
      UNION ALL
      SELECT doc_a, doc_b, 'jaccard' AS kind FROM jac
      UNION ALL
      SELECT id_a AS doc_a, id_b AS doc_b, 'embedding' AS kind FROM emb),
    uedges AS MATERIALIZED (SELECT DISTINCT doc_a AS src, doc_b AS dst FROM ev
               UNION
               SELECT DISTINCT doc_b AS src, doc_a AS dst FROM ev),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM uedges
      UNION
      SELECT reach.doc_id, uedges.dst
      FROM reach JOIN uedges ON uedges.src = reach.r),
    comp AS MATERIALIZED (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    sizes AS MATERIALIZED (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id),
    kinds AS MATERIALIZED (SELECT c.cluster_id, COUNT(DISTINCT ev.kind) AS n_signals
              FROM ev JOIN comp c ON c.doc_id = ev.doc_a
              GROUP BY c.cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size, k.n_signals
    FROM comp c
    JOIN sizes s USING (cluster_id)
    JOIN kinds k USING (cluster_id)"""

  /** q98's union-of-evidence dup clusters with the EMBEDDING lane on
    * q275's k-NN capped edges instead of the raw ε-graph — the
    * production spelling of the flagship (round-9 verdict "What's
    * missing #2"). Same census columns as q98 so the two are directly
    * comparable: on a corpus without giant boilerplate families the
    * clusters coincide; on one WITH them, q98's ε-lane feeds C(m,2)
    * edges per m-doc family into CC while this one feeds ≤ k·m —
    * the ×1024 probe measured exactly that shape (102M ε-edges, 95%
    * of q98's CC input, on the pre-fix amplifier). The trade is
    * q275's: weak cosine chains between strong families may split
    * (review material, not kill evidence).
    *
    * 100 TB design: all three lanes are now linear-volume by
    * construction (simhash cluster-grain star edges, df-capped
    * jaccard posting lists, k-NN-capped cosine edges); the scan +
    * tokenize runs once via `sharedTextSignals`; the union is
    * checkpointed once and consumed by both the CC loop and the
    * signal census; the CC loop shuffles only (doc_id, comp). */
  val q276UnionDupClustersKnn: Q = (s, d) => {
    val shared = DedupOps.sharedTextSignals(s, d)
    val sim = DedupOps.simhashClusterEdges(DedupOps.simhashFrom(shared))
      .select(col("doc_a"), col("doc_b"), lit("simhash").as("kind"))
    val jac = DedupOps.jaccardFrom(shared)
      .select(col("doc_a"), col("doc_b"), lit("jaccard").as("kind"))
    // directed top-3 edges; CC symmetrizes and the kinds census only
    // reads DISTINCT kind per cluster, so orientation is immaterial
    val emb = VectorOps.knnEdges(s, d)
      .select(col("src").as("doc_a"), col("dst").as("doc_b"),
        lit("embedding").as("kind"))
    val ev = sim.unionByName(jac).unionByName(emb).localCheckpoint(eager = false)
    val labels = connectedComponents(
      ev.select(col("doc_a").as("src"), col("doc_b").as("dst")).distinct())
    val sizes = labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val kinds = ev
      .join(labels.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .groupBy(col("comp").as("cluster_id"))
      .agg(countDistinct(col("kind")).as("n_signals"))
    labels.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .join(kinds, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        col("cluster_size"), col("n_signals"))
  }
  val o276: String = s"""
    WITH RECURSIVE
    sim AS MATERIALIZED (${DedupOps.o60}),
    jac AS MATERIALIZED (${DedupOps.o58}),
    ${VectorOps.knnCtes},
    ev AS MATERIALIZED (
      SELECT doc_a, doc_b, 'simhash' AS kind FROM sim
      UNION ALL
      SELECT doc_a, doc_b, 'jaccard' AS kind FROM jac
      UNION ALL
      SELECT src AS doc_a, dst AS doc_b, 'embedding' AS kind FROM knn),
    uedges AS MATERIALIZED (SELECT DISTINCT doc_a AS src, doc_b AS dst FROM ev
               UNION
               SELECT DISTINCT doc_b AS src, doc_a AS dst FROM ev),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM uedges
      UNION
      SELECT reach.doc_id, uedges.dst
      FROM reach JOIN uedges ON uedges.src = reach.r),
    comp AS MATERIALIZED (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    sizes AS MATERIALIZED (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id),
    kinds AS MATERIALIZED (SELECT c.cluster_id, COUNT(DISTINCT ev.kind) AS n_signals
              FROM ev JOIN comp c ON c.doc_id = ev.doc_a
              GROUP BY c.cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size, k.n_signals
    FROM comp c
    JOIN sizes s USING (cluster_id)
    JOIN kinds k USING (cluster_id)"""

  // ------------------------------------------------------ chunking
  private val ChunkSize = 50
  private val ChunkStride = 40

  /** Sliding-window document chunking: fixed `ChunkSize`-token windows
    * every `ChunkStride` tokens (10-token overlap) — the standard prep
    * step that turns variable-length documents into training-sized
    * pieces while the overlap preserves cross-boundary context.
    *
    * 100 TB design: pure per-row compute — tokenize once, explode only
    * the chunk INDEX (sequence + slice), so the shuffle-free plan
    * emits chunks at scan parallelism; no window, no shuffle, no UDF
    * (all codegen'd array expressions). Chunk count per doc is
    * ⌈n/stride⌉ — output is a bounded ~1.25× inflation of the corpus,
    * not quadratic. */
  /** Chunk-index derivation shared by every consumer of the q99
    * chunk grain (q99, q114, q122, q229): one index per ChunkStride
    * window over a `toks` array column — ONE spelling, so an audit of
    * "the chunk table" can never drift from the real chunk grain. */
  private[ops] val chunkIdsExpr: String =
    s"sequence(0, (size(toks) - 1) div $ChunkStride)"
  /** DuckDB twin of [[chunkIdsExpr]] over a `t` list column. */
  private[ops] val chunkIdsSql: String =
    s"generate_series(0, (len(t) - 1) // $ChunkStride)"

  val q99ChunkDocs: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk_id",
        explode(expr(chunkIdsExpr)))
      .withColumn("ct",
        expr(s"slice(toks, chunk_id * $ChunkStride + 1, $ChunkSize)"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("ct")).cast("long").as("n_tokens"),
        array_join(col("ct"), " ").as("chunk_text"))
  }
  val o99: String = s"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ex AS (
      SELECT doc_id, t,
        unnest($chunkIdsSql) AS chunk_id
      FROM base)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      CAST(len(t[chunk_id * $ChunkStride + 1 :
                 chunk_id * $ChunkStride + $ChunkSize]) AS BIGINT) AS n_tokens,
      array_to_string(t[chunk_id * $ChunkStride + 1 :
                        chunk_id * $ChunkStride + $ChunkSize], ' ')
        AS chunk_text
    FROM ex"""

  // ------------------------------------ shared runs at chunk grain
  /** Shared token runs mapped onto the q99 CHUNK grain: for every
    * document pair with an exact shared run of ≥ MinRunTokens tokens
    * (the q213 diagonal islands, at RUN grain via
    * [[DedupOps.sharedRunsFrom]]), census which training chunks the
    * spans land in on EACH side — n_runs, the longest run, and the
    * count of affected chunks per document. This is what makes
    * span-level dedup ACTIONABLE on training sequences: q122
    * fingerprints whole chunks (only exact-duplicate chunks match);
    * this finds the chunks CONTAMINATED by a replicated span even
    * when the surrounding chunk text differs, so a curator can drop
    * or rewrite exactly those pieces instead of whole documents.
    *
    * Chunk mapping is pure arithmetic on the q99 layout (chunk c
    * covers tokens [c·stride+1, c·stride+size]): a span [s, e] hits
    * chunks from ⌈(s−size)/stride⌉ (floored at 0 — spelled as a CASE
    * so every `div` operand stays nonnegative; Spark `div` truncates
    * toward zero while DuckDB `//` floors, and they only agree ≥ 0)
    * through ⌊(e−1)/stride⌋.
    *
    * 100 TB design: rides the q213 postings layout (df-capped, never
    * all-pairs); the run frame is localCheckpoint'd once and feeds
    * the pair stats AND both chunk censuses; the chunk explode is
    * bounded by span/stride per run. */
  val q231SharedRunChunks: Q = (s, d) => {
    val runs = DedupOps.sharedRunsFrom(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .filter(col("run_tokens") >= DedupOps.MinRunTokens)
      .localCheckpoint(eager = false)
    def chunkSeq(st: String) = expr(
      s"""sequence(
            CASE WHEN $st <= $ChunkSize THEN 0
                 ELSE ($st - ${ChunkSize - ChunkStride + 1})
                      div $ChunkStride END,
            ($st + run_tokens - 2) div $ChunkStride)""")
    def sideCensus(st: String, out: String) = runs
      .select(col("doc_a"), col("doc_b"),
        explode(chunkSeq(st)).as("chunk"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("chunk")).cast("long").as(out))
    val pairStats = runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_tokens")).cast("long").as("max_run_tokens"))
    pairStats
      .join(sideCensus("start_a", "n_chunks_a"), Seq("doc_a", "doc_b"))
      .join(sideCensus("start_b", "n_chunks_b"), Seq("doc_a", "doc_b"))
  }
  val o231: String = s"""
    WITH ${DedupOps.sharedRunIslandsSql},
    runs AS (
      SELECT doc_a, doc_b, MIN(pos_a) AS start_a,
        MIN(pos_a) - diag AS start_b,
        COUNT(*) + ${DedupOps.RunK - 1} AS run_tokens
      FROM isl GROUP BY doc_a, doc_b, diag, grp
      HAVING COUNT(*) + ${DedupOps.RunK - 1} >= ${DedupOps.MinRunTokens}),
    ca AS (
      SELECT doc_a, doc_b, unnest(generate_series(
          CASE WHEN start_a <= $ChunkSize THEN 0
               ELSE (start_a - ${ChunkSize - ChunkStride + 1})
                    // $ChunkStride END,
          (start_a + run_tokens - 2) // $ChunkStride)) AS chunk
      FROM runs),
    cb AS (
      SELECT doc_a, doc_b, unnest(generate_series(
          CASE WHEN start_b <= $ChunkSize THEN 0
               ELSE (start_b - ${ChunkSize - ChunkStride + 1})
                    // $ChunkStride END,
          (start_b + run_tokens - 2) // $ChunkStride)) AS chunk
      FROM runs),
    pa AS (SELECT doc_a, doc_b,
             CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_chunks_a
           FROM ca GROUP BY 1, 2),
    pb AS (SELECT doc_a, doc_b,
             CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_chunks_b
           FROM cb GROUP BY 1, 2),
    ps AS (SELECT doc_a, doc_b, COUNT(*) AS n_runs,
             CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
           FROM runs GROUP BY 1, 2)
    SELECT ps.doc_a, ps.doc_b, ps.n_runs, ps.max_run_tokens,
           pa.n_chunks_a, pb.n_chunks_b
    FROM ps
    JOIN pa ON pa.doc_a = ps.doc_a AND pa.doc_b = ps.doc_b
    JOIN pb ON pb.doc_a = ps.doc_a AND pb.doc_b = ps.doc_b"""

  // ----------------------------------------------- blocklist redaction
  /** Blocklist term redaction census: word-boundary regex over a term
    * blocklist (the shape of PII masking / banned-term scrubbing in a
    * curation pipeline — swap the alternation for emails/phones/IDs in
    * production), reported per source as docs hit, total hits, and the
    * corpus size after `[REDACTED]` substitution.
    *
    * 100 TB design: per-row regex (RE2-class alternation) then one
    * map-side-combined census keyed on `source` — no shuffle of text,
    * no UDF. The redacted corpus itself would be written by the same
    * per-row projection at scan parallelism. */
  private val Blocklist = "\\b(customer|vector|spark)\\b"

  val q100RedactBlocklist: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("n_hits",
        size(regexp_extract_all(col("text"), lit(Blocklist), lit(0)))
          .cast("long"))
      .withColumn("red_len",
        length(regexp_replace(col("text"), Blocklist, "[REDACTED]"))
          .cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L))
          .cast("long").as("n_docs_hit"),
        sum(col("n_hits")).cast("long").as("n_hits"),
        sum(col("red_len")).cast("long").as("redacted_chars"))
  }
  val o100: String = s"""
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN len(regexp_extract_all(text, '$Blocklist')) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
      CAST(SUM(len(regexp_extract_all(text, '$Blocklist'))) AS BIGINT)
        AS n_hits,
      CAST(SUM(length(regexp_replace(text, '$Blocklist', '[REDACTED]', 'g')))
        AS BIGINT) AS redacted_chars
    FROM documents GROUP BY source"""

  // --------------------------------------- sketch length quantiles
  /** The 100 TB spelling of [[q101LengthQuantiles]]: Spark's
    * GK-sketch `percentile_approx` replaces the exact rank window, so
    * the whole profile is ONE map-side-combined aggregate — q101's
    * exact spelling needs a full per-language sort (the rank window)
    * plus a second count window, which is the quantile profiler's
    * cost ceiling at scale. min/max/count stay exact.
    *
    * Like q155: sketch estimates are engine-specific, so no DuckDB
    * oracle row (rows-only check); QueriesSpec pins the estimates
    * against q101's exact ranks within the sketch's accuracy
    * envelope, and PlanContractSpec pins the window-free plan. */
  val q168LengthQuantilesSketch: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        percentile_approx(col("n_chars"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)),
          lit(10000)).as("q"),
        max(col("n_chars")).as("max_chars"))
      .select(col("lang"), col("n_docs"), col("min_chars"),
        col("q")(0).as("p25_est"), col("q")(1).as("p50_est"),
        col("q")(2).as("p75_est"), col("q")(3).as("p90_est"),
        col("max_chars"))

  // ------------------------------------------------- PII class census
  /** PII detection census by PATTERN CLASS: emails, phone numbers,
    * and IPv4 addresses each counted separately per source — the
    * report a privacy review reads before choosing masking rules
    * (q100 is the generic blocklist redactor; this is its typed-PII
    * face, where each class gets its own precision/masking policy).
    *
    * The synthetic corpus carries no natural PII, so the query PLANTS
    * it deterministically (mod-sliced doc_ids get an email / phone /
    * IP appended — mirrored in the oracle SQL, the q55 non-vacuity
    * recipe) and the detector runs over the augmented text. Patterns
    * stay inside the RE2 ∩ java.util.regex dialect so both engines
    * match identically.
    *
    * 100 TB design: per-row regexes, one map-side-combined census
    * keyed on (source, class) — text never shuffles. */
  private val PiiClasses: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  val q164PiiCensus: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 13 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit(" call 555-123-4567"))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0, lit(" from 10.0.0.1"))
          .otherwise(lit(""))))
    val perClass = PiiClasses.map { case (cls, re) =>
      docs.select(col("source"), lit(cls).as("pii_class"),
        size(regexp_extract_all(col("aug"), lit(re), lit(0)))
          .cast("long").as("n_hits"))
    }.reduce(_ unionByName _)
    perClass.groupBy(col("source"), col("pii_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L))
          .cast("long").as("n_docs_hit"),
        sum(col("n_hits")).cast("long").as("n_hits"))
  }
  val o164: String = {
    // DuckDB single-quoted strings pass backslashes through verbatim,
    // so the Scala-level pattern (one backslash) embeds directly
    val arms = PiiClasses.map { case (cls, re) =>
      s"""SELECT source, '$cls' AS pii_class,
            CAST(len(regexp_extract_all(aug, '$re')) AS BIGINT) AS n_hits
          FROM aug"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH aug AS (
      SELECT source,
        text
          || (CASE WHEN doc_id % 13 = 0
              THEN ' contact user' || doc_id || '@example.com'
              ELSE '' END)
          || (CASE WHEN doc_id % 17 = 0 THEN ' call 555-123-4567'
              ELSE '' END)
          || (CASE WHEN doc_id % 19 = 0 THEN ' from 10.0.0.1'
              ELSE '' END) AS aug
      FROM documents),
    per_class AS (
      $arms)
    SELECT source, pii_class, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_docs_hit,
      CAST(SUM(n_hits) AS BIGINT) AS n_hits
    FROM per_class GROUP BY 1, 2"""
  }

  // --------------------------------------------- text hygiene census
  /** Encoding/script hygiene census — the byte-level QA a web-scale
    * corpus runs before tokenization: per source, how many documents
    * carry (a) UTF-8-decoded-as-Latin-1 mojibake ("Ã©"-style
    * artifacts), (b) the U+FFFD replacement character (lossy
    * transcode), (c) zero-width characters (paste/SEO junk that
    * silently corrupts token boundaries), (d) mixed Latin+Cyrillic
    * script (homoglyph spoofing / encoding confusion). Each class has
    * a distinct remediation (re-decode, drop, strip, flag), so they
    * are counted separately — the typed-hygiene twin of q164's PII
    * census.
    *
    * The synthetic corpus is pure ASCII, so the query PLANTS each
    * anomaly deterministically on mod-sliced doc_ids (mirrored in the
    * oracle — the q55/q164 non-vacuity recipe). Detectors are
    * substring/char-class probes that mean the same thing in both
    * engines: instr/strpos for the literal markers, a LITERAL-range
    * regex for Cyrillic (both dialects treat [а-я] identically; no
    * \\u escapes, which RE2 and java.util.regex spell differently).
    *
    * 100 TB design: per-row probes, ONE map-side-combined census keyed
    * on source — text never shuffles. */
  val q214TextHygiene: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 11 === 0, lit(" cafÃ©"))
          .otherwise(lit("")),
        when(col("doc_id") % 23 === 0, lit(" bad�token"))
          .otherwise(lit("")),
        when(col("doc_id") % 29 === 0, lit(" zero​width"))
          .otherwise(lit("")),
        when(col("doc_id") % 31 === 0, lit(" pаypal"))
          .otherwise(lit(""))))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(instr(col("aug"), "Ã") > 0, 1L).otherwise(0L))
          .cast("long").as("n_mojibake"),
        sum(when(instr(col("aug"), "�") > 0, 1L).otherwise(0L))
          .cast("long").as("n_replacement"),
        sum(when(instr(col("aug"), "​") > 0, 1L).otherwise(0L))
          .cast("long").as("n_zero_width"),
        sum(when(col("aug").rlike("[а-я]")
              && col("aug").rlike("[a-z]"), 1L).otherwise(0L))
          .cast("long").as("n_mixed_script"))
  }
  val o214: String = s"""
    WITH aug AS (
      SELECT source,
        text
          || (CASE WHEN doc_id % 11 = 0 THEN ' cafÃ©'
              ELSE '' END)
          || (CASE WHEN doc_id % 23 = 0 THEN ' bad�token'
              ELSE '' END)
          || (CASE WHEN doc_id % 29 = 0 THEN ' zero​width'
              ELSE '' END)
          || (CASE WHEN doc_id % 31 = 0 THEN ' pаypal'
              ELSE '' END) AS aug
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN strpos(aug, 'Ã') > 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_mojibake,
      CAST(SUM(CASE WHEN strpos(aug, '�') > 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_replacement,
      CAST(SUM(CASE WHEN strpos(aug, '​') > 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_zero_width,
      CAST(SUM(CASE WHEN regexp_matches(aug, '[а-я]')
                     AND regexp_matches(aug, '[a-z]')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed_script
    FROM aug GROUP BY 1"""

  // ------------------------------------------- count-min sketch audit
  /** Count-min sketch vs exact truth — the THIRD sketch family
    * (q155 = HLL distinct, q168 = GK quantiles, this = frequency),
    * and the only one whose construction is fully deterministic, so
    * unlike its rows-only siblings it gets a complete DuckDB oracle:
    * a depth-2 × width-[[CmWidth]] counter grid (each depth a
    * different (a·x + b) mod P row hash), point-queried at the exact
    * top-20 tokens with estimate = min over depths. The overestimate
    * column is the sketch's signature one-sided error — never
    * negative, shrinking as width grows — and auditing it against
    * exact counts is how a pipeline sizes the grid before trusting CM
    * for per-token throttling/heavy-hitter work at stream scale.
    *
    * 100 TB design: the counter grid is a (depth, bucket) census —
    * 2·[[CmWidth]] int64 cells regardless of corpus size, built with
    * ONE map-side-combined aggregate over the token census and
    * MERGEABLE across partitions/streams (counter-wise addition —
    * the property that makes CM the streaming frequency sketch). The
    * top-20 probe set is selected by sort+limit (k-bounded partial
    * heaps per partition, never a global census sort) and
    * broadcasts. */
  private[graft] val CmWidth = 256
  private[graft] val cmAb = Seq((37L, 17L), (8191L, 131L))

  val q221CountMinAudit: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .withColumn("th", expr(
        "CAST(ascii(term) * 131 + length(term) AS BIGINT)"))
      .localCheckpoint(eager = false) // feeds the grid AND the probe ranking
    val grid = cmAb.zipWithIndex.map { case ((a, b), dth) =>
      counts.select(lit(dth).as("depth"),
        ((col("th") * a + b) % lit(1000000007L) % CmWidth)
          .as("bucket"), col("n"))
    }.reduce(_ unionByName _)
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("n")).cast("long").as("cm"))
    // top-20 probe via sort+limit — plans TakeOrderedAndProject
    // (k-bounded per-partition heaps), never a single-partition sort
    // of the full term census; the rank window then rides the 20-row
    // result frame only (bounded — whitelisted in PlanContractSpec)
    val probes = counts
      .orderBy(col("n").desc, col("term").asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("term").asc)).cast("long"))
    val est = cmAb.zipWithIndex.map { case ((a, b), dth) =>
      probes.select(col("term"), col("rank"), col("n"),
        lit(dth).as("depth"),
        ((col("th") * a + b) % lit(1000000007L) % CmWidth)
          .as("bucket"))
    }.reduce(_ unionByName _)
      .join(grid, Seq("depth", "bucket"))
    est.groupBy(col("term"), col("rank"), col("n").as("n_exact"))
      .agg(min(col("cm")).as("n_est"))
      .withColumn("overestimate", col("n_est") - col("n_exact"))
      .select(col("rank"), col("term"), col("n_exact"), col("n_est"),
        col("overestimate"))
  }
  val o221: String = {
    val gridArms = cmAb.zipWithIndex.map { case ((a, b), dth) =>
      s"""SELECT $dth AS depth,
            (th * $a + $b) % 1000000007 % $CmWidth AS bucket, n
          FROM counts"""
    }.mkString("\n      UNION ALL\n      ")
    val probeArms = cmAb.zipWithIndex.map { case ((a, b), dth) =>
      s"""SELECT term, rank, n, $dth AS depth,
            (th * $a + $b) % 1000000007 % $CmWidth AS bucket
          FROM probes"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH counts AS (
      SELECT term, COUNT(*) AS n,
        CAST(greatest(unicode(term), 0) * 131 + length(term)
          AS BIGINT) AS th
      FROM (SELECT unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term),
    grid AS (
      SELECT depth, bucket, CAST(SUM(n) AS BIGINT) AS cm FROM (
      $gridArms) GROUP BY 1, 2),
    probes AS (
      SELECT term, n, CAST(row_number() OVER
          (ORDER BY n DESC, term ASC) AS BIGINT) AS rank, th
      FROM counts QUALIFY rank <= 20),
    est AS (
      $probeArms)
    SELECT e.rank, e.term, e.n AS n_exact,
      CAST(MIN(g.cm) AS BIGINT) AS n_est,
      CAST(MIN(g.cm) - e.n AS BIGINT) AS overestimate
    FROM est e JOIN grid g ON g.depth = e.depth AND g.bucket = e.bucket
    GROUP BY e.rank, e.term, e.n"""
  }

  // ------------------------------------------------- length quantiles
  /** Exact per-language length quantiles (p25/p50/p75/p90) via the
    * rank spelling: row_number over (n_chars, doc_id) within each
    * language, pick the element at rank ⌈q·n⌉ — percentile_disc
    * semantics written identically in both engines (their built-in
    * quantile functions interpolate differently, the DISCRETE rank
    * pick is bit-free: every output is an actual integer from the
    * data).
    *
    * 100 TB design: one shuffle on `lang` for the window, integer-only
    * comparisons after it. At petabyte scale the same census runs on a
    * pre-bucketed histogram (q96) instead of a full sort — the exact
    * spelling here is the oracle-checkable tier. */
  val q101LengthQuantiles: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    def pick(q: Double, as: String) =
      max(when(col("rn") === ceil(lit(q) * col("n")).cast("long"),
        col("n_chars"))).as(as)
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("lang"))).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        pick(0.25, "p25"), pick(0.5, "p50"),
        pick(0.75, "p75"), pick(0.9, "p90"),
        max(col("n_chars")).as("max_chars"))
  }
  val o101: String = """
    WITH r AS (
      SELECT lang, n_chars, doc_id,
        row_number() OVER (PARTITION BY lang
          ORDER BY n_chars ASC, doc_id ASC) AS rn,
        COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
      MIN(n_chars) AS min_chars,
      MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
          THEN n_chars END) AS p25,
      MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
          THEN n_chars END) AS p50,
      MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
          THEN n_chars END) AS p75,
      MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
          THEN n_chars END) AS p90,
      MAX(n_chars) AS max_chars
    FROM r GROUP BY lang"""

  // ---------------------------------------------- fixed-N per stratum
  /** Exactly-N-per-stratum sampling: the top `SampleN` docs per
    * language by a seeded Knuth-mix hash order — "give me exactly 25
    * docs per language", the eval-set construction primitive (q86 is
    * the RATE variant; a rate cannot promise a count). Deterministic
    * under any partitioning and reproducible by any engine.
    *
    * 100 TB design: one shuffle on `lang` for the per-stratum window;
    * the sort is on the 8-byte hash, never text. At extreme stratum
    * sizes the same selection runs as a two-pass threshold (sample the
    * hash distribution, take hash < t, exact-trim the boundary) — the
    * window spelling is the oracle-checkable tier. */
  private val SampleN = 25

  val q103FixedStratum: Q = (s, d) => {
    val h = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L)
      + lit(9176L), lit(1000000007L))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("h", h)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= SampleN)
      .select(col("lang"), col("rn"), col("doc_id"), col("source"))
  }
  val o103: String = s"""
    SELECT lang, rn, doc_id, source FROM (
      SELECT lang, doc_id, source,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY ((doc_id % 1000000007) * 2654435761 + 9176)
                     % 1000000007 ASC, doc_id ASC) AS BIGINT) AS rn
      FROM documents)
    WHERE rn <= $SampleN"""

  // ------------------------------------------------- vocabulary census
  /** Corpus heavy hitters: the top-5 tokens per language by frequency
    * with share-of-corpus — the vocabulary census a curation run reads
    * before choosing stop-lists, blocklists (q100), and the df-cap in
    * q58. q85 is the per-DOC relevance view; this is the corpus-level
    * frequency view.
    *
    * 100 TB design: explode → count keyed on (lang, token) with
    * map-side partial combine (hot tokens collapse in the combiner —
    * the same property that makes word-count scale), then a top-k
    * window over the tiny per-language census, never over rows. */
  val q104HeavyHitters: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("term").asc)
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("n")).cast("long").as("n_total"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .join(totals, Seq("lang"))
      .select(col("lang"), col("rank"), col("term"), col("n"),
        (col("n").cast("double") * 100.0
          / col("n_total").cast("double")).as("pct"))
  }
  val o104: String = """
    WITH counts AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents),
    c AS (SELECT lang, term, COUNT(*) AS n FROM counts GROUP BY 1, 2),
    totals AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_total
               FROM c GROUP BY lang),
    ranked AS (
      SELECT lang, term, n,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY n DESC, term ASC) AS BIGINT) AS rank
      FROM c)
    SELECT r.lang, r.rank, r.term, r.n,
      CAST(r.n AS DOUBLE) * 100.0 / CAST(t.n_total AS DOUBLE) AS pct
    FROM ranked r JOIN totals t ON r.lang = t.lang
    WHERE r.rank <= 5"""

  // ------------------------------------------------ train/val/test split
  /** q105's deterministic 80/10/10 split assignment as a pure
    * expression of the doc id — THE split function: q105 censuses it,
    * q238 applies it to near-dup pairs, and the streaming leakage
    * monitor (`CorpusStreaming.splitLeakageStream`) tags live LSH
    * candidates with it, so every tier agrees on membership. */
  def splitAssign(id: Column): Column = {
    val bucket = pmod(pmod(id, lit(1000000007L))
      * lit(2654435761L) + lit(5851L), lit(1000000007L)) % 100
    when(bucket < 80, "train").when(bucket < 90, "val")
      .otherwise("test")
  }

  /** Deterministic train/val/test assignment (80/10/10 by a seeded
    * doc-id hash) with the per-language census — the split must be a
    * PURE function of the document id so re-runs, other engines, and
    * incremental additions all agree on membership (a `rand()` split
    * reshuffles documents between train and test across runs: eval
    * contamination by nondeterminism).
    *
    * 100 TB design: per-row expression then one combined census
    * aggregate — the split column would be written into the corpus
    * partitioning (`partitionBy(split)`) by the same projection. */
  val q105SplitCensus: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("split", splitAssign(col("doc_id")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"))
  }
  val o105: String = """
    SELECT lang, split, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM (
      SELECT lang, n_chars,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT lang, n_chars,
          (((doc_id % 1000000007) * 2654435761 + 5851) % 1000000007)
            % 100 AS b
        FROM documents))
    GROUP BY lang, split"""

  // ------------------------------------------ split-leakage census
  /** Train/test leakage through NEAR-DUPLICATES: q105's deterministic
    * 80/10/10 split assignment applied to both sides of every q58
    * verified near-dup pair, censused per unordered split pair with a
    * leak flag — a near-dup pair straddling train and test means the
    * eval set effectively contains training text (the contamination
    * q89 checks against an EXTERNAL eval set; this is the
    * internal-split twin, and the reason dedup-THEN-split is the
    * canonical order). A curation pipeline gates on the cross-split
    * rows being zero after dedup.
    *
    * 100 TB design: rides q58's df-capped posting-list pairs (never
    * all-pairs); the split is per-row hash arithmetic; the census is
    * one map-side combined aggregate on a ≤6-row key domain. */
  val q238SplitLeakage: Q = (s, d) => {
    import s.implicits._
    DedupOps.q58JaccardPairs(s, d)
      .select(splitAssign($"doc_a").as("sa"),
        splitAssign($"doc_b").as("sb"))
      .select(least($"sa", $"sb").as("split_lo"),
        greatest($"sa", $"sb").as("split_hi"))
      .groupBy($"split_lo", $"split_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak",
        when($"split_lo" =!= $"split_hi", 1L).otherwise(0L))
  }
  val o238: String = s"""
    WITH jac AS (${DedupOps.o58}),
    m AS (
      SELECT
        CASE WHEN ba < 80 THEN 'train'
             WHEN ba < 90 THEN 'val' ELSE 'test' END AS sa,
        CASE WHEN bb < 80 THEN 'train'
             WHEN bb < 90 THEN 'val' ELSE 'test' END AS sb
      FROM (
        SELECT
          (((doc_a % 1000000007) * 2654435761 + 5851) % 1000000007)
            % 100 AS ba,
          (((doc_b % 1000000007) * 2654435761 + 5851) % 1000000007)
            % 100 AS bb
        FROM jac))
    SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
      COUNT(*) AS n_pairs,
      CAST(CASE WHEN least(sa, sb) <> greatest(sa, sb)
        THEN 1 ELSE 0 END AS BIGINT) AS is_leak
    FROM m GROUP BY 1, 2"""

  // --------------------------------------------- native top-k operator
  /** The custom two-phase TOP-K physical operator (`plans/TopKPlan`)
    * on the longest-documents-per-language ask: partial k-bounded
    * heaps before the shuffle (≤ partitions×groups×k rows cross the
    * wire), heap merge + k-element sort after — never a full partition
    * sort, unlike the `row_number` window spelling (q103/q104's shape).
    * Same DuckDB oracle as the window spelling, so the operator's
    * semantics are pinned row-for-row. */
  val q108TopKNative: Q = (s, d) =>
    graft.plans.TopK.perGroup(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Seq("lang"), Seq(("n_chars", true), ("doc_id", false)), 3)
  val o108: String = """
    SELECT doc_id, lang, n_chars, rank FROM (
      SELECT doc_id, lang, n_chars,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
      FROM documents)
    WHERE rank <= 3"""

  // ------------------------------------------------ BPE merge step
  /** One iteration of BPE tokenizer training: count every adjacent
    * symbol pair across the corpus (weighted by word frequency) and
    * emit the top-10 merge candidates — the inner loop of
    * byte-pair-encoding vocab construction (q106 estimates subword
    * COUNTS; this computes the actual merge table entry).
    *
    * 100 TB design: two-level combine — the word census collapses the
    * corpus to its VOCABULARY first (hot words merge map-side; vocab
    * is millions of rows where the corpus is billions), and the pair
    * explode then runs over distinct words only, weighted by the
    * census count. This is exactly how production BPE trainers scale:
    * never re-scan the corpus per merge, re-derive pairs from the
    * weighted vocab. The final top-10 window sorts the ~alphabet²
    * pair census, not corpus rows. */
  val q112BpeMerges: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(length(col("w")) >= 2)
    val pairs = words
      .select(col("n"), explode(expr(
        """transform(sequence(1, length(w) - 1),
             i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))"""))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n")).cast("long").as("freq"))
    // global window over the tiny pair census (≤ |alphabet|² rows),
    // never over corpus rows
    val w = Window.orderBy(col("freq").desc, col("pair").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("rank"), col("pair"), col("freq"))
  }
  val o112: String = """
    WITH wc AS (
      SELECT w, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair, n
      FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
            FROM wc WHERE length(w) >= 2)),
    pf AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS freq
           FROM pairs GROUP BY pair)
    SELECT rank, pair, freq FROM (
      SELECT CAST(row_number() OVER (ORDER BY freq DESC, pair ASC)
        AS BIGINT) AS rank, pair, freq
      FROM pf)
    WHERE rank <= 10"""

  // --------------------------------------- deletion-propagation audit
  /** Right-to-be-forgotten propagation audit: after a deletion batch
    * removes documents from the primary table, do DERIVED artifacts
    * (here the q99 chunk table, built before the deletion) still
    * carry the deleted documents' data? The audit anti-checks every
    * derived row against the post-deletion primary (a LEFT join +
    * null-flag — downstream cannot assume it knows the delete list)
    * and reports the orphan count and share: nonzero means the
    * deletion pipeline forgot a derived table, the finding a
    * compliance review must produce BEFORE a regulator does. The
    * deletion batch is planted (doc_id ≡ 0 mod 41) so orphans exist
    * deterministically at every SF.
    *
    * 100 TB design: derived rows join the primary on the 8-byte
    * doc_id only (chunk text never shuffles — it is dropped before
    * the join); ONE conditional aggregate reports the audit. */
  val q229DeletionAudit: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // derived table built BEFORE the deletion (chunk grain, q99's)
    val derived = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk_id",
        explode(expr(chunkIdsExpr)))
      .select(col("doc_id"))
    val remaining = docs.filter(col("doc_id") % 41 =!= 0)
      .select(col("doc_id"), lit(1L).as("present"))
    derived.join(remaining, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_derived_rows"),
        sum(when(col("present").isNull, 1L).otherwise(0L))
          .cast("long").as("n_orphan_rows"))
      .withColumn("orphan_share",
        col("n_orphan_rows").cast("double") / col("n_derived_rows"))
  }
  val o229: String = s"""
    WITH derived AS (
      SELECT doc_id
      FROM (SELECT doc_id,
              unnest($chunkIdsSql) AS chunk_id
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents))),
    remaining AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS present
      FROM documents WHERE doc_id % 41 <> 0)
    SELECT COUNT(*) AS n_derived_rows,
      CAST(SUM(CASE WHEN r.present IS NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS n_orphan_rows,
      CAST(SUM(CASE WHEN r.present IS NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*) AS orphan_share
    FROM derived de LEFT JOIN remaining r ON r.doc_id = de.doc_id"""

  // --------------------------------------------- filter ablation grid
  /** Filter-funnel ablation census: every combination of the three
    * standard quality gates (length ≥ 200 chars, stopword ratio
    * ≥ 0.04, distinct-token ratio ≥ 0.45) with its document count and
    * corpus share — the 2³ grid a curation review reads to see what
    * each gate UNIQUELY removes and how the gates correlate, before
    * committing to a filter stack (q51 scores one composite; this
    * shows the interaction structure).
    *
    * Float parity: each ratio is ONE integer-over-integer divide;
    * the share divides by a window total over the 8-row census.
    *
    * 100 TB design: per-row gate bits, ONE map-side-combined census
    * keyed on the 3-bit combination; the share window rides the
    * ≤ 8-row census, never documents. */
  val q224FilterFunnel: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .withColumn("stop_ratio", expr(
        s"CAST(size(filter(t, x -> x IN (${TextOps.StopList}))) AS DOUBLE) / size(t)"))
      .withColumn("uniq_ratio", expr(
        "CAST(size(array_distinct(t)) AS DOUBLE) / size(t)"))
      .select(
        when(col("n_chars") >= 200, 1L).otherwise(0L).as("gate_len"),
        when(col("stop_ratio") >= 0.04, 1L).otherwise(0L)
          .as("gate_stop"),
        when(col("uniq_ratio") >= 0.45, 1L).otherwise(0L)
          .as("gate_uniq"))
    base.groupBy(col("gate_len"), col("gate_stop"), col("gate_uniq"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("pct", col("n_docs").cast("double") * 100.0
        / sum(col("n_docs")).over(Window.partitionBy()))
  }
  val o224: String = s"""
    WITH gates AS (
      SELECT
        CAST(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT)
          AS gate_len,
        CAST(CASE WHEN CAST(len(list_filter(t,
              x -> x IN (${TextOps.StopList})))
            AS DOUBLE) / len(t) >= 0.04 THEN 1 ELSE 0 END AS BIGINT)
          AS gate_stop,
        CAST(CASE WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
            >= 0.45 THEN 1 ELSE 0 END AS BIGINT) AS gate_uniq
      FROM (SELECT n_chars, string_split(text, ' ') AS t
            FROM documents)),
    census AS (
      SELECT gate_len, gate_stop, gate_uniq, COUNT(*) AS n_docs
      FROM gates GROUP BY 1, 2, 3)
    SELECT gate_len, gate_stop, gate_uniq, n_docs,
      CAST(n_docs AS DOUBLE) * 100.0
        / CAST(SUM(n_docs) OVER () AS BIGINT) AS pct
    FROM census"""

  // --------------------------------------------- BPE trainer rounds
  /** THREE chained BPE merge rounds — the trainer LOOP, where q112 is
    * one lookahead: each round takes the weighted symbol vocabulary,
    * finds the most frequent adjacent symbol pair (deterministic
    * (freq desc, pair asc) tie-break), merges it LEFTMOST
    * NON-OVERLAPPING in every word ("aaa" + (a,a) → ["aa","a"]), and
    * re-derives pairs from the merged vocabulary. Emits one row per
    * round: the learned merge and its frequency — the head of the
    * merge table a real tokenizer trainer would keep extending.
    *
    * Engine split on purpose: Spark spells the leftmost merge as an
    * in-row `aggregate` fold over the symbol array; DuckDB v1.0's
    * `list_reduce` LOSES list-typed struct accumulator state (worse
    * than the o158 in-place quirk — appends vanish), so the oracle
    * spells the SAME greedy semantics relationally: candidate
    * positions → islands of consecutive candidates (q213's
    * gaps-and-islands) → keep ODD ranks within each island (greedy
    * leftmost = every other candidate in a run) → rebuild the array.
    * Same deterministic output either way, integer/string only.
    *
    * 100 TB design: the corpus collapses to the weighted vocab census
    * ONCE (q112's two-level combine); all three rounds run on the
    * vocabulary, never re-scanning the corpus, with each round's
    * argmax a single-row broadcast (intended NLJ — whitelisted).
    * This is exactly the production BPE-trainer layout. */
  /** Leftmost non-overlapping merge of the pair (mx, my) over the
    * `syms` array — the greedy BPE apply-one-merge step, as an in-row
    * fold. Expects columns syms / mx / my; QueriesSpec pins the
    * overlap case ("aaa" + (a,a) → [aa, a]). */
  private[graft] val bpeFoldExpr: String =
    """aggregate(syms,
         named_struct('out', CAST(array() AS ARRAY<STRING>),
                      'prev', CAST(NULL AS STRING)),
         (acc, s) -> named_struct(
           'out', CASE
             WHEN acc.prev = mx AND s = my
               THEN concat(acc.out, array(concat(mx, my)))
             WHEN acc.prev IS NOT NULL
               THEN concat(acc.out, array(acc.prev))
             ELSE acc.out END,
           'prev', CASE WHEN acc.prev = mx AND s = my
             THEN CAST(NULL AS STRING) ELSE s END))"""
  private[graft] val bpeFinishExpr: String =
    """CASE WHEN folded.prev IS NULL THEN folded.out
            ELSE concat(folded.out, array(folded.prev)) END"""

  /** Adjacent-symbol pair census (mx, my, n) over a weighted word
    * vocabulary — ONE codegen position-explode + element_at pass
    * (the zip_with-over-slices spelling it replaces ran interpreted
    * lambdas and struct allocs per symbol, per word, per round).
    * Emits the identical census. */
  private def bpePairCensus(words: DataFrame): DataFrame = words
    .select(col("cnt"), col("syms"),
      explode(expr("sequence(1, greatest(size(syms) - 1, 1))")).as("i"))
    .filter(col("i") + 1 <= size(col("syms")))
    .select(col("cnt"),
      element_at(col("syms"), col("i")).as("mx"),
      element_at(col("syms"), col("i") + 1).as("my"))
    .groupBy(col("mx"), col("my"))
    .agg(sum(col("cnt")).cast("long").as("n"))

  /** Apply one broadcast (mx, my) merge row to every word via the
    * native [[graft.functions.BpeMerge]] kernel (linear scan,
    * codegen) — replaces the interpreted [[bpeFoldExpr]] +
    * [[bpeFinishExpr]] pair, which rebuilt the accumulator array per
    * symbol (O(n²) copies per word per round). Same LEFT-on-TRUE
    * degenerate-corpus convention: a null merge row is the identity. */
  private def bpeApplyMerge(words: DataFrame, top: DataFrame,
      keep: Seq[String]): DataFrame = {
    val bridge = org.apache.spark.sql.GraftPlanBridge
    words
      .join(broadcast(top.select(col("mx"), col("my"))), lit(true), "left")
      .withColumn("syms", bridge.column(graft.functions.BpeMerge(
        bridge.expression(col("syms")), bridge.expression(col("mx")),
        bridge.expression(col("my")))))
      .select(keep.map(col): _*)
  }

  val q223BpeTrain3: Q = (s, d) => {
    import s.implicits._
    val words0 = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select($"cnt", $"syms")
      // checkpointed: each round's eager argmax action would otherwise
      // re-scan and re-tokenize the corpus (shuffle reuse does not
      // span jobs) — the census must collapse the corpus ONCE
      .localCheckpoint(eager = false)
    def mergeRound(words: DataFrame, r: Int): (DataFrame, DataFrame) = {
      val top = bpePairCensus(words)
        .orderBy($"n".desc, $"mx".asc, $"my".asc).limit(1)
        .select(lit(r.toLong).as("round"), $"mx", $"my", $"n")
        .localCheckpoint(eager = false) // single row; feeds the report AND the merge
      // LEFT join on TRUE (not crossJoin): a degenerate corpus whose
      // pair census is empty must leave the vocabulary UNCHANGED
      // (null mx never matches inside the merge), not empty it —
      // mirrored by the LEFT JOIN top$k ON TRUE in bpeRoundSql
      val merged = bpeApplyMerge(words, top, Seq("cnt", "syms"))
      (top, merged)
    }
    val (t1, w1) = mergeRound(words0, 1)
    val (t2, w2) = mergeRound(w1, 2)
    val (t3, _) = mergeRound(w2, 3)
    t1.unionByName(t2).unionByName(t3)
      .select($"round", $"mx", $"my",
        concat($"mx", $"my").as("merged"), $"n")
  }
  /** One DuckDB BPE round (k): pair census over words{k-1} → top
    * merge top$k → greedy-leftmost application via the islands
    * spelling (odd-rank island members merge; list_reduce is
    * unusable — DuckDB v1.0 silently loses list-typed struct
    * accumulator state) → words$k. Shared by o223 (the trainer
    * report) and o235 (the fertility census over the final state). */
  private def bpeRoundSql(k: Int): String = s"""
    pos$k AS MATERIALIZED (
      SELECT w, cnt, syms, len(syms) AS n,
        unnest(generate_series(1, len(syms))) AS pos
      FROM words${k - 1}),
    pc$k AS (
      SELECT syms[pos] AS mx, syms[pos + 1] AS my,
        CAST(SUM(cnt) AS BIGINT) AS n
      FROM pos$k WHERE pos < n GROUP BY 1, 2),
    top$k AS MATERIALIZED (
      SELECT CAST($k AS BIGINT) AS round, mx, my, n FROM pc$k
      ORDER BY n DESC, mx ASC, my ASC LIMIT 1),
    cand$k AS (
      SELECT p.w, p.pos
      FROM pos$k p CROSS JOIN top$k t
      WHERE p.pos < p.n AND p.syms[p.pos] = t.mx
        AND p.syms[p.pos + 1] = t.my),
    isl$k AS (
      SELECT w, pos,
        pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
      FROM cand$k),
    sel$k AS (
      SELECT w, pos FROM (
        SELECT w, pos, row_number() OVER (PARTITION BY w, grp
          ORDER BY pos) AS r
        FROM isl$k)
      WHERE r % 2 = 1),
    words$k AS MATERIALIZED (
      SELECT w, cnt, list(sym ORDER BY pos) AS syms FROM (
        SELECT p.w, p.cnt, p.pos,
          CASE WHEN s1.pos IS NOT NULL THEN t.mx || t.my
               ELSE p.syms[p.pos] END AS sym
        FROM pos$k p
        LEFT JOIN top$k t ON TRUE
        LEFT JOIN sel$k s1 ON s1.w = p.w AND s1.pos = p.pos
        LEFT JOIN sel$k s0 ON s0.w = p.w AND s0.pos = p.pos - 1
        WHERE s0.pos IS NULL)
      GROUP BY w, cnt)"""

  /** The shared words0 CTE (global word census as character arrays). */
  private val bpeWords0Sql: String = """
    words0 AS MATERIALIZED (
      SELECT w, COUNT(*) AS cnt,
        list_transform(generate_series(1, length(w)), i -> w[i]) AS syms
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w)"""

  val o223: String = s"""
    WITH $bpeWords0Sql,
    ${bpeRoundSql(1)},
    ${bpeRoundSql(2)},
    ${bpeRoundSql(3)}
    SELECT round, mx, my, mx || my AS merged, n FROM top1
    UNION ALL
    SELECT round, mx, my, mx || my AS merged, n FROM top2
    UNION ALL
    SELECT round, mx, my, mx || my AS merged, n FROM top3"""

  // --------------------------------------- tokenizer fertility audit
  /** Per-language tokenizer fertility under the LEARNED merges — the
    * APPLY half of the BPE loop (q112/q223 train; this measures what
    * the trained tokenizer does to each language): train the same 3
    * greedy merges as q223 on the global word census, apply them in
    * round order to every word, then census per language — words,
    * chars, post-merge tokens, fertility (tokens/word) and
    * compression (chars/token). Fertility INEQUALITY across languages
    * is the fairness number a multilingual pipeline reads before
    * fixing a token budget: a language at 1.8× fertility pays 1.8×
    * the context and compute per word.
    *
    * Float parity: all censuses are exact int64 sums; fertility and
    * compression are ONE IEEE divide each.
    *
    * 100 TB design: the corpus collapses to the (lang, word) census
    * once (map-side combined; checkpointed — it feeds the global
    * trainer AND the final census); training rides the q223 layout
    * (vocabulary-scale, never corpus rows; merge application is an
    * in-row fold against a single broadcast row per round); the
    * final join is census-to-census on the word key. */
  val q235BpeFertility: Q = (s, d) => {
    import s.implicits._
    val langw = Tables.documents(s, d)
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val words0 = langw.groupBy($"w")
      .agg(sum($"cnt").cast("long").as("cnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select($"w", $"cnt", $"syms")
      .localCheckpoint(eager = false)
    def round(words: DataFrame): DataFrame = {
      val top = bpePairCensus(words)
        .orderBy($"n".desc, $"mx".asc, $"my".asc).limit(1)
        .localCheckpoint(eager = false) // single row; broadcast into the merge
      // LEFT on TRUE: q223's degenerate-corpus convention — an empty
      // merge census must be a no-op, not empty the vocabulary
      bpeApplyMerge(words, top, Seq("w", "cnt", "syms"))
    }
    val w3 = round(round(round(words0)))
    langw
      .join(w3.select($"w", size($"syms").cast("long").as("n_syms")),
        Seq("w"))
      .groupBy($"lang")
      .agg(sum($"cnt").cast("long").as("n_words"),
        sum($"cnt" * length($"w")).cast("long").as("n_chars"),
        sum($"cnt" * $"n_syms").cast("long").as("n_tokens"))
      .withColumn("fertility",
        $"n_tokens".cast("double") / $"n_words".cast("double"))
      .withColumn("compression",
        $"n_chars".cast("double") / $"n_tokens".cast("double"))
  }
  val o235: String = s"""
    WITH $bpeWords0Sql,
    ${bpeRoundSql(1)},
    ${bpeRoundSql(2)},
    ${bpeRoundSql(3)},
    langw AS (
      SELECT lang, w, COUNT(*) AS cnt
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1, 2),
    sums AS (
      SELECT l.lang,
        CAST(SUM(l.cnt) AS BIGINT) AS n_words,
        CAST(SUM(l.cnt * length(l.w)) AS BIGINT) AS n_chars,
        CAST(SUM(l.cnt * len(w3.syms)) AS BIGINT) AS n_tokens
      FROM langw l JOIN words3 w3 ON w3.w = l.w
      GROUP BY 1)
    SELECT lang, n_words, n_chars, n_tokens,
      CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
      CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS compression
    FROM sums"""

  // ------------------------------------------------ sequence packing
  private val SeqBudget = 512

  /** Training-sequence packing census: q99's sliding-window chunks are
    * laid out per language in deterministic (doc_id, chunk_id) order,
    * and consecutive chunks are packed into fixed `SeqBudget`-token
    * training sequences by running-offset binning (a chunk belongs to
    * the sequence its START offset falls in — greedy packing with
    * boundary overflow, the standard pretraining layout). Emits the
    * per-sequence fill census a data loader validates before training.
    *
    * 100 TB design: one shuffle on `lang` for the running-sum window
    * (on a cluster the order key is the corpus shard sort order, so
    * packing is shard-local and shuffle-free); everything after the
    * cumsum is integer arithmetic and a map-side-combined census. */
  val q114PackSequences: Q = (s, d) => {
    val chunks = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk_id",
        explode(expr(chunkIdsExpr)))
      .select(col("doc_id"), col("lang"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(expr(s"slice(toks, chunk_id * $ChunkStride + 1, $ChunkSize)"))
          .cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("doc_id").asc, col("chunk_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum(col("n_tokens")).over(w).cast("long"))
      .withColumn("seq_id",
        expr(s"(cum - n_tokens) div $SeqBudget").cast("long"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
      .withColumn("fill_pct",
        col("n_tokens").cast("double") * 100.0 / SeqBudget)
  }
  val o114: String = s"""
    WITH chunks AS (
      SELECT doc_id, lang, CAST(chunk_id AS BIGINT) AS chunk_id,
        CAST(len(t[chunk_id * $ChunkStride + 1 :
                  chunk_id * $ChunkStride + $ChunkSize]) AS BIGINT)
          AS n_tokens
      FROM (
        SELECT doc_id, lang, t,
          unnest($chunkIdsSql)
            AS chunk_id
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
              FROM documents))),
    cums AS (
      SELECT lang, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY lang
          ORDER BY doc_id ASC, chunk_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM chunks)
    SELECT lang, CAST((cum - n_tokens) // $SeqBudget AS BIGINT) AS seq_id,
      COUNT(*) AS n_chunks,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(n_tokens) AS DOUBLE) * 100.0 / $SeqBudget AS fill_pct
    FROM cums GROUP BY 1, 2"""

  // ------------------------------------------------ Zipf tail census
  /** Vocabulary-tail profile per language: vocabulary size, hapax
    * legomena (tokens seen exactly once — the noise tail a tokenizer
    * vocab cut drops), and head coverage (share of all token
    * occurrences taken by the top-100 types — the Zipf head). q104
    * lists WHICH tokens dominate; this measures HOW MUCH head and tail
    * there is, the two numbers a vocab-size / min-frequency decision
    * reads.
    *
    * 100 TB design: the (lang, term) census map-side combines (hot
    * tokens collapse in the combiner), the rank window runs over the
    * per-language VOCAB census (not corpus rows), and the final
    * aggregate is four integer sums + divisions at the end. */
  val q115ZipfCensus: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("term").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_hapax"),
        sum(col("n")).cast("long").as("total_tokens"),
        sum(when(col("rank") <= 100, col("n")).otherwise(0L)).cast("long")
          .as("top100_tokens"))
      .withColumn("hapax_pct",
        col("n_hapax").cast("double") * 100.0
          / col("vocab_size").cast("double"))
      .withColumn("top100_coverage_pct",
        col("top100_tokens").cast("double") * 100.0
          / col("total_tokens").cast("double"))
  }
  val o115: String = """
    WITH c AS (
      SELECT lang, term, COUNT(*) AS n FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents)
      GROUP BY 1, 2),
    ranked AS (
      SELECT lang, n,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY n DESC, term ASC) AS BIGINT) AS rank
      FROM c)
    SELECT lang, COUNT(*) AS vocab_size,
      CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      CAST(SUM(n) AS BIGINT) AS total_tokens,
      CAST(SUM(CASE WHEN rank <= 100 THEN n ELSE 0 END) AS BIGINT)
        AS top100_tokens,
      CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
        / CAST(COUNT(*) AS DOUBLE) AS hapax_pct,
      CAST(SUM(CASE WHEN rank <= 100 THEN n ELSE 0 END) AS DOUBLE)
        * 100.0 / CAST(SUM(n) AS DOUBLE) AS top100_coverage_pct
    FROM ranked GROUP BY lang"""

  // --------------------------------------- quality-weighted sampling
  /** Importance sampling by quality: each document is kept with
    * probability proportional to its q51 quality score, decided by a
    * deterministic doc-id hash against ⌊quality·10⁴⌋ basis points —
    * the "sample good data more" curation primitive (q86 rates by
    * STRATUM; this rates by per-document SCORE), reproducible on any
    * engine and any partitioning. The census reports achieved vs
    * expected keep rates per language; expected is an exact integer
    * sum of the basis-point thresholds.
    *
    * 100 TB design: keep/threshold are pure per-row expressions (the
    * same projection writes the sampled corpus at scan parallelism);
    * the only shuffle is the tiny per-language census. */
  val q116QualitySample: Q = (s, d) => {
    val thresholdBp =
      floor(TextOps.qualityExpr * lit(10000.0)).cast("long")
    val h = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L)
      + lit(7919L), lit(1000000007L)) % 10000
    Tables.documents(s, d)
      .withColumn("threshold_bp", thresholdBp)
      .withColumn("keep",
        when(h < col("threshold_bp"), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_kept"),
        sum(col("threshold_bp")).cast("long").as("expected_bp"))
      .withColumn("kept_pct",
        col("n_kept").cast("double") * 100.0
          / col("n_docs").cast("double"))
      .withColumn("expected_pct",
        col("expected_bp").cast("double")
          / (col("n_docs").cast("double") * 100.0))
  }
  val o116: String = s"""
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(keep) AS BIGINT) AS n_kept,
      CAST(SUM(threshold_bp) AS BIGINT) AS expected_bp,
      CAST(SUM(keep) AS DOUBLE) * 100.0 / CAST(COUNT(*) AS DOUBLE)
        AS kept_pct,
      CAST(SUM(threshold_bp) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS expected_pct
    FROM (
      SELECT lang, threshold_bp,
        CASE WHEN ((doc_id % 1000000007) * 2654435761 + 7919)
                  % 1000000007 % 10000 < threshold_bp
             THEN 1 ELSE 0 END AS keep
      FROM (
        SELECT lang, doc_id,
          CAST(floor((${TextOps.qualitySql}) * 10000.0) AS BIGINT)
            AS threshold_bp
        FROM documents))
    GROUP BY lang"""

  // ------------------------------------------------ boilerplate census
  private val BoilerDf = 50

  /** Cross-document boilerplate detection (the CCNet/RefinedWeb
    * line-dedup shape on shingles): a token-3-gram held by more than
    * `BoilerDf` documents is corpus boilerplate (headers, footers,
    * templates); each document is scored by the fraction of its
    * distinct shingles that are boilerplate, with the keep flag a
    * curation pass would gate on. Complements q88 (WITHIN-doc
    * repetition) — this is the ACROSS-doc signal.
    *
    * 100 TB design: the shingle df census map-side combines (hot
    * shingles collapse in the combiner — the census never skews); the
    * boilerplate set (df > threshold) is a tiny tail of the census and
    * BROADCASTS into a map-side semi-join against the exploded corpus,
    * so the per-doc count is keyed on doc_id, which cannot skew. */
  val q118BoilerplateCensus: Q = (s, d) => {
    val sh = DedupOps.withShingles(Tables.documents(s, d))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(col("shs"))).as("sh"))
    val common = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > BoilerDf)
      .select(col("sh"))
    val perDoc = sh
      .join(broadcast(common.withColumn("is_common", lit(1L))),
        Seq("sh"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("is_common"), lit(0L))).cast("long")
          .as("n_boiler"))
    perDoc
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_shingles").cast("double"))
      .withColumn("keep",
        when(col("boiler_frac") <= 0.3, 1L).otherwise(0L))
  }
  val o118: String = s"""
    WITH sh0 AS (
      SELECT DISTINCT doc_id, source, unnest(shs) AS sh
      FROM (SELECT doc_id, source, ${DedupOps.shinglesSql} AS shs
            FROM (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents))),
    common AS (
      SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) > $BoilerDf),
    per_doc AS (
      SELECT s.doc_id, s.source, COUNT(*) AS n_shingles,
        CAST(SUM(CASE WHEN c.sh IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_boiler
      FROM sh0 s LEFT JOIN common c ON s.sh = c.sh
      GROUP BY s.doc_id, s.source)
    SELECT doc_id, source, n_shingles, n_boiler,
      CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE)
        AS boiler_frac,
      CASE WHEN CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE)
                <= 0.3 THEN 1 ELSE 0 END AS keep
    FROM per_doc"""

  // --------------------------------------------------- rarity score
  /** IDF-rarity quality signal: the mean inverse document frequency of
    * a document's distinct vocabulary — generic boilerplate scores
    * near 0 (every term is corpus-common), jargon-dense or exotic
    * documents score high; curation pipelines use it to up-weight
    * informative documents (q116's sampler is where such a score
    * plugs in). q85 ranks terms WITHIN a doc; this scores the DOC.
    *
    * Float parity: each 1/df is a single IEEE division (identical on
    * both engines), fixed-pointed to 1e15 by floor() — floor of an
    * identical double is engine-exact, unlike double→decimal casts
    * whose last-digit rounding mode differs between engines — and the
    * cross-row sum is then pure int64 (≤ 2e17 for million-term docs,
    * no overflow). The final mean is one division of those exact
    * integers.
    *
    * 100 TB design: the df census map-side combines; the join back is
    * keyed on the term (token id at petabyte scale); the per-doc
    * aggregate is keyed on doc_id, which cannot skew. */
  val q119RarityScore: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    val dfc = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tok.join(dfc, Seq("term"))
      .withColumn("inv_fp",
        floor((lit(1.0) / col("df").cast("double")) * lit(1.0e15))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("inv_fp")).cast("long").as("rarity_fp"))
      .withColumn("rarity",
        col("rarity_fp").cast("double")
          / (col("n_terms").cast("double") * lit(1.0e15)))
  }
  val o119: String = """
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    dfc AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term)
    SELECT doc_id, COUNT(*) AS n_terms,
      CAST(SUM(CAST(floor((CAST(1.0 AS DOUBLE) / CAST(df AS DOUBLE))
        * 1.0e15) AS BIGINT)) AS BIGINT) AS rarity_fp,
      CAST(SUM(CAST(floor((CAST(1.0 AS DOUBLE) / CAST(df AS DOUBLE))
        * 1.0e15) AS BIGINT)) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 1.0e15) AS rarity
    FROM tok JOIN dfc USING (term)
    GROUP BY doc_id"""

  // ---------------------------------------------- survivor election
  /** Dedup APPLY step: q83 says WHO clusters together; this elects
    * WHAT SURVIVES. Per near-dup cluster (SimHash CC labels) the
    * highest-quality member (q51's quality signal; doc_id as the
    * deterministic tiebreak) becomes the canonical survivor, and every
    * clustered doc gets a verdict row (canonical_id, is_survivor) —
    * the mapping a curation pipeline left-joins onto the corpus to
    * actually drop near-duplicates while keeping the best copy.
    *
    * 100 TB design: CC labels shuffle only (doc_id, comp) longs;
    * quality is an in-row expression joined on doc_id (cannot skew);
    * the election is a per-cluster AGGREGATE (count + struct-max:
    * highest quality, doc_id-asc tiebreak via negated id) joined back
    * on cluster_id — partial-combinable, so a boilerplate cluster
    * holding 10⁸ members map-side combines instead of buffering one
    * 10⁸-row window partition (the round-8 rehearsal showed clusters
    * ARE corpus-scale in the boilerplate regime — 34% of docs on one
    * signature — so a cluster-partitioned window is a skew hazard,
    * not a bounded one). */
  val q121SurvivorElection: Q = (s, d) => {
    // cluster-grain edges — identical components in linear volume;
    // the all-pairs oracle independently witnesses the equivalence
    val labels = connectedComponents(DedupOps.q60ClusterEdges(s, d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val qual = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.qualityExpr.as("quality"))
    val members = labels.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(qual, Seq("doc_id"))
    // struct max = lexicographic (quality, −doc_id): max quality,
    // smallest doc_id on ties — the window's (quality desc, doc_id
    // asc) first(), as one partial-aggregable max
    val elect = members.groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("long").as("cluster_size"),
        max(struct(col("quality"), (-col("doc_id")).as("neg_id")))
          .as("w"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("w.neg_id")).as("canonical_id"))
    members.join(elect, Seq("cluster_id"))
      .withColumn("is_survivor",
        when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality"), col("canonical_id"), col("is_survivor"))
  }
  val o121: String = s"""
    WITH RECURSIVE pairs AS MATERIALIZED (${DedupOps.o60}),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT reach.doc_id, e.dst FROM reach JOIN e ON e.src = reach.r),
    comp AS MATERIALIZED (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    qual AS MATERIALIZED (SELECT doc_id, ${TextOps.qualitySql} AS quality
             FROM documents)
    SELECT c.doc_id, c.cluster_id,
      CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
        AS cluster_size,
      qual.quality,
      first_value(c.doc_id) OVER (PARTITION BY c.cluster_id
        ORDER BY qual.quality DESC, c.doc_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS canonical_id,
      CAST(CASE WHEN c.doc_id = first_value(c.doc_id)
        OVER (PARTITION BY c.cluster_id
          ORDER BY qual.quality DESC, c.doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        THEN 1 ELSE 0 END AS BIGINT) AS is_survivor
    FROM comp c JOIN qual USING (doc_id)"""

  // ---------------------------------------------- chunk-level dedup
  /** Chunk-level dedup census — the paragraph-dedup analog (FineWeb
    * drops duplicated LINES across the corpus; here the unit is q99's
    * 50-token sliding chunk). Reports, per document, how many of its
    * chunks also occur elsewhere — documents assembled from widely
    * repeated passages score high even when no WHOLE-document near-dup
    * fires (q58/q60 are blind to single recycled paragraphs).
    *
    * 100 TB design: chunks are keyed by their 8-byte fingerprint, so
    * the one exchange shuffles (doc_id, cfp) longs — never chunk text
    * — and the occurrence census is a window over that key (hot
    * boilerplate chunks make linear-sized partitions, not join
    * blowups). The per-doc verdict is a map-side-combined aggregate on
    * doc_id. */
  val q122ChunkDedup: Q = (s, d) => {
    val chunks = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk_id",
        explode(expr(chunkIdsExpr)))
      .select(col("doc_id"),
        TextOps.fingerprintOf(array_join(
          expr(s"slice(toks, chunk_id * $ChunkStride + 1, $ChunkSize)"),
          " ")).as("cfp"))
    chunks
      .withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy(col("cfp"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("n_occ") > 1L, 1L).otherwise(0L)).cast("long")
          .as("n_dup_chunks"))
      .withColumn("dup_frac",
        col("n_dup_chunks").cast("double")
          / col("n_chunks").cast("double"))
  }
  val o122: String = s"""
    WITH ch AS (
      SELECT doc_id,
        array_to_string(t[chunk_id * $ChunkStride + 1 :
                          chunk_id * $ChunkStride + $ChunkSize], ' ')
          AS ctext
      FROM (SELECT doc_id, t,
              unnest($chunkIdsSql)
                AS chunk_id
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents))),
    fps AS (SELECT doc_id, ${TextOps.fingerprintSqlOf("ctext")} AS cfp
            FROM ch),
    wc AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY cfp) AS n_occ
           FROM fps)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dup_chunks,
      CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM wc GROUP BY doc_id"""

  // ------------------------------------- cross-source contamination
  /** Cross-source contamination matrix: q58's verified Jaccard pairs
    * joined to each member's `source`, censused by the UNORDERED
    * source pair — the diagonal is within-feed duplication, the
    * off-diagonal is the "mirror site" signal that tells an ingest
    * pipeline which two feeds are republishing each other (and which
    * one to de-prioritize at crawl time).
    *
    * Float parity: mean Jaccard goes through the fixed-point cookbook
    * — each pair's jaccard is one IEEE division (identical on both
    * engines), floor(x*1e15) is engine-exact, and the cross-row sum is
    * pure int64.
    *
    * 100 TB design: the pairs side is the bounded near-dup output
    * (verified candidates, not rows); both enrichment joins are keyed
    * on doc_id, and the final census map-side combines on a
    * sources²-bounded key. */
  val q123SourceContamination: Q = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    DedupOps.q58JaccardPairs(s, d)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"),
        floor(col("jaccard") * lit(1.0e15)).cast("long").as("jfp"))
      .groupBy(col("source_lo"), col("source_hi"))
      // sum the 1e15 fixed point in decimal(38,0): the int64 spelling
      // overflows once one source-pair group holds >~9.2k near-dup
      // pairs (q255's ×64 rehearsal failure — same class). Both
      // engines round the same exact decimal to the same double.
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("jfp").cast("decimal(38,0)")).cast("double")
          .as("jaccard_fp"))
      .withColumn("mean_jaccard",
        col("jaccard_fp")
          / (col("n_pairs").cast("double") * lit(1.0e15)))
  }
  val o123: String = s"""
    WITH jac AS (${DedupOps.o58}),
    src AS (SELECT doc_id, source FROM documents),
    m AS (
      SELECT least(a.source, b.source) AS source_lo,
             greatest(a.source, b.source) AS source_hi,
             CAST(floor(j.jaccard * 1.0e15) AS BIGINT) AS jfp
      FROM jac j JOIN src a ON a.doc_id = j.doc_a
                 JOIN src b ON b.doc_id = j.doc_b)
    SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
      CAST(SUM(CAST(jfp AS DECIMAL(38,0))) AS DOUBLE) AS jaccard_fp,
      CAST(SUM(CAST(jfp AS DECIMAL(38,0))) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 1.0e15) AS mean_jaccard
    FROM m GROUP BY 1, 2"""

  // ------------------------------------------------ token-budget cut
  /** Token budget for [[q125TokenBudget]] — fixed so the oracle SQL is
    * scale-independent; selects a few hundred docs at every test SF. */
  private val TokenBudget = 15000L

  /** Token-budget curation: greedily admit documents in quality order
    * (q51's signal; doc_id tiebreak) until the running token total
    * reaches the budget — "give me the best N-token corpus" is the
    * final step of every data-mixture build.
    *
    * 100 TB design: the naive spelling is ONE GLOBAL ordered cumsum —
    * a single-partition window that cannot scale (it is exactly what
    * the oracle runs). This implementation computes the same result
    * with a two-level cumulative sum: (1) a quality-bucket histogram
    * (≤1001 rows: the fixed-point quality's top 3 digits) whose tiny
    * descending cumsum yields each bucket's token offset, and (2)
    * per-BUCKET doc-order windows, shifted by the broadcast offsets —
    * the classic distributed prefix-sum layout, no global sort, no
    * single-partition shuffle of corpus rows. Quality ordering uses
    * floor(q*1e15) fixed-point on BOTH engines so the order (and thus
    * the cut) is engine-exact. */
  val q125TokenBudget: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        floor(TextOps.qualityExpr * lit(1.0e15)).cast("long").as("qfp"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("qfp div 1000000000000"))
    val offsets = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("cum_through",
        sum(col("btoks")).over(Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"),
        (col("cum_through") - col("btoks")).as("offset"))
    val wdoc = Window.partitionBy(col("bucket"))
      .orderBy(col("qfp").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens",
        (col("offset") + sum(col("n_tokens")).over(wdoc)).cast("long"))
      .filter(col("cum_tokens") <= TokenBudget)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }
  val o125: String = s"""
    WITH b AS (
      SELECT doc_id,
        CAST(floor((${TextOps.qualitySql}) * 1.0e15) AS BIGINT) AS qfp,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
        SUM(n_tokens) OVER (ORDER BY qfp DESC, doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM b)
    SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= $TokenBudget"""

  // ------------------------------------------------ bigram fluency
  /** Bigram-fluency scoring: per document, the mean corpus conditional
    * probability P(w₂|w₁) over its bigrams — word-salad text strings
    * together rare transitions and scores near 0, formulaic boilerplate
    * near 1. The bigram twin of q119's unigram rarity, and the
    * log-free spelling of an LM perplexity filter (each P is ONE IEEE
    * division, fixed-pointed — no cross-engine `ln` drift to manage).
    *
    * 100 TB design: conditional probabilities attach census-to-census
    * first (bigram census ⋈ first-word census, both vocabulary-sized
    * and map-side combined), so corpus occurrences take exactly ONE
    * keyed join on (w1, w2) — the hot-bigram key produces linear
    * rows, never a census re-aggregation per occurrence. */
  val q134BigramFluency: Q = (s, d) => {
    val occ = Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, greatest(size(t) - 1, 1))")).as("i"))
      .filter(col("i") + 1 <= size(col("t")))
      .select(col("doc_id"), element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))
    val bigrams = occ.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val firsts = bigrams.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"))
    val probs = bigrams.join(firsts, Seq("w1"))
      .withColumn("p_fp",
        floor((col("c2").cast("double") / col("c1").cast("double"))
          * lit(1.0e15)).cast("long"))
      .select(col("w1"), col("w2"), col("p_fp"))
    occ.join(probs, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_fp")).cast("long").as("fluency_fp"))
      .withColumn("fluency",
        col("fluency_fp").cast("double")
          / (col("n_bigrams").cast("double") * lit(1.0e15)))
  }
  val o134: String = """
    WITH occ AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t,
              unnest(generate_series(1, len(t) - 1)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents))),
    bigrams AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY 1, 2),
    firsts AS (SELECT w1, SUM(c2) AS c1 FROM bigrams GROUP BY 1),
    probs AS (
      SELECT w1, w2,
        CAST(floor((CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1.0e15)
          AS BIGINT) AS p_fp
      FROM bigrams JOIN firsts USING (w1))
    SELECT doc_id, COUNT(*) AS n_bigrams,
      CAST(SUM(p_fp) AS BIGINT) AS fluency_fp,
      CAST(SUM(p_fp) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 1.0e15) AS fluency
    FROM occ JOIN probs USING (w1, w2)
    GROUP BY doc_id"""

  // ------------------------------------------------ dup-degree census
  /** Near-dup graph degree histogram: how many docs have exactly k
    * verified SimHash near-duplicates — the shape check before
    * clustering (a fat tail means boilerplate is stitching unrelated
    * docs together and the banding threshold needs tightening; q118
    * is the cure). Composes q60's verified pairs; zero-degree docs
    * are the complement of the histogram's mass vs the corpus count.
    *
    * 100 TB design: the degree census is keyed on doc_id over the
    * bounded verified-pair set; the histogram is degree-bounded. */
  val q143DupDegree: Q = (s, d) => {
    val pairs = DedupOps.q60SimHashPairs(s, d)
    pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_docs"))
  }
  val o143: String = s"""
    WITH pairs AS (${DedupOps.o60}),
    deg AS (
      SELECT doc_id, COUNT(*) AS degree FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL
        SELECT doc_b AS doc_id FROM pairs)
      GROUP BY doc_id)
    SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY degree"""

  // ------------------------------------------ quality-dup calibration
  /** Quality-vs-duplication calibration: per fixed-point quality
    * bucket (floor(q·10)), what fraction of documents have a verified
    * near-duplicate — the audit that tells a curation pipeline whether
    * its quality gate ALSO reduces duplication (it usually does:
    * boilerplate is both low-quality and heavily duplicated) or the
    * two filters are independent and both needed.
    *
    * 100 TB design: the dup-doc set is the bounded verified-pair
    * output (distinct doc ids, broadcast); quality is in-row; the
    * bucket census is 11-row bounded. */
  val q145QualityDupCalibration: Q = (s, d) => {
    // per-doc incidence only — the cluster-grain edge form carries
    // the same "has a verified near-dup" node set as the all-pairs
    // census (every member of an m≥2 group is on its star; a
    // verified singleton is on its rep cross edge) in linear volume;
    // the all-pairs oracle independently witnesses it
    val pairs = DedupOps.q60ClusterEdges(s, d)
    val dupDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .withColumn("has_dup", lit(1L))
    Tables.documents(s, d)
      .select(col("doc_id"),
        floor(TextOps.qualityExpr * lit(10.0)).cast("long").as("q_bucket"))
      .join(broadcast(dupDocs), Seq("doc_id"), "left")
      .groupBy(col("q_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("has_dup"), lit(0L))).cast("long")
          .as("n_with_dup"))
      .withColumn("dup_pct",
        col("n_with_dup").cast("double") * 100.0
          / col("n_docs").cast("double"))
  }
  val o145: String = s"""
    WITH pairs AS (${DedupOps.o60}),
    dup_docs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL
        SELECT doc_b AS doc_id FROM pairs)),
    scored AS (
      SELECT doc_id,
        CAST(floor((${TextOps.qualitySql}) * 10.0) AS BIGINT)
          AS q_bucket
      FROM documents)
    SELECT s.q_bucket, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS n_with_dup,
      CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        AS DOUBLE) * 100.0 / CAST(COUNT(*) AS DOUBLE) AS dup_pct
    FROM scored s LEFT JOIN dup_docs d USING (doc_id)
    GROUP BY s.q_bucket"""

  // ---------------------------------------------- method agreement
  /** Near-dup METHOD AGREEMENT census: how many verified pairs the
    * shingle-Jaccard (q58) and SimHash (q60) detectors share, and how
    * many each finds alone — the evidence behind q98's union-of-
    * signals design (if one signal found everything, the union would
    * be waste; if they barely overlap, single-signal dedup has a
    * blind spot).
    *
    * 100 TB design: a full outer join of two BOUNDED verified-pair
    * sets on the (doc_a, doc_b) key; the census is 3 rows. Both
    * candidate generations derive from ONE scan+tokenize of the
    * corpus ([[DedupOps.sharedTextSignals]]), like q98's. */
  val q147MethodAgreement: Q = (s, d) => {
    val shared = DedupOps.sharedTextSignals(s, d)
    val jac = DedupOps.jaccardFrom(shared)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_jac"))
    val sim = DedupOps.simhashPairsFrom(DedupOps.simhashFrom(shared))
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_sim"))
    jac.join(sim, Seq("doc_a", "doc_b"), "full_outer")
      .withColumn("verdict",
        when(col("in_jac").isNotNull && col("in_sim").isNotNull, "both")
          .when(col("in_jac").isNotNull, "jaccard_only")
          .otherwise("simhash_only"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_pairs"))
  }
  val o147: String = s"""
    WITH jac AS (${DedupOps.o58}),
    sim AS (${DedupOps.o60}),
    m AS (
      SELECT CASE
          WHEN j.doc_a IS NOT NULL AND s.doc_a IS NOT NULL THEN 'both'
          WHEN j.doc_a IS NOT NULL THEN 'jaccard_only'
          ELSE 'simhash_only' END AS verdict
      FROM jac j FULL OUTER JOIN sim s
        ON j.doc_a = s.doc_a AND j.doc_b = s.doc_b)
    SELECT verdict, COUNT(*) AS n_pairs FROM m GROUP BY verdict"""

  // ------------------------------------------------- novelty curve
  /** Ingestion novelty-decay curve: per 100-doc intake batch (doc_id
    * as arrival order), how many documents are content-novel (their
    * fingerprint's FIRST occurrence) and the cumulative novelty rate —
    * the curve a crawler team watches flatten as a source exhausts
    * (all-dup batches = a stuck crawler; q87/q109 are the dedup that
    * acts on it, this is the monitoring).
    *
    * 100 TB design: first-occurrence is a min-per-fingerprint census
    * (8-byte keys, map-side combined) joined back on doc_id. The
    * cumulative rides the q125 two-level prefix-sum layout: the batch
    * census (N/100 rows — still corpus-scale ÷100, NOT bounded)
    * collapses to a ÷1024 super-batch census whose tiny ordered
    * cumsum yields each super-batch's (docs, novel) offsets; the
    * per-batch windows are then PARTITIONED by super-batch and
    * shifted by the broadcast offsets — no batch-census-scale frame
    * ever crosses a single-partition sort (each further 1000× of
    * corpus adds one more ÷1024 level; two suffice past 10¹¹ docs). */
  val q149NoveltyCurve: Q = (s, d) => {
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprintCol.as("fp"))
    val firstSeen = fp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("first_doc"))
    val flagged = fp.join(firstSeen, Seq("fp"))
      .withColumn("novel",
        when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
      .withColumn("batch", expr("doc_id div 100"))
    val census = flagged.groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("novel")).cast("long").as("n_novel"))
      .withColumn("sup", expr("batch div 1024"))
    val offsets = census.groupBy(col("sup"))
      .agg(sum(col("n_docs")).as("sd"), sum(col("n_novel")).as("sn"))
      .withColumn("doc_off",
        (sum(col("sd")).over(Window.orderBy(col("sup").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("sd")).cast("long"))
      .withColumn("novel_off",
        (sum(col("sn")).over(Window.orderBy(col("sup").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("sn")).cast("long"))
      .select(col("sup"), col("doc_off"), col("novel_off"))
    val wb = Window.partitionBy(col("sup")).orderBy(col("batch").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census.join(broadcast(offsets), Seq("sup"))
      .withColumn("cum_docs",
        (col("doc_off") + sum(col("n_docs")).over(wb)).cast("long"))
      .withColumn("cum_novel",
        (col("novel_off") + sum(col("n_novel")).over(wb)).cast("long"))
      .withColumn("cum_novelty_pct",
        col("cum_novel").cast("double") * 100.0
          / col("cum_docs").cast("double"))
      .select(col("batch"), col("n_docs"), col("n_novel"),
        col("cum_docs"), col("cum_novel"), col("cum_novelty_pct"))
  }
  val o149: String = s"""
    WITH fp AS (
      SELECT doc_id, ${TextOps.fingerprintSql} AS fp FROM documents),
    first_seen AS (
      SELECT fp, MIN(doc_id) AS first_doc FROM fp GROUP BY fp),
    flagged AS (
      SELECT f.doc_id // 100 AS batch,
        CASE WHEN f.doc_id = s.first_doc THEN 1 ELSE 0 END AS novel
      FROM fp f JOIN first_seen s USING (fp)),
    census AS (
      SELECT batch, COUNT(*) AS n_docs,
        CAST(SUM(novel) AS BIGINT) AS n_novel
      FROM flagged GROUP BY batch)
    SELECT batch, n_docs, n_novel,
      CAST(SUM(n_docs) OVER (ORDER BY batch ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_docs,
      CAST(SUM(n_novel) OVER (ORDER BY batch ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_novel,
      CAST(SUM(n_novel) OVER (ORDER BY batch ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        * 100.0
        / CAST(SUM(n_docs) OVER (ORDER BY batch ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS cum_novelty_pct
    FROM census"""

  // ------------------------------------------------ correlation audit
  /** Feature-correlation audit: exact Pearson r between token count
    * and q51 quality per language — the redundancy check before both
    * columns feed a model or a filter cascade (|r| near 1 means one
    * signal is a rescaled copy of the other; the length term inside
    * q51 makes some correlation expected, and this measures how
    * much).
    *
    * Float parity: the five cross-row moments accumulate as EXACT
    * decimal(38,0) integer sums (quality fixed-pointed to 1e6; all
    * per-row products fit int64); each exact sum casts to double —
    * correctly rounded identically on both engines — and r is then
    * ONE identical IEEE expression. Zero-variance groups yield null,
    * not NaN. */
  val q154CorrAudit: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("x"),
        floor(TextOps.qualityExpr * lit(1.0e6)).cast("long").as("y"))
    val m = base.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double")
          .as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
          .as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double")
          .as("syy"))
    m.withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("corr",
        when(col("vx") > 0.0 && col("vy") > 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("vx")) * sqrt(col("vy")))))
      .select(col("lang"), col("n").cast("long").as("n_docs"),
        col("corr"))
  }
  val o154: String = s"""
    WITH base AS (
      SELECT lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        CAST(floor((${TextOps.qualitySql}) * 1.0e6) AS BIGINT) AS y
      FROM documents),
    m AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM base GROUP BY lang)
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
      CASE WHEN n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
        THEN (n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      END AS corr
    FROM m"""

  // ---------------------------------------- sequence packing audit
  /** Context-window size for the packing audits — fixed so the oracle
    * is scale-independent; small enough that sf0.001 docs (~56
    * tokens) still straddle boundaries non-vacuously. */
  private val PackWindow = 64L

  /** Global token offset of every document under concat-in-id-order
    * packing — the layout GPT-style training prep uses (concatenate
    * the corpus, split into fixed windows). The offset is a
    * corpus-scale prefix sum, so it rides the q125/q149 two-level
    * layout: a ÷1024 doc-id-bucket census whose tiny ordered cumsum
    * yields bucket offsets, then per-bucket ordered windows shifted
    * by the broadcast offsets — no unpartitioned window ever holds
    * doc rows (one more ÷1024 level per further 1000× of corpus). */
  private def packedOffsets(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("bkt", expr("doc_id div 1024"))
    val bktOff = toks.groupBy(col("bkt"))
      .agg(sum(col("n")).as("bn"))
      .withColumn("off0",
        (sum(col("bn")).over(Window.orderBy(col("bkt").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("bn")).cast("long"))
      .select(col("bkt"), col("off0"))
    val wprev = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(bktOff), Seq("bkt"))
      .withColumn("off",
        (col("off0") + coalesce(sum(col("n")).over(wprev), lit(0L)))
          .cast("long"))
      .select(col("doc_id"), col("n"), col("off"))
  }
  /** DuckDB twin — the naive single global cumsum (exactly what the
    * two-level layout must reproduce); CTE `offs(doc_id, n, off)`. */
  private val packedOffsetsSql: String = """
    offs AS (
      SELECT doc_id, n,
        CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off
      FROM (SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents))"""

  /** Sequence-packing span census: under concat-and-split packing
    * into [[PackWindow]]-token context windows, how many documents
    * land fully inside one window vs straddle 2, 3, … windows — the
    * attention-contamination census (a straddling document is split
    * mid-text across training sequences; its head and tail attend to
    * unrelated neighbors). The span histogram is what a prep pipeline
    * reads when choosing window size vs document-boundary packing
    * (and the motivation for q99's overlap chunking). Output is
    * bounded: spans ≤ ⌈max doc len / W⌉ + 1 classes.
    *
    * 100 TB design: offsets via [[packedOffsets]]' two-level prefix
    * sum; everything after is per-row arithmetic plus one map-side
    * combined census on the tiny span key. */
  val q233PackingSpans: Q = (s, d) => {
    packedOffsets(s, d)
      .filter(col("n") > 0)
      .withColumn("span",
        (expr(s"(off + n - 1) div $PackWindow")
          - expr(s"off div $PackWindow") + 1L).cast("long"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).cast("long").as("n_tokens"))
  }
  val o233: String = s"""
    WITH $packedOffsetsSql
    SELECT (off + n - 1) // $PackWindow - off // $PackWindow + 1
        AS span,
      COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM offs WHERE n > 0 GROUP BY 1"""

  /** Context-window occupancy histogram: per packed window, how many
    * documents START in it, reported as a histogram (n_starts →
    * n_windows) including the CONTINUATION-ONLY windows (zero starts
    * — wholly inside one long document). High-start windows are
    * many-tiny-docs sequences (attention crosses many boundaries);
    * zero-start windows are long-document interiors; the histogram's
    * shape is the packing-quality summary at any corpus size.
    *
    * 100 TB design: same two-level offsets; the start census is one
    * map-side combined aggregate on window ids (8-byte keys), the
    * histogram a second on the tiny start-count key; the zero-start
    * row is total windows (a one-row scalar from the token total)
    * minus windows-with-starts — no per-window materialization of
    * empty windows. */
  val q234WindowOccupancy: Q = (s, d) => {
    val offs = packedOffsets(s, d).filter(col("n") > 0)
      .localCheckpoint(eager = false) // feeds the start census AND the totals row
    val starts = offs
      .withColumn("wid", expr(s"off div $PackWindow"))
      .groupBy(col("wid"))
      .agg(count(lit(1)).as("n_starts"))
    val hist = starts.groupBy(col("n_starts"))
      .agg(count(lit(1)).cast("long").as("n_windows"))
    val zero = offs
      .agg(expr(s"(sum(n) + ${PackWindow - 1}) div $PackWindow")
        .as("total_w"))
      .crossJoin(broadcast(
        starts.agg(count(lit(1)).as("with_starts"))))
      .select(lit(0L).as("n_starts"),
        (col("total_w") - col("with_starts")).cast("long")
          .as("n_windows"))
      .filter(col("n_windows") > 0)
    hist.unionByName(zero)
  }
  val o234: String = s"""
    WITH $packedOffsetsSql,
    offs2 AS (SELECT * FROM offs WHERE n > 0),
    starts AS (
      SELECT off // $PackWindow AS wid, COUNT(*) AS n_starts
      FROM offs2 GROUP BY 1),
    hist AS (
      SELECT n_starts, CAST(COUNT(*) AS BIGINT) AS n_windows
      FROM starts GROUP BY 1),
    zero AS (
      SELECT CAST(0 AS BIGINT) AS n_starts,
        CAST((SELECT (SUM(n) + ${PackWindow - 1}) // $PackWindow
              FROM offs2)
          - (SELECT COUNT(*) FROM starts) AS BIGINT) AS n_windows)
    SELECT * FROM hist
    UNION ALL
    SELECT * FROM zero WHERE n_windows > 0"""

  // ------------------------------------- stupid-backoff LM scoring
  /** Trigram stupid-backoff LM scoring (the KenLM-shaped fluency
    * filter, Brants et al. 2007): a trigram/bigram/unigram census is
    * trained on q105's TRAIN split only, then every document (all
    * three splits) is scored per trigram position with
    * S(w3|w1,w2) = c123/c12, backing off to 0.4·(c23/c2), then to
    * 0.4²·(c3/T), else 0 — held-out val/test docs genuinely exercise
    * the backoff tiers (training and scoring on the same corpus would
    * make the backoff unreachable). Emits per doc the tier census
    * (hits, bigram/unigram backoffs, OOV) and the mean score — q134's
    * bigram fluency is the single-tier special case; the tier ladder
    * is the new semantics. Scores are per-trigram fixed-pointed
    * (floor ×1e15, each a chain of exact-count IEEE ops in pinned
    * order) so the per-doc sums are exact int64.
    *
    * 100 TB design: all backoff resolution happens at VOCABULARY
    * grain — the distinct-trigram census (with its bigram/unigram
    * lookups, each census map-side combined) is scored once, and the
    * occurrence stream then takes exactly ONE keyed join against the
    * scored trigram table (the q134 move, lifted to the ladder). No
    * global windows; the train total is a broadcast single row. */
  /** Word-trigram derivation over a token array `t`, via zip_with
    * over shifted slices — the repo's length-0-safe n-gram spelling
    * (`sequence(1, size-k)` flips DESCENDING when size < k+1, where
    * slice just returns empty). Shared by q240 (LM training/scoring)
    * and q252 (trigram-type vocabulary growth). */
  private[graft] val TriExpr: String =
    """zip_with(
         zip_with(slice(t, 1, greatest(size(t) - 2, 0)),
                  slice(t, 2, greatest(size(t) - 2, 0)),
                  (a, b) -> named_struct('w1', a, 'w2', b)),
         slice(t, 3, greatest(size(t) - 2, 0)),
         (p, c) -> named_struct('w1', p.w1, 'w2', p.w2, 'w3', c))"""

  val q240BackoffLm: Q = (s, d) => {
    // ONE scan + tokenize of the corpus feeds every gram pass below
    // (the before-plan re-scanned and re-tokenized documents SEVEN
    // times: tri + bi×2 + uni×2 as join build sides, occ×2) — at
    // 100 TB that is seven corpus passes for one trained model.
    val toks = Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .withColumn("split", splitAssign(col("doc_id")))
      .select(col("doc_id"), col("split"), col("t"))
      // lazy: first consuming job persists it — one materialization,
      // no dedicated job (round-12 gate-chain fold)
      .localCheckpoint(eager = false)
    // n-gram streams via position explode + element_at PROJECTED
    // ACROSS the Generate boundary — whole-stage-codegen end to end,
    // no interpreted zip_with lambdas, no per-element struct allocs,
    // no slice copies (the old TriExpr spelling measured ~100 µs per
    // token here; this one is array indexing). The guard: sequence()
    // counts DOWN when its end < start, so pin the end to ≥ 1 and
    // drop the spurious position row for short docs with the i-filter
    // (emits the identical row multiset as the zip_with spelling).
    def grams(df: DataFrame, n: Int): DataFrame = n match {
      case 1 => df.select(explode(col("t")).as("w1"))
      case 2 => df
        .select(col("t"), explode(expr(
          "sequence(1, greatest(size(t) - 1, 1))")).as("i"))
        .filter(col("i") + 1 <= size(col("t")))
        .select(element_at(col("t"), col("i")).as("w1"),
          element_at(col("t"), col("i") + 1).as("w2"))
      case _ => df
        .select(df.columns.map(col) :+ explode(expr(
          "sequence(1, greatest(size(t) - 2, 1))")).as("i"): _*)
        .filter(col("i") + 2 <= size(col("t")))
        .select(df.columns.filter(_ != "t").map(col)
          :+ element_at(col("t"), col("i")).as("w1")
          :+ element_at(col("t"), col("i") + 1).as("w2")
          :+ element_at(col("t"), col("i") + 2).as("w3"): _*)
    }
    val train = toks.filter(col("split") === "train")
    // bi and uni are each referenced by TWO backoff joins below —
    // materialize once; tri has a single consumer, so it stays lazy
    // (a checkpoint there is a pure extra job)
    val tri = grams(train, 3).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
    val bi = grams(train, 2).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12")).localCheckpoint(eager = false)
    val uni = grams(train, 1).groupBy(col("w1"))
      .agg(count(lit(1)).as("c1")).localCheckpoint(eager = false)
    val total = uni.agg(sum(col("c1")).cast("long").as("t_tokens"))
    // occurrence stream (all splits), and its DISTINCT trigram census —
    // the only frame the backoff-resolution joins ever touch; derived
    // twice from the checkpointed token frame (recomputing the cheap
    // explode beats materializing a 3-words-per-token stream)
    val occ = grams(toks.select(col("doc_id"), col("split"), col("t")), 3)
    val scored = occ.select(col("w1"), col("w2"), col("w3")).distinct()
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi, Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c12").as("c23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w1").as("w2"), col("c1").as("c2")),
        Seq("w2"), "left")
      .join(uni.select(col("w1").as("w3"), col("c1").as("c3")),
        Seq("w3"), "left")
      .join(broadcast(total))
      // a trigram seen in train implies its (w1,w2) bigram (and a seen
      // (w2,w3) bigram implies unigram w2), so each tier's denominator
      // is non-null exactly when its numerator is
      .withColumn("tier",
        when(col("c123").isNotNull, lit(3))
          .when(col("c23").isNotNull, lit(2))
          .when(col("c3").isNotNull, lit(1)).otherwise(lit(0)))
      .withColumn("s_fp", floor(
        when(col("tier") === 3,
          col("c123").cast("double") / col("c12").cast("double"))
          .when(col("tier") === 2, lit(0.4) *
            (col("c23").cast("double") / col("c2").cast("double")))
          .when(col("tier") === 1, lit(0.4) * lit(0.4) *
            (col("c3").cast("double") / col("t_tokens").cast("double")))
          .otherwise(lit(0.0)) * lit(1.0e15)).cast("long"))
      .select(col("w1"), col("w2"), col("w3"), col("tier"), col("s_fp"))
    occ.join(scored, Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("tier") === 3, 1L).otherwise(0L)).cast("long")
          .as("n_hit3"),
        sum(when(col("tier") === 2, 1L).otherwise(0L)).cast("long")
          .as("n_bo2"),
        sum(when(col("tier") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_bo1"),
        sum(when(col("tier") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_oov"),
        sum(col("s_fp")).cast("long").as("score_fp"))
      .withColumn("score", col("score_fp").cast("double")
        / (col("n_tri").cast("double") * lit(1.0e15)))
  }
  val o240: String = """
    WITH toks AS (
      SELECT doc_id,
        CASE WHEN (((doc_id % 1000000007) * 2654435761 + 5851)
               % 1000000007) % 100 < 80 THEN 'train'
             WHEN (((doc_id % 1000000007) * 2654435761 + 5851)
               % 1000000007) % 100 < 90 THEN 'val'
             ELSE 'test' END AS split,
        string_split(text, ' ') AS t
      FROM documents),
    tri_tr AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3,
        COUNT(*) AS c123
      FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks WHERE split = 'train')
      GROUP BY 1, 2, 3),
    bi_tr AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c12
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE split = 'train')
      GROUP BY 1, 2),
    uni_tr AS (
      SELECT t[i] AS w1, COUNT(*) AS c1
      FROM (SELECT t, unnest(generate_series(1, len(t))) AS i
            FROM toks WHERE split = 'train')
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t_tokens FROM uni_tr),
    occ AS (
      SELECT doc_id, split, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
      FROM (SELECT doc_id, split, t,
              unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks)),
    scored AS (
      SELECT w1, w2, w3,
        CASE WHEN tr.c123 IS NOT NULL THEN 3
             WHEN b23.c23 IS NOT NULL THEN 2
             WHEN u3.c3 IS NOT NULL THEN 1 ELSE 0 END AS tier,
        CAST(FLOOR(
          CASE WHEN tr.c123 IS NOT NULL
                 THEN CAST(tr.c123 AS DOUBLE) / CAST(b12.c12 AS DOUBLE)
               WHEN b23.c23 IS NOT NULL THEN 0.4 *
                 (CAST(b23.c23 AS DOUBLE) / CAST(u2.c2 AS DOUBLE))
               WHEN u3.c3 IS NOT NULL THEN 0.4 * 0.4 *
                 (CAST(u3.c3 AS DOUBLE) / CAST(tot.t_tokens AS DOUBLE))
               ELSE 0.0 END * 1.0e15) AS BIGINT) AS s_fp
      FROM (SELECT DISTINCT w1, w2, w3 FROM occ) g
      LEFT JOIN tri_tr tr USING (w1, w2, w3)
      LEFT JOIN bi_tr b12 ON b12.w1 = g.w1 AND b12.w2 = g.w2
      LEFT JOIN (SELECT w1 AS w2, w2 AS w3, c12 AS c23 FROM bi_tr) b23
        ON b23.w2 = g.w2 AND b23.w3 = g.w3
      LEFT JOIN (SELECT w1 AS w2, c1 AS c2 FROM uni_tr) u2
        ON u2.w2 = g.w2
      LEFT JOIN (SELECT w1 AS w3, c1 AS c3 FROM uni_tr) u3
        ON u3.w3 = g.w3
      CROSS JOIN tot)
    SELECT doc_id, split, COUNT(*) AS n_tri,
      CAST(SUM(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_hit3,
      CAST(SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bo2,
      CAST(SUM(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bo1,
      CAST(SUM(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_oov,
      CAST(SUM(s_fp) AS BIGINT) AS score_fp,
      CAST(SUM(s_fp) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 1.0e15) AS score
    FROM occ JOIN scored USING (w1, w2, w3)
    GROUP BY doc_id, split"""

  // --------------------------------- perplexity-tertile gate
  /** CCNet-style perplexity gate (Wenzek et al. 2020): every scored
    * document is ranked WITHIN ITS LANGUAGE by q240's backoff-LM mean
    * score (higher = more fluent ≈ lower perplexity) and split into
    * head/middle/tail tertiles; `kept` = head ∪ middle — the classic
    * LM-quality cut that curates per language so low-resource
    * languages aren't graded on the high-resource corpus's curve.
    * The rank key is the exact fixed-point mean `score_fp div n_tri`
    * (both engines floor nonnegative operands identically), doc_id
    * tie-break. Docs with no trigram position carry no LM evidence
    * and are out of the gate's scope (the q51 length gate owns them).
    * Tertile boundaries use ntile arithmetic spelled explicitly
    * (first `n mod 3` tertiles take one extra row) so both engines
    * bin identically at every n.
    *
    * 100 TB design: a per-language rank window is still a
    * census-scale sort through few language partitions, so the rank
    * rides q153's two-level layout — [[Relational.valueBucket]] maps
    * the mean to a BOUNDED value-monotonic histogram key, the
    * (lang, bucket) census cumsum (≤ ~18k rows per language) yields
    * offsets, and per-(lang, bucket) windows refine — no
    * census-scale window partition anywhere. The oracle is the naive
    * per-language row_number, pinning the refinement row-identical. */
  val q250PplGate: Q = (s, d) => {
    import s.implicits._
    val scored = q240BackoffLm(s, d)
      .join(Tables.documents(s, d).select($"doc_id", $"lang"),
        Seq("doc_id"))
      .select($"doc_id", $"lang",
        expr("score_fp div n_tri").as("m_fp"))
    Relational.twoLevelRank(scored, "m_fp", "doc_id", asc = false,
        partCols = Seq("lang"), rankCol = "lang_rank", nCol = "n")
      .withColumn("b1", (expr("n div 3")
        + when($"n" % 3 >= 1, 1L).otherwise(0L)).cast("long"))
      .withColumn("b2", (expr("2 * (n div 3)")
        + least($"n" % 3, lit(2L))).cast("long"))
      .select($"doc_id", $"lang", $"m_fp".as("score_fp_mean"),
        $"lang_rank",
        when($"lang_rank" <= $"b1", lit("head"))
          .when($"lang_rank" <= $"b2", lit("middle"))
          .otherwise(lit("tail")).as("tertile"),
        ($"lang_rank" <= $"b2").as("kept"))
  }
  val o250: String = s"""
    WITH base AS (SELECT * FROM ($o240)),
    sc AS (
      SELECT b.doc_id, d.lang, b.score_fp // b.n_tri AS m_fp
      FROM base b JOIN documents d USING (doc_id)),
    ranked AS (
      SELECT doc_id, lang, m_fp,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY m_fp DESC, doc_id ASC) AS BIGINT) AS lang_rank,
        COUNT(*) OVER (PARTITION BY lang) AS n
      FROM sc),
    cut AS (
      SELECT *,
        n // 3 + CASE WHEN n % 3 >= 1 THEN 1 ELSE 0 END AS b1,
        2 * (n // 3) + LEAST(n % 3, 2) AS b2
      FROM ranked)
    SELECT doc_id, lang, m_fp AS score_fp_mean, lang_rank,
      CASE WHEN lang_rank <= b1 THEN 'head'
           WHEN lang_rank <= b2 THEN 'middle'
           ELSE 'tail' END AS tertile,
      lang_rank <= b2 AS kept
    FROM cut"""

  // --------------------------------- curation funnel v2
  /** The MODEL-GATED curation funnel — q228's raw → exact-dedup →
    * quality funnel extended by the two trained gates this round's
    * stack produces: q250's per-language LM-perplexity tertile cut
    * and q241's DSIR target-likeness selection, applied in sequence
    * (dedup → heuristic quality → LM gate → DSIR), each stage
    * reporting docs, tokens, and the token share of raw — the
    * end-to-end "how much trainable data survives the full modern
    * pipeline" number, with every gate oracle-anchored elsewhere
    * (q54/q228, q51, q250, q241) and their COMPOSITION pinned here.
    * Both gates are trained once on the raw corpus and applied as
    * static per-doc verdicts (the artifact-reuse deployment shape);
    * docs outside a gate's scope (no trigram evidence / no tokens)
    * pass it untouched — a gate abstains, it never vetoes blind.
    * Planted exact replays (q226/q228's doc_id ≡ 0 mod 6 recipe) keep
    * the dedup stage non-vacuous at every SF; replays die at the
    * dedup stage before any gate verdict could matter. Note the DSIR
    * stage reports the ≥ 0-bits threshold FAITHFULLY, and on a corpus
    * whose target-likeness shifts together that threshold is
    * all-or-nothing (kills everything at sf0.001, keeps everything at
    * sf0.1) — which is exactly why q262's manifest treats DSIR as the
    * sampler's weight rather than a hard gate.
    *
    * 100 TB design: the funnel frame carries (doc_id, fp, ntok,
    * flags) — text collapses at the scan; the two gate verdicts
    * attach by keyed doc_id joins (each gate's own scale story is
    * argued at its definition); the verdict is ONE conditional
    * aggregate producing all five stages (no per-stage corpus
    * passes). */
  /** The per-doc gate-verdict frame behind q257's funnel and q262's
    * release manifest: (doc_id, ntok, pass_q, is_surv, lm_kept,
    * dsir_sel) over the mod-6-replay-augmented corpus.
    * [[funnelFlagsSql]] is the SQL twin (a WITH-body fragment ending
    * in `fun_flags`). */
  private def curationFlags(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base0 = Tables.documents(s, d).select($"doc_id", $"text")
    val aug = base0.unionByName(base0.filter($"doc_id" % 6 === 0)
      .withColumn("doc_id", $"doc_id" + lit(7L << 40)))
    val docs = aug
      .withColumn("fp", TextOps.fingerprintCol)
      .withColumn("ntok", size(split($"text", " ")).cast("long"))
      .withColumn("pass_q", TextOps.qualityCol >= 0.4)
      .select($"doc_id", $"fp", $"ntok", $"pass_q")
    val lm = q250PplGate(s, d).select($"doc_id", $"kept".as("lm_kept"))
    val dsir = dsirDocBits(s, d)
      .select(col("doc_id"), (col("doc_bits") >= 0).as("dsir_sel"))
    // survivor election as a window MIN over the fp partition — fp is
    // high-cardinality (near doc-grain groups, bounded group size), so
    // this is a partitioned window, never a census-scale sort. One
    // exchange and ONE pass over the doc frame where the previous
    // groupBy+join spelling cost a census shuffle + a join shuffle +
    // an eager checkpoint of the full doc frame just to read it twice
    // (round-12 gate-chain fold, guide §2.4). Identical is_surv:
    // doc_id = MIN(doc_id) over fp ⟺ doc_id = keep_id after the join.
    docs
      .withColumn("is_surv", $"doc_id" ===
        min($"doc_id").over(Window.partitionBy($"fp")))
      .join(lm, Seq("doc_id"), "left")
      .join(dsir, Seq("doc_id"), "left")
      .withColumn("lm_kept", coalesce($"lm_kept", lit(true)))
      .withColumn("dsir_sel", coalesce($"dsir_sel", lit(true)))
  }

  val q257CurationFunnel: Q = (s, d) => {
    import s.implicits._
    curationFlags(s, d).agg(
      count(lit(1)).as("d0"),
      sum($"ntok").cast("long").as("t0"),
      sum(when($"is_surv", 1L).otherwise(0L)).cast("long").as("d1"),
      sum(when($"is_surv", $"ntok").otherwise(0L)).cast("long")
        .as("t1"),
      sum(when($"is_surv" && $"pass_q", 1L).otherwise(0L))
        .cast("long").as("d2"),
      sum(when($"is_surv" && $"pass_q", $"ntok").otherwise(0L))
        .cast("long").as("t2"),
      sum(when($"is_surv" && $"pass_q" && $"lm_kept", 1L)
        .otherwise(0L)).cast("long").as("d3"),
      sum(when($"is_surv" && $"pass_q" && $"lm_kept", $"ntok")
        .otherwise(0L)).cast("long").as("t3"),
      sum(when($"is_surv" && $"pass_q" && $"lm_kept" && $"dsir_sel",
        1L).otherwise(0L)).cast("long").as("d4"),
      sum(when($"is_surv" && $"pass_q" && $"lm_kept" && $"dsir_sel",
        $"ntok").otherwise(0L)).cast("long").as("t4"))
      .select(expr("""stack(5,
          'raw', d0, t0,
          'exact_dedup', d1, t1,
          'quality', d2, t2,
          'lm_gate', d3, t3,
          'dsir', d4, t4) AS (stage, n_docs, n_tokens)"""), $"t0")
      .select($"stage", $"n_docs", $"n_tokens",
        ($"n_tokens".cast("double") / $"t0".cast("double"))
          .as("token_share"))
  }
  /** o257's gate-verdict CTE chain (fun_base → … → fun_flags) — the
    * WITH-body fragment shared with o262. Embedders must avoid the
    * nested chains' CTE names (o250's base/sc/ranked/cut, o240's
    * toks/tri_tr/bi_tr/uni_tr/tot/occ/scored, the d-prefixed DSIR
    * chain) at their outer level. */
  private def funnelFlagsSql: String = s"""
    fun_base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + ${7L << 40} AS doc_id, text
      FROM documents WHERE doc_id % 6 = 0),
    fun_docs AS (
      SELECT doc_id, ${TextOps.fingerprintSql} AS fp,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        CASE WHEN (${TextOps.qualitySql}) >= 0.4
          THEN 1 ELSE 0 END AS pass_q
      FROM fun_base),
    fun_surv AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM fun_docs GROUP BY fp),
    ppl AS ($o250),
    ${dsirChainDuck("d")},
    fun_flags AS (
      SELECT f.doc_id, f.ntok, f.pass_q,
        CASE WHEN f.doc_id = sv.keep_id THEN 1 ELSE 0 END AS is_surv,
        CASE WHEN p.doc_id IS NULL OR p.kept THEN 1 ELSE 0 END
          AS lm_kept,
        CASE WHEN dd.doc_id IS NULL OR dd.doc_bits >= 0 THEN 1 ELSE 0
          END AS dsir_sel
      FROM fun_docs f
      JOIN fun_surv sv USING (fp)
      LEFT JOIN ppl p ON p.doc_id = f.doc_id
      LEFT JOIN ddoc dd ON dd.doc_id = f.doc_id)"""

  val o257: String = s"""
    WITH $funnelFlagsSql,
    fun_agg AS (
      SELECT COUNT(*) AS d0, CAST(SUM(ntok) AS BIGINT) AS t0,
        CAST(SUM(is_surv) AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN is_surv = 1 THEN ntok ELSE 0 END)
          AS BIGINT) AS t1,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1
          THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1
          THEN ntok ELSE 0 END) AS BIGINT) AS t2,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1 AND lm_kept = 1
          THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1 AND lm_kept = 1
          THEN ntok ELSE 0 END) AS BIGINT) AS t3,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1 AND lm_kept = 1
          AND dsir_sel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        CAST(SUM(CASE WHEN is_surv = 1 AND pass_q = 1 AND lm_kept = 1
          AND dsir_sel = 1 THEN ntok ELSE 0 END) AS BIGINT) AS t4
      FROM fun_flags)
    SELECT 'raw' AS stage, d0 AS n_docs, t0 AS n_tokens,
      CAST(t0 AS DOUBLE) / CAST(t0 AS DOUBLE) AS token_share
      FROM fun_agg
    UNION ALL SELECT 'exact_dedup', d1, t1,
      CAST(t1 AS DOUBLE) / CAST(t0 AS DOUBLE) FROM fun_agg
    UNION ALL SELECT 'quality', d2, t2,
      CAST(t2 AS DOUBLE) / CAST(t0 AS DOUBLE) FROM fun_agg
    UNION ALL SELECT 'lm_gate', d3, t3,
      CAST(t3 AS DOUBLE) / CAST(t0 AS DOUBLE) FROM fun_agg
    UNION ALL SELECT 'dsir', d4, t4,
      CAST(t4 AS DOUBLE) / CAST(t0 AS DOUBLE) FROM fun_agg"""

  // --------------------------------- release manifest
  private val ManifestShards = 8L

  /** The training-data RELEASE MANIFEST — the last mile that turns
    * audits into an artifact: the docs surviving the HARD-FILTER
    * cascade (dedup ∧ quality ∧ LM tertile — q257's first four
    * stages; DSIR stays out of the gate because it is a resampling
    * WEIGHT in its own construction, the sampler's input rather than
    * a filter, and its sign threshold is all-or-nothing on a corpus
    * whose target-likeness shifts together) are assigned their q105
    * split and, within each split, dealt into [[ManifestShards]]
    * shards by token-count snake draft (q225's deal at DOC grain —
    * alternating direction over the length rank keeps every shard's
    * token mass near the split mean, so data loaders stream any
    * shard without a long tail). Emits the per-(split, shard) census
    * with each shard's balance against its split's ideal share — the
    * table a release publishes next to the parquet it describes.
    *
    * 100 TB design: the gate frame is q257's (each gate's scale story
    * at its definition); the within-split length rank rides
    * [[Relational.twoLevelRank]] (bounded histogram cumsum, never a
    * split-partition corpus sort); the census and balance are
    * |splits|·|shards| rows. */
  /** Doc-grain (doc_id, ntok, split, shard) release assignment — the
    * shared truth behind [[q262ReleaseManifest]]'s census and
    * [[writeRelease]]'s partitioned artifact, so the manifest a
    * release PUBLISHES and the data it SHIPS cannot drift apart. */
  private[ops] def releaseAssignments(s: SparkSession,
                                      d: String): DataFrame = {
    import s.implicits._
    val kept = curationFlags(s, d)
      .filter($"is_surv" && $"pass_q" && $"lm_kept")
      .select($"doc_id", $"ntok")
      .withColumn("split", splitAssign($"doc_id"))
      // the gate frame is the expensive composite (q250 + DSIR); the
      // rank layout and census each consume their input twice, so
      // materialize once here instead of 4x-inlining the gate plan
      // (lazy: the first consuming job persists it — no dedicated
      // materialization job, round-12 fold)
      .localCheckpoint(eager = false)
    Relational.twoLevelRank(kept, "ntok", "doc_id",
        asc = false, partCols = Seq("split"))
      .withColumn("shard", expr(
        s"""CASE WHEN ((rank - 1) div $ManifestShards) % 2 = 0
              THEN (rank - 1) % $ManifestShards
              ELSE $ManifestShards - 1 - (rank - 1) % $ManifestShards
            END"""))
      .select($"doc_id", $"ntok", $"split", $"shard")
  }

  /** The per-(split, shard) census + balance over an assignment
    * frame — q262's output shape, factored so [[writeRelease]]'s
    * re-read audit regenerates the identical census from the
    * written artifact. */
  private def releaseCensus(asg: DataFrame): DataFrame = {
    import asg.sparkSession.implicits._
    val census = asg
      .groupBy($"split", $"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ntok").cast("long").as("n_tokens"))
      // |splits|·|shards| rows, consumed twice (join left + totals):
      // without this the whole assignment subtree — gate stack plus
      // twoLevelRank — re-executes once per consumer (lazy, round-12)
      .localCheckpoint(eager = false)
    val totals = census.groupBy($"split")
      .agg(sum($"n_tokens").cast("long").as("split_tokens"))
    census.join(broadcast(totals), Seq("split"))
      .select($"split", $"shard", $"n_docs", $"n_tokens",
        ($"n_tokens".cast("double")
          / ($"split_tokens".cast("double")
            / lit(ManifestShards.toDouble))).as("balance"))
  }

  val q262ReleaseManifest: Q = (s, d) =>
    releaseCensus(releaseAssignments(s, d))
  val o262: String = s"""
    WITH $funnelFlagsSql,
    mkept AS (
      SELECT doc_id, ntok,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT doc_id, ntok,
          (((doc_id % 1000000007) * 2654435761 + 5851) % 1000000007)
            % 100 AS b
        FROM fun_flags
        WHERE is_surv = 1 AND pass_q = 1 AND lm_kept = 1)),
    rankedm AS (
      SELECT split, ntok,
        CAST(row_number() OVER (PARTITION BY split
          ORDER BY ntok DESC, doc_id ASC) AS BIGINT) AS rank
      FROM mkept),
    sharded AS (
      SELECT split, ntok,
        CASE WHEN ((rank - 1) // $ManifestShards) % 2 = 0
          THEN (rank - 1) % $ManifestShards
          ELSE $ManifestShards - 1 - (rank - 1) % $ManifestShards
        END AS shard
      FROM rankedm),
    mcensus AS (
      SELECT split, shard, COUNT(*) AS n_docs,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM sharded GROUP BY split, shard),
    mtot AS (
      SELECT split, CAST(SUM(n_tokens) AS BIGINT) AS split_tokens
      FROM mcensus GROUP BY split)
    SELECT c.split, c.shard, c.n_docs, c.n_tokens,
      CAST(c.n_tokens AS DOUBLE)
        / (CAST(t.split_tokens AS DOUBLE) / $ManifestShards.0)
        AS balance
    FROM mcensus c JOIN mtot t USING (split)"""

  // --------------------------------- release write path
  /** Canonical JSON manifest for a release census (rows sorted by
    * (split, shard)); regenerated from the re-read artifact by the
    * audit and compared BYTE-EQUAL to the published file. */
  private def manifestJson(censusRows: Seq[(String, Long, Long, Long,
      Double)]): String = {
    val shardLines = censusRows.sorted.map {
      case (split, shard, nDocs, nTokens, balance) =>
        s"""{"split":"$split","shard":$shard,"n_docs":$nDocs,""" +
          s""""n_tokens":$nTokens,"balance":$balance}"""
    }
    s"""{"manifest_shards":$ManifestShards,""" +
      s""""n_docs":${censusRows.map(_._3).sum},""" +
      s""""n_tokens":${censusRows.map(_._4).sum},""" +
      s""""shards":[${shardLines.mkString(",")}]}"""
  }

  private def collectCensus(census: DataFrame)
      : Seq[(String, Long, Long, Long, Double)] =
    census.collect().map { r =>  // |splits|·|shards| rows — driver-safe
      // Number-route the ints: the partitionBy writer round-trips
      // `shard` as INT, so the re-read census boxes Integer where the
      // pre-write census boxes Long
      (r.getAs[String]("split"), r.getAs[Number]("shard").longValue(),
        r.getAs[Number]("n_docs").longValue(),
        r.getAs[Number]("n_tokens").longValue(),
        r.getAs[Double]("balance"))
    }.toSeq

  /** Writes the q262 release as a real artifact and audits it by
    * re-reading what was written — the last mile from census to
    * shipped data (reference analog: the mart write + `_meta`
    * manifest pattern, etl/metadata.py:45-128 / etl/marts/
    * transfers.py:266-313, that the POS side already mirrors):
    *
    *   `outDir/data/split=…/shard=…/` parquet — survivor documents
    *     (doc_id, text, lang, source, n_chars, ntok) partitioned by
    *     the snake-draft assignment, so a trainer reads exactly one
    *     directory per (split, shard);
    *   `outDir/_meta/manifest.json` — the q262 census, the shipped
    *     twin of what the query reports.
    *
    * The returned audit frame joins the PRE-write census against a
    * census recomputed from the RE-READ parquet — n_docs, n_tokens,
    * AND ntok recomputed from the written text (a corrupted or
    * truncated text column fails the audit even when row counts
    * survive) — one row per (split, shard) with an `ok` verdict.
    * The manifest file is separately regenerated from the re-read
    * data and compared byte-equal ([[manifestJson]] is canonical).
    *
    * 100 TB design: the write is the assignment frame joined to the
    * corpus by doc_id (survivors are always ORIGINAL ids — min-id
    * election — so the join hits the raw table, never the augmented
    * frame) and shuffled only by the partitionBy writer; the audit
    * censuses collapse at the scan; only the |splits|·|shards|-row
    * census ever reaches the driver. */
  def writeRelease(s: SparkSession, d: String,
                   outDir: String): DataFrame = {
    import s.implicits._
    val asg = releaseAssignments(s, d).localCheckpoint(eager = false)
    val census = releaseCensus(asg)
    asg.join(Tables.documents(s, d), Seq("doc_id"))
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars",
        $"ntok", $"split", $"shard")
      .write.mode("overwrite").partitionBy("split", "shard")
      .parquet(s"$outDir/data")
    val censusRows = collectCensus(census)
    val metaDir = java.nio.file.Paths.get(outDir, "_meta")
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.writeString(metaDir.resolve("manifest.json"),
      manifestJson(censusRows) + "\n")
    // ---- re-read audit: the artifact must reproduce the census
    val back = s.read.parquet(s"$outDir/data")
      .withColumn("ntok_recount",
        size(split($"text", " ")).cast("long"))
    val backCensus = back.groupBy($"split", $"shard")
      .agg(count(lit(1)).as("rr_n_docs"),
        sum($"ntok").cast("long").as("rr_n_tokens"),
        sum($"ntok_recount").cast("long").as("rr_n_tokens_recount"))
    val rereadManifest = manifestJson(collectCensus(
      releaseCensus(back.select($"doc_id", $"ntok", $"split",
        $"shard"))))
    val fileManifest = java.nio.file.Files.readString(
      metaDir.resolve("manifest.json")).stripLineEnd
    val manifestOk = rereadManifest == fileManifest
    census.join(backCensus, Seq("split", "shard"), "full_outer")
      .withColumn("manifest_file_ok", lit(manifestOk))
      .withColumn("ok",
        $"n_docs" === $"rr_n_docs" &&
          $"n_tokens" === $"rr_n_tokens" &&
          $"n_tokens" === $"rr_n_tokens_recount" &&
          lit(manifestOk))
  }

  // --------------------------------- source lexical-drift TVD
  /** Per-source lexical drift: the total-variation distance between
    * each source's unigram distribution and the whole-corpus
    * distribution — TVD(s) = ½·Σ_w |c_s(w)/T_s − c(w)/T|, the one
    * number that answers "which source's vocabulary deviates most
    * from the mixture" before it skews a training run (q123 censuses
    * cross-source SHARING; this measures distributional distance).
    *
    * Exactness: each term's deviation is the integer
    * |c_s·T − c·T_s| via [[crossDevAbs]] (decimal(38,0) ↔ HUGEINT —
    * the q179 convention, safe past int64 cross-products); terms the
    * source NEVER emits contribute c·T_s each, folded in
    * ALGEBRAICALLY as T_s·(T − Σ_{w∈s} c(w)) so the absent
    * (source, term) pairs are never materialized. One IEEE division
    * per source row at the very end.
    *
    * 100 TB design: everything happens at vocabulary grain — the
    * (source, term) census and the term census are map-side combined,
    * the term totals attach by ONE keyed join, source totals and the
    * corpus total are broadcast. No windows, no pair frames. */
  val q251SourceDrift: Q = (s, d) => {
    import s.implicits._
    val occ = Tables.documents(s, d)
      .select($"source", explode(split($"text", " ")).as("term"))
    val st = occ.groupBy($"source", $"term")
      .agg(count(lit(1)).as("c_st"))
      .localCheckpoint(eager = false) // feeds the term census AND the dev sum
    val termTot = st.groupBy($"term")
      .agg(sum($"c_st").cast("long").as("c_t"))
    val srcTot = st.groupBy($"source")
      .agg(sum($"c_st").cast("long").as("t_s"))
    val tot = termTot.agg(sum($"c_t").cast("long").as("t_all"))
    st.join(termTot, Seq("term"))
      .join(broadcast(srcTot), Seq("source"))
      .join(broadcast(tot))
      .withColumn("dev",
        crossDevAbs($"c_st", $"t_all", $"c_t", $"t_s"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_terms"),
        sum($"c_t").cast("long").as("covered_mass"),
        sum($"dev").as("sum_dev"))
      .join(broadcast(srcTot), Seq("source"))
      .join(broadcast(tot))
      .select($"source", $"n_terms", $"t_s".as("n_tokens"),
        (($"sum_dev" + $"t_s".cast("decimal(38,0)")
            * ($"t_all" - $"covered_mass")).cast("double")
          / (lit(2.0) * $"t_s".cast("double")
            * $"t_all".cast("double"))).as("tvd"))
  }
  val o251: String = """
    WITH occ AS (
      SELECT source, t[i] AS term
      FROM (SELECT source, t, unnest(generate_series(1, len(t))) AS i
            FROM (SELECT source, string_split(text, ' ') AS t
                  FROM documents))),
    st AS (
      SELECT source, term, COUNT(*) AS c_st FROM occ GROUP BY 1, 2),
    term_tot AS (
      SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t
      FROM st GROUP BY 1),
    src_tot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s
      FROM st GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_all FROM term_tot),
    per_src AS (
      SELECT st.source, COUNT(*) AS n_terms,
        CAST(SUM(tt.c_t) AS BIGINT) AS covered_mass,
        SUM(ABS(CAST(st.c_st AS HUGEINT) * tot.t_all
                - CAST(tt.c_t AS HUGEINT) * so.t_s)) AS sum_dev
      FROM st
      JOIN term_tot tt USING (term)
      JOIN src_tot so ON so.source = st.source
      CROSS JOIN tot
      GROUP BY st.source)
    SELECT p.source, p.n_terms, s.t_s AS n_tokens,
      CAST(p.sum_dev + CAST(s.t_s AS HUGEINT)
             * (t.t_all - p.covered_mass) AS DOUBLE)
        / (2.0 * CAST(s.t_s AS DOUBLE) * CAST(t.t_all AS DOUBLE))
        AS tvd
    FROM per_src p
    JOIN src_tot s ON s.source = p.source
    CROSS JOIN tot t"""

  // --------------------------------- vocab-size coverage sweep
  /** Tokenizer vocab-size sweep: token-occurrence coverage at vocab
    * cuts of 512/1024/2048/4096 types (top types by frequency, term
    * tie-break) — the "how big must the vocabulary be" curve a
    * tokenizer build reads before committing (q115 profiles head/tail
    * at ONE cut; q175 measures OOV against ONE fixed list; this
    * sweeps the family).
    *
    * 100 TB design: the corpus collapses to the vocab census (map-side
    * combined); the head is extracted by the GLOBAL two-phase top-k
    * heap operator (`plans/TopKPlan`, k-bounded partial heaps — never
    * an unpartitioned rank window over the vocab, the q221 lesson);
    * the sweep is one conditional aggregate over the ≤4096-row head
    * crossed with the single-row census totals. */
  val q247VocabSweep: Q = (s, d) => {
    val census = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val head = graft.plans.TopK.perGroup(census, Seq.empty,
      Seq(("n", true), ("term", false)), 4096)
    val totals = census.agg(
      sum(col("n")).cast("long").as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    // one conditional aggregate over the bounded head frame
    val sums = head.agg(
      sum(when(col("rank") <= 512, col("n")).otherwise(0L)).cast("long")
        .as("c512"),
      sum(when(col("rank") <= 1024, col("n")).otherwise(0L)).cast("long")
        .as("c1024"),
      sum(when(col("rank") <= 2048, col("n")).otherwise(0L)).cast("long")
        .as("c2048"),
      sum(col("n")).cast("long").as("c4096"))
    sums.join(broadcast(totals))
      .select(expr("""stack(4,
        CAST(512 AS BIGINT), c512,
        CAST(1024 AS BIGINT), c1024,
        CAST(2048 AS BIGINT), c2048,
        CAST(4096 AS BIGINT), c4096)
        AS (cut, covered_tokens)"""),
        col("total_tokens"), col("vocab_size"))
      .withColumn("coverage_pct",
        col("covered_tokens").cast("double") * 100.0
          / col("total_tokens").cast("double"))
  }
  val o247: String = """
    WITH census AS (
      SELECT term, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term),
    ranked AS (
      SELECT n, CAST(row_number() OVER (ORDER BY n DESC, term ASC)
        AS BIGINT) AS rank
      FROM census),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
        COUNT(*) AS vocab_size
      FROM census),
    sums AS (
      SELECT
        CAST(SUM(CASE WHEN rank <= 512 THEN n ELSE 0 END) AS BIGINT)
          AS c512,
        CAST(SUM(CASE WHEN rank <= 1024 THEN n ELSE 0 END) AS BIGINT)
          AS c1024,
        CAST(SUM(CASE WHEN rank <= 2048 THEN n ELSE 0 END) AS BIGINT)
          AS c2048,
        CAST(SUM(CASE WHEN rank <= 4096 THEN n ELSE 0 END) AS BIGINT)
          AS c4096
      FROM ranked),
    cuts AS (
      SELECT CAST(512 AS BIGINT) AS cut, c512 AS covered_tokens
        FROM sums
      UNION ALL SELECT 1024, c1024 FROM sums
      UNION ALL SELECT 2048, c2048 FROM sums
      UNION ALL SELECT 4096, c4096 FROM sums)
    SELECT cut, covered_tokens, total_tokens, vocab_size,
      CAST(covered_tokens AS DOUBLE) * 100.0
        / CAST(total_tokens AS DOUBLE) AS coverage_pct
    FROM cuts, tot"""

  // --------------------------------- effective-token mixture
  /** The mixture you should ACTUALLY train on: q239's τ=0.5
    * temperature shares computed twice per source — once on RAW
    * token mass, once on EFFECTIVE token mass (exact-dedup survivors
    * that also pass the q51 quality gate, q228's funnel definition) —
    * with the share shift. A source fat with duplicates or low-quality
    * text claims a raw-mass share it cannot back with trainable
    * tokens; sampling by raw shares then silently over-replays its
    * survivors. Planted exact replays (q226/q228's doc_id≡0 mod 6
    * recipe, source carried) keep the dedup stage non-vacuous at
    * every SF.
    *
    * 100 TB design: one corpus scan to the fingerprint census (8-byte
    * keys, text never shuffles), one conditional per-source
    * aggregate, fixed-point sqrt weights (q239's floor ×1e9
    * convention) summed exactly before the single broadcast totals
    * row. */
  val q246EffectiveMixture: Q = (s, d) => {
    import s.implicits._
    val base0 = Tables.documents(s, d)
      .select($"doc_id", $"source", $"text")
    val docs = base0.unionByName(base0.filter($"doc_id" % 6 === 0)
      .withColumn("doc_id", $"doc_id" + lit(7L << 40)))
      .withColumn("fp", TextOps.fingerprintCol)
      .withColumn("ntok", size(split($"text", " ")).cast("long"))
      .withColumn("pass_q", TextOps.qualityCol >= 0.4)
    val surv = docs.groupBy($"fp").agg(min($"doc_id").as("keep_id"))
    val per = docs.join(surv, Seq("fp"))
      .withColumn("is_eff", $"doc_id" === $"keep_id" && $"pass_q")
      .groupBy($"source")
      .agg(sum($"ntok").cast("long").as("t_raw"),
        sum(when($"is_eff", $"ntok").otherwise(0L)).cast("long")
          .as("t_eff"))
      .withColumn("w_raw_fp",
        floor(sqrt($"t_raw".cast("double")) * lit(1.0e9)).cast("long"))
      .withColumn("w_eff_fp",
        floor(sqrt($"t_eff".cast("double")) * lit(1.0e9)).cast("long"))
    val totals = per.agg(
      sum($"w_raw_fp").cast("long").as("tw_raw"),
      sum($"w_eff_fp").cast("long").as("tw_eff"))
    per.join(broadcast(totals))
      .select($"source", $"t_raw", $"t_eff",
        ($"w_raw_fp".cast("double") / $"tw_raw".cast("double"))
          .as("share_raw"),
        ($"w_eff_fp".cast("double") / $"tw_eff".cast("double"))
          .as("share_eff"))
      .withColumn("share_shift", $"share_eff" - $"share_raw")
  }
  val o246: String = s"""
    WITH base AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + ${7L << 40} AS doc_id, source, text
      FROM documents WHERE doc_id % 6 = 0),
    docs AS (
      SELECT doc_id, source,
        ${TextOps.fingerprintSql} AS fp,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        CASE WHEN (${TextOps.qualitySql}) >= 0.4
          THEN 1 ELSE 0 END AS pass_q
      FROM base),
    surv AS (SELECT fp, MIN(doc_id) AS keep_id FROM docs GROUP BY fp),
    per AS (
      SELECT source,
        CAST(SUM(ntok) AS BIGINT) AS t_raw,
        CAST(SUM(CASE WHEN d.doc_id = s.keep_id AND d.pass_q = 1
          THEN ntok ELSE 0 END) AS BIGINT) AS t_eff
      FROM docs d JOIN surv s USING (fp)
      GROUP BY source),
    fp2 AS (
      SELECT source, t_raw, t_eff,
        CAST(FLOOR(sqrt(CAST(t_raw AS DOUBLE)) * 1.0e9) AS BIGINT)
          AS w_raw_fp,
        CAST(FLOOR(sqrt(CAST(t_eff AS DOUBLE)) * 1.0e9) AS BIGINT)
          AS w_eff_fp
      FROM per),
    tot AS (
      SELECT CAST(SUM(w_raw_fp) AS BIGINT) AS tw_raw,
        CAST(SUM(w_eff_fp) AS BIGINT) AS tw_eff
      FROM fp2)
    SELECT source, t_raw, t_eff,
      CAST(w_raw_fp AS DOUBLE) / CAST(tw_raw AS DOUBLE) AS share_raw,
      CAST(w_eff_fp AS DOUBLE) / CAST(tw_eff AS DOUBLE) AS share_eff,
      (CAST(w_eff_fp AS DOUBLE) / CAST(tw_eff AS DOUBLE))
        - (CAST(w_raw_fp AS DOUBLE) / CAST(tw_raw AS DOUBLE))
        AS share_shift
    FROM fp2, tot"""

  // ------------------------------------------- deep BPE trainer
  private val DeepBpeRounds = 10

  /** The DEEP BPE trainer: [[q223BpeTrain3]]'s merge round iterated
    * [[DeepBpeRounds]] times under the q83 iterative-checkpoint
    * pattern — the vocabulary is localCheckpointed EVERY round, so
    * round r's pair census reads a materialized vocab instead of
    * re-executing all r−1 previous folds (lazy chaining is O(N²) in
    * rounds and nests the fold expression r deep, which is exactly
    * what kills a 100+-round production trainer; this loop's cost is
    * O(N) with flat lineage, and extends to any round count by
    * changing one constant). Emits the merge-table head — one
    * (round, merge, freq) row per round, the artifact a tokenizer
    * build persists.
    *
    * 100 TB design: identical to q223 — the corpus collapses to the
    * weighted vocab census once; every round runs on the vocabulary
    * only (pair census map-side combined, argmax a sort-limit single
    * row, merge an in-row fold against one broadcast row). */
  val q245BpeDeepTrain: Q = (s, d) =>
    bpeDeepTrained(s, d)._1

  /** q245's 10-round trainer loop, returning BOTH artifacts a real
    * tokenizer build persists: the merge table (round, mx, my, merged,
    * n) AND the final trained word state (cnt, syms) — word → its
    * post-merge symbol sequence, which IS the encoded word table the
    * corpus encode pass (q273/q274) applies. Loop layout unchanged
    * from q245's definition (vocab-grain rounds, one broadcast merge
    * row per round, per-round checkpoints for flat lineage). */
  private def bpeDeepTrained(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val words0 = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select($"cnt", $"syms")
      .localCheckpoint(eager = false)
    var words = words0
    val tops = Seq.newBuilder[DataFrame]
    for (r <- 1 to DeepBpeRounds) {
      val top = bpePairCensus(words)
        .orderBy($"n".desc, $"mx".asc, $"my".asc).limit(1)
        .select(lit(r.toLong).as("round"), $"mx", $"my", $"n")
        .localCheckpoint(eager = false)
      // LEFT on TRUE: q223's degenerate-corpus convention — an empty
      // merge census must be a no-op, not empty the vocabulary
      words = bpeApplyMerge(words, top, Seq("cnt", "syms"))
        .localCheckpoint(eager = false)
      tops += top
    }
    val merges = tops.result().reduce(_ unionByName _)
      .select($"round", $"mx", $"my",
        concat($"mx", $"my").as("merged"), $"n")
    (merges, words)
  }
  val o245: String = s"""
    WITH $bpeWords0Sql,
    ${(1 to DeepBpeRounds).map(bpeRoundSql).mkString(",\n    ")}
    ${(1 to DeepBpeRounds).map(k =>
      s"SELECT round, mx, my, mx || my AS merged, n FROM top$k")
      .mkString("\n    UNION ALL\n    ")}"""

  // ------------------------------------------- corpus BPE ENCODE pass
  /** Per-doc BPE token stream from the trained word table: the step
    * every training run needs between curation and packing, closing
    * the trainer → ENCODER half of the tokenizer loop (q245 trains the
    * merges; this applies them to the corpus). The trained word state
    * (word → post-merge symbol sequence) already IS the encode of
    * every distinct word, so the corpus encode is one census-to-corpus
    * join — no per-document fold ever runs. Token IDS are assigned
    * densely over the final vocabulary (lexicographic rank, the
    * deterministic choice), and the whole id STREAM — values AND
    * order — is pinned by one exact int64 lane:
    * id_checksum = Σ_pos pos·id(token at pos), 1-based positions over
    * the doc's concatenated word encodings (word order = position in
    * the text, within-word order = the trained symbol sequence).
    * A wrong id, a swapped pair, or a dropped token each move the sum.
    *
    * Bound note: the checksum is ≤ L²·V per doc (L = doc tokens,
    * V = vocab size) — exact int64 to ~40k-token docs at a 5M vocab;
    * a longer-doc corpus routes the lane through decimal(38,0) (the
    * q255 convention).
    *
    * 100 TB design: the trainer side is q245's (vocab-grain rounds);
    * the vocab-id window runs over the FINAL VOCABULARY census
    * (|alphabet| + [[DeepBpeRounds]] rows by construction — the
    * production analogue is the CHOSEN vocab size, ~50k); per-word id
    * stats (k, Σid, Σj·id) collapse at word grain so the corpus join
    * carries three ints per word, never symbol rows; per-doc offsets
    * ride a doc_id-PARTITIONED window (bounded by doc length). Output
    * is doc-grain — the operator's contract is one row per encoded
    * document. */
  val q273BpeEncode: Q = (s, d) =>
    bpeDocTokens(s, d)
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        col("id_checksum"))

  /** The shared encode frame: (doc_id, lang, n_words, n_tokens,
    * id_checksum) per non-empty document under the q245-trained
    * tokenizer — q273 reports it; q274 packs over it. */
  private def bpeDocTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wordsF = bpeDeepTrained(s, d)._2
    // merging preserves concatenation, so the word string is exactly
    // the joined symbol sequence — recovered here instead of threading
    // `w` through 10 trainer rounds (keeps q245's plan untouched)
    val wenc = wordsF.withColumn("w", concat_ws("", $"syms"))
    val vocab = wenc.select(explode($"syms").as("tok")).distinct()
      .withColumn("id",
        row_number().over(Window.orderBy($"tok")).cast("long"))
    val wstat = wenc
      .select($"w", posexplode($"syms").as(Seq("j0", "tok")))
      .join(broadcast(vocab), Seq("tok"))
      .groupBy($"w")
      .agg(count(lit(1)).cast("long").as("k"),
        sum($"id").cast("long").as("s1"),
        sum(($"j0" + 1L) * $"id").cast("long").as("sp"))
    val dw = Tables.documents(s, d)
      .select($"doc_id", $"lang",
        posexplode(split($"text", " ")).as(Seq("wpos", "w")))
      .filter(length($"w") > 0)
    val wDoc = Window.partitionBy($"doc_id").orderBy($"wpos".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dw.join(wstat, Seq("w"))
      .withColumn("cumk", sum($"k").over(wDoc).cast("long"))
      // Σ over this word's tokens of (global pos · id), from the
      // word-grain stats: positions offset+1 … offset+k contribute
      // offset·Σid + Σ(j·id) where offset = cumk − k
      .withColumn("contrib", ($"cumk" - $"k") * $"s1" + $"sp")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum($"k").cast("long").as("n_tokens"),
        sum($"contrib").cast("long").as("id_checksum"))
  }

  /** The encode chain's DuckDB CTE body (words0 → words10 → vocab ids
    * → word stats → per-doc census `bdoc`) — shared by o273/o274. */
  private def bpeEncodeChainDuck: String = s"""
    $bpeWords0Sql,
    ${(1 to DeepBpeRounds).map(bpeRoundSql).mkString(",\n    ")},
    bvocab AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS id
      FROM (SELECT DISTINCT unnest(syms) AS tok FROM words$DeepBpeRounds)),
    bwpos AS (
      SELECT w, syms[j] AS tok, j FROM (
        SELECT w, syms, unnest(generate_series(1, len(syms))) AS j
        FROM words$DeepBpeRounds)),
    bwstat AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(id) AS BIGINT) AS s1,
        CAST(SUM(j * id) AS BIGINT) AS sp
      FROM bwpos JOIN bvocab USING (tok) GROUP BY w),
    bdw AS (
      SELECT doc_id, lang, wpos, t[wpos] AS w FROM (
        SELECT doc_id, lang, t,
          unnest(generate_series(1, len(t))) AS wpos
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
              FROM documents))
      WHERE t[wpos] <> ''),
    benc AS (
      SELECT d.doc_id, d.lang, s.k, s.s1, s.sp,
        SUM(s.k) OVER (PARTITION BY d.doc_id ORDER BY d.wpos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumk
      FROM bdw d JOIN bwstat s USING (w)),
    bdoc AS (
      SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(k) AS BIGINT) AS n_tokens,
        CAST(SUM((cumk - k) * s1 + sp) AS BIGINT) AS id_checksum
      FROM benc GROUP BY doc_id, lang)"""

  val o273: String = s"""
    WITH $bpeEncodeChainDuck
    SELECT doc_id, lang, n_words, n_tokens,
      CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
      id_checksum
    FROM bdoc"""

  // --------------------------------- packing over real BPE token ids
  /** q114's greedy sequence packing RESPELLED over the encoded corpus:
    * q114 packs q99's whitespace chunks (a proxy count); this packs
    * each document's REAL post-BPE token count into fixed
    * [[SeqBudget]]-token training sequences — per language in
    * deterministic doc_id order, a doc belonging to the sequence its
    * start offset falls in (greedy with boundary overflow, q114's
    * exact layout). The fill census is the one the data loader
    * validates; comparing it against q114's answers "how wrong was
    * the whitespace proxy?" (BPE fertility ≈ 1.2–1.5× shifts every
    * boundary).
    *
    * 100 TB design: the encode side is q273's (vocab-grain trainer +
    * one census join); the packing adds ONE lang-partitioned
    * running-sum window over DOC-grain rows (fewer rows than q114's
    * chunk grain) and a map-side-combined census. */
  val q274BpePack: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpeDocTokens(s, d)
      .withColumn("cum", sum(col("n_tokens")).over(w).cast("long"))
      .withColumn("seq_id",
        expr(s"(cum - n_tokens) div $SeqBudget").cast("long"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
      .withColumn("fill_pct",
        col("n_tokens").cast("double") * 100.0 / SeqBudget)
  }
  val o274: String = s"""
    WITH $bpeEncodeChainDuck,
    bcum AS (
      SELECT lang, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY lang
          ORDER BY doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM bdoc)
    SELECT lang,
      CAST((cum - n_tokens) // $SeqBudget AS BIGINT) AS seq_id,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(n_tokens) AS DOUBLE) * 100.0 / $SeqBudget AS fill_pct
    FROM bcum GROUP BY 1, 2"""

  // --------------------------- convergence-bounded BPE trainer
  /** Stop when the best remaining pair is rarer than this — the
    * "vocabulary is saturated" signal a production trainer uses
    * instead of a fixed round count. 2000 sits between the test
    * corpora's round-5 (~2.7k) and round-6 (~1.9k) peaks at
    * sf0.001/sf0.01 (early stop exercised) and below every sf0.1
    * count (the [[DeepBpeRounds]] cap branch exercised). */
  private val BpeMinMergeCount = 2000L

  /** q245's trainer under a CONVERGENCE loop: merge rounds run until
    * the best pair's count drops under [[BpeMinMergeCount]] (that
    * round learns nothing worth keeping and is not emitted) or the
    * [[DeepBpeRounds]] cap is hit. The stop decision reads ONE
    * materialized row per round on the driver — the q83 convergence-
    * count convention (a bounded scalar per iteration, never data).
    * The oracle runs the full fixed-round chain and keeps the
    * running-min-above-threshold prefix — by construction the exact
    * rows the adaptive loop emits, since both engines compute
    * identical per-round tops and the loop stops at the FIRST
    * below-threshold round.
    *
    * 100 TB design: q245's unchanged (vocab-grain rounds, broadcast
    * merge row, checkpointed flat lineage); convergence adds one
    * driver-side single-row read per round. */
  val q263BpeConvergedTrain: Q = (s, d) => {
    import s.implicits._
    val words0 = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select($"cnt", $"syms")
      .localCheckpoint(eager = false)
    var words = words0
    var lastTop: DataFrame = null
    val tops = Seq.newBuilder[DataFrame]
    var emitted = 0
    var converged = false
    var r = 1
    while (!converged && r <= DeepBpeRounds) {
      val top = bpePairCensus(words)
        .orderBy($"n".desc, $"mx".asc, $"my".asc).limit(1)
        .select(lit(r.toLong).as("round"), $"mx", $"my", $"n")
        .localCheckpoint(eager = false)
      lastTop = top
      // the convergence probe: one ≤1-row driver read per round
      val head = top.collect()
      if (head.isEmpty ||
          head(0).getAs[Long]("n") < BpeMinMergeCount) {
        converged = true
      } else {
        tops += top
        emitted += 1
        words = bpeApplyMerge(words, top, Seq("cnt", "syms"))
          .localCheckpoint(eager = false)
        r += 1
      }
    }
    val all =
      if (emitted > 0) tops.result().reduce(_ unionByName _)
      else lastTop.limit(0) // degenerate corpus: empty, right schema
    all.select($"round", $"mx", $"my",
      concat($"mx", $"my").as("merged"), $"n")
  }
  val o263: String = s"""
    WITH $bpeWords0Sql,
    ${(1 to DeepBpeRounds).map(bpeRoundSql).mkString(",\n    ")},
    allr AS (
      ${(1 to DeepBpeRounds).map(k =>
        s"SELECT round, mx, my, n FROM top$k")
        .mkString("\n      UNION ALL\n      ")}),
    pref AS (
      SELECT round, mx, my, n,
        MIN(n) OVER (ORDER BY round
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
      FROM allr)
    SELECT round, mx, my, mx || my AS merged, n
    FROM pref WHERE runmin >= $BpeMinMergeCount"""

  // --------------------------------- DSIR importance selection
  /** Data selection via importance resampling (DSIR, Xie et al. 2023,
    * arXiv:2302.03169) in the integer-bits spelling: tokens hash into
    * 256 feature buckets (character-fold mod prime, engine-identical),
    * bucket unigram LMs are estimated for the TARGET domain (lang='en'
    * here — the domain a pretraining run wants more of) and the RAW
    * corpus, and each document's importance weight is the sum over its
    * tokens of log2 p_target(b) − log2 p_raw(b). Logs are the
    * PIECEWISE-LINEAR log2 in 1/256-bit fixed point — exact integer
    * arithmetic (msb via `length(bin(n))`, mantissa via shift), add-1
    * smoothed, identical in both engines, max approximation error
    * 0.086 bits/token — so the weight is an exact int64
    * "target-likeness" with sub-bit resolution and no cross-engine
    * `ln` drift (the repo's standing rule; a plain floor-log2
    * quantizes uniform-ish 256-bucket LMs to all-zero weights — the
    * first cut of this query proved that empirically). Selection =
    * weight ≥ 0 (more target-like than raw); reported per source:
    * docs, selected, share, mean bits.
    *
    * 100 TB design: the per-token weight table is vocab-grain (token
    * census → 256-row bucket census → joined back at vocab grain), so
    * the occurrence stream takes ONE keyed join against it; bucket
    * LMs and totals are broadcast single rows; the final census is
    * map-side combined on |sources| keys. */
  /** Piecewise-linear log2 in 1/256-bit fixed point, exact int64 —
    * ilog256(x)/256 = (msb−1) + (mantissa−1) where mantissa−1 is the
    * 8-bit linear interpolation between powers of two; the chord of a
    * concave curve only UNDERESTIMATES, by at most
    * (1 − ln 2 · (1 + ln(1/ln 2)))/ln 2 ≈ 0.0861 bits, plus up to
    * 1/256 bits of fixed-point floor — ≈ 0.0900 bits total
    * (QueriesSpec pins the bound numerically). Spark dialect;
    * [[ilog256Duck]] is the DuckDB twin. Defined for x ≥ 1; x·256
    * must fit int64 (x < 2^55). */
  private[graft] def ilog256(x: String): String =
    s"""((length(bin($x)) - 1) * 256
        + ($x * 256) div shiftleft(CAST(1 AS BIGINT),
                                   length(bin($x)) - 1) - 256)"""

  /** DuckDB twin of [[ilog256]]. */
  private[graft] def ilog256Duck(x: String): String =
    s"""((length(bin($x)) - 1) * 256
        + ($x * 256) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1))
        - 256)"""

  /** The 256-bucket feature hash of a token expression `v` —
    * character fold mod prime, engine-identical (the DSIR hashed
    * n-gram feature). Shared by q241 (vocab grain) and the streaming
    * admission gate (in-row over intake tokens). */
  private[graft] def tokenBucket(v: String): String =
    s"""aggregate(transform(sequence(1, length($v)),
         i -> CAST(ascii(substring($v, i, 1)) AS BIGINT)),
         CAST(0 AS BIGINT),
         (a, c) -> (a * 131 + c) % 1000000007) % 256"""

  /** q241's occurrence stream: (doc_id, source, lang, token). */
  private def dsirOcc(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)

  /** Vocab-grain census with raw/target counts + feature bucket. */
  private def dsirTok(occ: DataFrame): DataFrame = occ
    .groupBy(col("w"))
    .agg(count(lit(1)).as("n_raw"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long")
        .as("n_tgt"))
    .withColumn("bucket", expr(tokenBucket("w")))

  /** The 256-row (bucket, w_bits) importance-weight table from a
    * [[dsirTok]] census — the trained DSIR model artifact the batch
    * tier persists and the streaming gate loads. */
  private def dsirWeightsFrom(tok: DataFrame): DataFrame = {
    val buckets = tok.groupBy(col("bucket"))
      .agg(sum(col("n_raw")).cast("long").as("c_raw"),
        sum(col("n_tgt")).cast("long").as("c_tgt"))
    val totals = buckets.agg(
      sum(col("c_raw")).cast("long").as("t_raw"),
      sum(col("c_tgt")).cast("long").as("t_tgt"))
    buckets.join(broadcast(totals))
      .select(col("bucket"),
        expr(s"""CAST((${ilog256("(c_tgt + 1)")} - ${ilog256("t_tgt")})
                  - (${ilog256("(c_raw + 1)")} - ${ilog256("t_raw")})
                 AS BIGINT)""").as("w_bits"))
  }

  /** [[dsirWeightsFrom]] end-to-end over a corpus dir — the batch
    * training pass the streaming DSIR gate's weights come from. */
  private[graft] def dsirBucketWeights(s: SparkSession,
                                       d: String): DataFrame =
    dsirWeightsFrom(dsirTok(dsirOcc(s, d)))

  /** Per-document DSIR importance weight (doc_id, source, doc_bits) —
    * the doc-grain frame q241 censuses per source and q257's funnel
    * applies as a selection gate. */
  private[graft] def dsirDocBits(s: SparkSession, d: String)
      : DataFrame = {
    // occ feeds the vocab census AND the final occurrence join; tok
    // feeds the bucket weights AND the scored-vocab join — each was
    // recomputed per consumer (two extra corpus scans + explodes per
    // embedding of this chain: q241, q257, q262, q271, writeRelease)
    val occ = dsirOcc(s, d).localCheckpoint(eager = false)
    val tok = dsirTok(occ).localCheckpoint(eager = false)
    val weights = dsirWeightsFrom(tok)
    val tokW = tok.join(broadcast(weights), Seq("bucket"))
      .select(col("w"), col("w_bits"))
    occ.join(tokW, Seq("w"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("w_bits")).cast("long").as("doc_bits"))
  }

  val q241DsirSelect: Q = (s, d) => {
    dsirDocBits(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_bits") >= 0, 1L).otherwise(0L)).cast("long")
          .as("n_sel"),
        sum(col("doc_bits")).cast("long").as("sum_bits"))
      .withColumn("sel_share",
        col("n_sel").cast("double") / col("n_docs").cast("double"))
      .withColumn("mean_bits",
        col("sum_bits").cast("double")
          / (col("n_docs").cast("double") * lit(256.0)))
  }
  /** o241's CTE chain (occ → … → doc at per-document grain),
    * parameterized on a CTE-name prefix so embedders (o257) can avoid
    * the DuckDB nested-WITH collision rule against o240/o250's inner
    * names. With p = "" this IS o241's chain. */
  private def dsirChainDuck(p: String): String = s"""
    ${p}occ AS (
      SELECT doc_id, source, lang, w
      FROM (SELECT doc_id, source, lang,
              unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE length(w) > 0),
    ${p}tok AS (
      SELECT w, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_tgt,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, length(w)),
              i -> CAST(unicode(w[i]) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 1000000007) % 256 AS bucket
      FROM ${p}occ GROUP BY w),
    ${p}buckets AS (
      SELECT bucket, CAST(SUM(n_raw) AS BIGINT) AS c_raw,
        CAST(SUM(n_tgt) AS BIGINT) AS c_tgt
      FROM ${p}tok GROUP BY bucket),
    ${p}tot AS (
      SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
        CAST(SUM(c_tgt) AS BIGINT) AS t_tgt
      FROM ${p}buckets),
    ${p}weights AS (
      SELECT bucket,
        CAST((${ilog256Duck("(c_tgt + 1)")} - ${ilog256Duck("t_tgt")})
          - (${ilog256Duck("(c_raw + 1)")} - ${ilog256Duck("t_raw")})
          AS BIGINT) AS w_bits
      FROM ${p}buckets, ${p}tot),
    ${p}tokw AS (
      SELECT w, w_bits FROM ${p}tok JOIN ${p}weights USING (bucket)),
    ${p}doc AS (
      SELECT doc_id, source,
        CAST(SUM(w_bits) AS BIGINT) AS doc_bits
      FROM ${p}occ JOIN ${p}tokw USING (w)
      GROUP BY doc_id, source)"""

  val o241: String = s"""
    WITH ${dsirChainDuck("")}
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN doc_bits >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_sel,
      CAST(SUM(doc_bits) AS BIGINT) AS sum_bits,
      CAST(SUM(CASE WHEN doc_bits >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS sel_share,
      CAST(SUM(doc_bits) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * 256.0) AS mean_bits
    FROM doc GROUP BY source"""

  // --------------------------------- Heaps-law vocabulary growth
  /** Heaps-law fit over the TRIGRAM stream: fit V(N) = k·N^β, where
    * N = cumulative trigram positions and V = cumulative distinct
    * trigram TYPES per 100-doc intake batch, by least squares in
    * log2-log2 space. β is the scaling-law input a tokenizer/dedup
    * plan reads (β in the Heaps range = healthy open phrase space; β
    * collapsing toward 0 = the corpus is replaying itself — the
    * type-growth face of q149's novelty decay; q247 sizes the
    * unigram vocab at TODAY's corpus, this extrapolates growth).
    * Trigram grain, not unigram: the synthetic corpus (like any
    * closed-vocabulary stream) saturates its unigram vocabulary in
    * the first batch — the UNIGRAM curve is the degenerate β=0 case,
    * while phrase types keep growing; the trigram spelling is
    * [[TriExpr]], shared with q240's LM.
    *
    * Exactness: cumulative V comes from the type FIRST-OCCURRENCE
    * census (min batch per type — never a cumulative distinct), and
    * both logs are [[ilog256]] fixed-point (exact int64, the q241
    * spelling), so the five OLS moments accumulate as exact
    * decimal(38,0) integer sums (q154's convention; x, y ≤ 2^14 so
    * every per-row product fits int64 trivially); β and log2 k are
    * then ONE identical IEEE expression per engine. The chord bias of
    * ilog256 (≤ 0.0901 bits, QueriesSpec-pinned) shifts x and y by a
    * near-constant sub-0.1-bit offset — harmless to a slope over
    * decades and identical in both engines.
    *
    * 100 TB design: ONE corpus scan+tokenize collapses to the
    * (batch, type)-grain census (map-side combined), from which BOTH
    * lanes derive — position counts by batch-sum, type firsts by
    * type-min — and is localCheckpointed (q251's convention) so its
    * two consumers never re-read the corpus; the tiny batch census is
    * checkpointed too (offsets and refinement both read it);
    * cumulatives ride q149's two-level prefix-sum layout (÷1024
    * super-batch offsets, per-super-batch windows — no census-scale
    * frame crosses a single-partition sort); the OLS is one
    * aggregate over batch-census rows. */
  val q252HeapsFit: Q = (s, d) => {
    import s.implicits._
    val bt = Tables.documents(s, d)
      .withColumn("t", split($"text", " "))
      .select(expr("doc_id div 100").as("batch"), $"t",
        explode(expr("sequence(1, greatest(size(t) - 2, 1))")).as("i"))
      .filter($"i" + 2 <= size($"t"))
      .select($"batch",
        concat_ws(" ", element_at($"t", $"i"),
          element_at($"t", $"i" + 1), element_at($"t", $"i" + 2))
          .as("term"))
      .groupBy($"batch", $"term")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // feeds BOTH lanes: position sums + firsts
    val newV = bt.groupBy($"term")
      .agg(min($"batch").as("batch"))
      .groupBy($"batch").agg(count(lit(1)).as("n_new"))
    val census = bt.groupBy($"batch")
      .agg(sum($"cnt").cast("long").as("n_tok"))
      .join(newV, Seq("batch"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("sup", expr("batch div 1024"))
      .localCheckpoint(eager = false)
    val offsets = census.groupBy($"sup")
      .agg(sum($"n_tok").as("st"), sum($"n_new").as("sv"))
      .withColumn("tok_off",
        (sum($"st").over(Window.orderBy($"sup".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - $"st").cast("long"))
      .withColumn("voc_off",
        (sum($"sv").over(Window.orderBy($"sup".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - $"sv").cast("long"))
      .select($"sup", $"tok_off", $"voc_off")
    val wb = Window.partitionBy($"sup").orderBy($"batch".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = census.join(broadcast(offsets), Seq("sup"))
      .withColumn("cum_tok",
        ($"tok_off" + sum($"n_tok").over(wb)).cast("long"))
      .withColumn("cum_voc",
        ($"voc_off" + sum($"n_new").over(wb)).cast("long"))
      .select(expr(ilog256("cum_tok")).cast("long").as("x"),
        expr(ilog256("cum_voc")).cast("long").as("y"))
    pts.agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x".cast("decimal(38,0)")).cast("double").as("sx"),
      sum($"y".cast("decimal(38,0)")).cast("double").as("sy"),
      sum(($"x" * $"y").cast("decimal(38,0)")).cast("double").as("sxy"),
      sum(($"x" * $"x").cast("decimal(38,0)")).cast("double").as("sxx"))
      .select($"n".cast("long").as("n_batches"),
        when($"n" * $"sxx" - $"sx" * $"sx" > 0.0,
          ($"n" * $"sxy" - $"sx" * $"sy")
            / ($"n" * $"sxx" - $"sx" * $"sx")).as("beta"),
        when($"n" * $"sxx" - $"sx" * $"sx" > 0.0,
          ($"sy" - ($"n" * $"sxy" - $"sx" * $"sy")
              / ($"n" * $"sxx" - $"sx" * $"sx") * $"sx")
            / ($"n" * lit(256.0))).as("log2_k"))
  }
  val o252: String = s"""
    WITH toks AS (
      SELECT doc_id // 100 AS batch, string_split(text, ' ') AS t
      FROM documents),
    occ AS (
      SELECT batch, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS term
      FROM (SELECT batch, t, unnest(generate_series(1, len(t) - 2))
              AS i
            FROM toks)),
    first_b AS (
      SELECT term, MIN(batch) AS batch FROM occ GROUP BY term),
    new_v AS (
      SELECT batch, COUNT(*) AS n_new FROM first_b GROUP BY batch),
    census AS (
      SELECT t.batch, t.n_tok, COALESCE(v.n_new, 0) AS n_new
      FROM (SELECT batch, COUNT(*) AS n_tok FROM occ GROUP BY batch) t
      LEFT JOIN new_v v USING (batch)),
    pts0 AS (
      SELECT
        CAST(SUM(n_tok) OVER (ORDER BY batch ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_tok,
        CAST(SUM(n_new) OVER (ORDER BY batch ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_voc
      FROM census),
    xy AS (
      SELECT CAST(${ilog256Duck("cum_tok")} AS BIGINT) AS x,
             CAST(${ilog256Duck("cum_voc")} AS BIGINT) AS y
      FROM pts0),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx
      FROM xy)
    SELECT CAST(n AS BIGINT) AS n_batches,
      CASE WHEN n * sxx - sx * sx > 0.0
        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS beta,
      CASE WHEN n * sxx - sx * sx > 0.0
        THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
          / (n * 256.0) END AS log2_k
    FROM m"""

  // ------------------------- Naive-Bayes quality classifier
  /** The fixed-point label threshold (quality × 1e6) splitting the
    * corpus into balanced high/low classes at every SF (measured:
    * ~49% positive at sf0.001/0.01/0.1). */
  private val NbLabelThreshold = 420000L

  /** Model-based quality classification, trained in-engine: a
    * multinomial Naive Bayes classifier (the fastText/logistic-gate
    * shape GPT-3/PaLM-style pipelines use to keep "looks like quality
    * text") is TRAINED on q105's train split against a deterministic
    * quality label (the q51 composite, thresholded at
    * [[NbLabelThreshold]] for class balance), then applied to all
    * three splits; the output is the per-split confusion census —
    * held-out val/test rows measure generalization, the train row
    * measures fit. This is the third standard curation gate next to
    * q250 (generative LM perplexity) and q241 (importance reweighting):
    * a DISCRIMINATIVE classifier with explicit labels.
    *
    * Exactness: all log-probabilities are [[ilog256]] fixed-point
    * (exact int64 bits×256, the q241 convention) with Laplace
    * smoothing — per token w the class-evidence is
    * (ilog(n1+1) − ilog(T1+V)) − (ilog(n0+1) − ilog(T0+V)), per doc
    * the occurrence-sum plus the prior ilog(D1) − ilog(D0), predict
    * positive iff total ≥ 0. ilog256's chord bias (≤ 0.0901 bits,
    * QueriesSpec-pinned) shifts every term identically in both
    * engines; no runtime log anywhere. Per-token bits ≤ ~2·55·256 so
    * a 2^40-token document stays far inside int64.
    *
    * 100 TB design: classification resolves at VOCABULARY grain — the
    * train token census (map-side combined) is scored once against
    * two single-row broadcast censuses (token totals + doc priors),
    * and the occurrence stream takes exactly ONE keyed join against
    * the scored vocabulary (q240's move); the confusion census is a
    * 3-row aggregate. No windows, no distinct aggregates, nothing
    * quadratic. */
  /** Per-document NB evidence (doc_id, split, y, bits): total
    * classifier log-odds = Σ occurrence w_bits + the class prior, in
    * 1/256-bit fixed point — the trained-model application pass.
    * Shared by q264 (threshold-at-0 confusion census) and q268
    * (calibration curve over the evidence itself). */
  private def nbDocBits(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("split", splitAssign(col("doc_id")))
      .withColumn("y",
        when(floor(TextOps.qualityCol * lit(1.0e6)).cast("long")
          >= NbLabelThreshold, 1L).otherwise(0L))
    val occ = docs
      .select(col("doc_id"), col("split"), col("y"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      // three consumers (train census, vocab distinct, evidence join)
      // — uncheckpointed, each re-scanned the corpus and re-evaluated
      // the per-doc quality label (lazy, round-12)
      .localCheckpoint(eager = false)
    val tok = occ.filter(col("split") === "train")
      .groupBy(col("w"))
      .agg(sum(col("y")).cast("long").as("n1"),
        sum(lit(1L) - col("y")).cast("long").as("n0"))
    val tots = tok.agg(count(lit(1)).cast("long").as("v"),
      sum(col("n1")).cast("long").as("t1"),
      sum(col("n0")).cast("long").as("t0"))
    val prior = docs.filter(col("split") === "train")
      .agg(sum(col("y")).cast("long").as("d1"),
        sum(lit(1L) - col("y")).cast("long").as("d0"))
    val scoredTok = occ.select(col("w")).distinct()
      .join(tok, Seq("w"), "left")
      .na.fill(0L, Seq("n1", "n0"))
      .join(broadcast(tots))
      .withColumn("w_bits", expr(
        s"""CAST(((${ilog256("(n1 + 1)")} - ${ilog256("(t1 + v)")})
              - (${ilog256("(n0 + 1)")} - ${ilog256("(t0 + v)")}))
            AS BIGINT)"""))
      .select(col("w"), col("w_bits"))
    occ.join(scoredTok, Seq("w"))
      .groupBy(col("doc_id"), col("split"), col("y"))
      .agg(sum(col("w_bits")).cast("long").as("sum_bits"))
      .join(broadcast(prior))
      .withColumn("bits", col("sum_bits")
        + expr(s"CAST((${ilog256("d1")} - ${ilog256("d0")}) AS BIGINT)"))
      .select(col("doc_id"), col("split"), col("y"), col("bits"))
  }

  /** HASHED-VOCAB NB model for the streaming admission gate — q264's
    * trainer respelled over the 256-bucket [[tokenBucket]] feature
    * hash instead of the word vocabulary, so the trained model is a
    * CONSTANT-size artifact (≤ 257 rows: bucket weights + the prior
    * at bucket = −1) that the online gate can collapse to a literal
    * array at wiring time — the dsirBucketWeights pattern. No
    * stateful vocab join ever reaches the stream (the round-8 ROADMAP
    * seam (a) trade, resolved toward hashing). Smoothing runs over
    * the FIXED 256-bucket domain (v = 256 — another stateless
    * property: no distinct-vocab count). Collisions blur word
    * evidence into bucket evidence — the standard hashing-trick
    * trade; the word-grain q264 stays the offline-quality reference.
    *
    * The weight table is DENSE over the full 0..255 domain (train
    * census left-joined onto `range(256)`, zero-filled counts): a
    * bucket unseen in train still carries its SMOOTHED weight
    * ilog(1)−ilog(t1+256) − (ilog(1)−ilog(t0+256)) — which is 0 only
    * when the class token masses coincide, so it must come from the
    * model, not from a gate-side default. (An earlier cut emitted
    * only seen buckets and claimed unseen ⇒ 0; that made the gate
    * diverge from the NB formula by a class-balance-dependent
    * constant per unseen-bucket token — round-9 ADVICE.) The gate's
    * missing-bucket fallback is now unreachable by construction.
    *
    * 100 TB design: one train-split scan collapses to the 256-bucket
    * census (map-side combined); everything after is 256-row
    * arithmetic against one broadcast totals row. */
  def nbHashedWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("split", splitAssign(col("doc_id")))
      .withColumn("y",
        when(floor(TextOps.qualityCol * lit(1.0e6)).cast("long")
          >= NbLabelThreshold, 1L).otherwise(0L))
      .filter(col("split") === "train")
    val occ = docs
      .select(col("y"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("bucket", expr(tokenBucket("w")).cast("long"))
    val seen = occ.groupBy(col("bucket"))
      .agg(sum(col("y")).cast("long").as("n1"),
        sum(lit(1L) - col("y")).cast("long").as("n0"))
    // dense 0..255 domain: unseen buckets get (n1, n0) = (0, 0) so
    // the smoothed weight formula covers them too (docstring)
    val tok = s.range(0L, 256L).select(col("id").as("bucket"))
      .join(seen, Seq("bucket"), "left")
      .na.fill(0L, Seq("n1", "n0"))
    val tots = tok.agg(sum(col("n1")).cast("long").as("t1"),
      sum(col("n0")).cast("long").as("t0"))
    val prior = docs
      .agg(sum(col("y")).cast("long").as("d1"),
        sum(lit(1L) - col("y")).cast("long").as("d0"))
      .select(lit(-1L).as("bucket"), expr(
        s"CAST((${ilog256("d1")} - ${ilog256("d0")}) AS BIGINT)")
        .as("w_bits"))
    tok.join(broadcast(tots))
      .select(col("bucket"), expr(
        s"""CAST(((${ilog256("(n1 + 1)")} - ${ilog256("(t1 + 256)")})
              - (${ilog256("(n0 + 1)")} - ${ilog256("(t0 + 256)")}))
            AS BIGINT)""").as("w_bits"))
      .unionByName(prior)
  }

  val q264NbQualityClassifier: Q = (s, d) => {
    nbDocBits(s, d)
      .withColumn("pred", when(col("bits") >= 0L, 1L).otherwise(0L))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).cast("long").as("n_label_pos"),
        sum(col("pred")).cast("long").as("n_pred_pos"),
        sum(when(col("y") === 1L && col("pred") === 1L, 1L)
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("y") === 0L && col("pred") === 0L, 1L)
          .otherwise(0L)).cast("long").as("tn"),
        sum(when(col("y") === 0L && col("pred") === 1L, 1L)
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("y") === 1L && col("pred") === 0L, 1L)
          .otherwise(0L)).cast("long").as("fn"))
      .withColumn("accuracy", (col("tp") + col("tn")).cast("double")
        / col("n_docs").cast("double"))
  }
  /** o264's CTE chain through per-doc NB evidence (${p}nbbits:
    * doc_id, split, y, bits), parameterized on a prefix for embedders
    * — the dsirChainDuck pattern. With p = "" this is o264's chain;
    * o268 reads the same nbbits frame. */
  private def nbChainDuck(p: String): String = s"""
    ${p}nbd AS (
      SELECT doc_id, text,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        CASE WHEN CAST(FLOOR((${TextOps.qualitySql}) * 1.0e6) AS BIGINT)
               >= $NbLabelThreshold THEN 1 ELSE 0 END AS y
      FROM (SELECT *, (((doc_id % 1000000007) * 2654435761 + 5851)
              % 1000000007) % 100 AS b FROM documents)),
    ${p}nbocc AS (
      SELECT doc_id, split, y, w FROM (
        SELECT doc_id, split, y, unnest(string_split(text, ' ')) AS w
        FROM ${p}nbd)
      WHERE length(w) > 0),
    ${p}nbtok AS (
      SELECT w, CAST(SUM(y) AS BIGINT) AS n1,
        CAST(SUM(1 - y) AS BIGINT) AS n0
      FROM ${p}nbocc WHERE split = 'train' GROUP BY w),
    ${p}nbtot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
        CAST(SUM(n1) AS BIGINT) AS t1,
        CAST(SUM(n0) AS BIGINT) AS t0 FROM ${p}nbtok),
    ${p}nbprior AS (
      SELECT CAST(SUM(y) AS BIGINT) AS d1,
        CAST(SUM(1 - y) AS BIGINT) AS d0
      FROM ${p}nbd WHERE split = 'train'),
    ${p}nbsc AS (
      SELECT w, CAST(((${ilog256Duck("(n1 + 1)")}
            - ${ilog256Duck("(t1 + v)")})
          - (${ilog256Duck("(n0 + 1)")} - ${ilog256Duck("(t0 + v)")}))
        AS BIGINT) AS w_bits
      FROM (SELECT g.w, COALESCE(k.n1, 0) AS n1, COALESCE(k.n0, 0) AS n0
            FROM (SELECT DISTINCT w FROM ${p}nbocc) g
            LEFT JOIN ${p}nbtok k USING (w))
      CROSS JOIN ${p}nbtot),
    ${p}nbdoc AS (
      SELECT doc_id, split, y, CAST(SUM(w_bits) AS BIGINT) AS sum_bits
      FROM ${p}nbocc JOIN ${p}nbsc USING (w) GROUP BY 1, 2, 3),
    ${p}nbbits AS (
      SELECT doc_id, split, y, sum_bits
          + CAST((${ilog256Duck("d1")} - ${ilog256Duck("d0")}) AS BIGINT)
          AS bits
      FROM ${p}nbdoc CROSS JOIN ${p}nbprior)"""

  val o264: String = s"""
    WITH ${nbChainDuck("")},
    nbpred AS (
      SELECT split, y,
        CASE WHEN bits >= 0 THEN 1 ELSE 0 END AS pred
      FROM nbbits)
    SELECT split, COUNT(*) AS n_docs,
      CAST(SUM(y) AS BIGINT) AS n_label_pos,
      CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
      CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS tp,
      CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS tn,
      CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS fp,
      CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS fn,
      CAST(SUM(CASE WHEN y = pred THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM nbpred GROUP BY split"""

  // ------------------------------- NB calibration curve
  /** Reliability diagram of the q264 classifier: documents bucketed
    * by their NB log-odds EVIDENCE (quarter-bit-wide buckets — 64
    * units of bits×256 — clamped to [−8, 8], a bounded 17-bucket
    * domain at any corpus size; Laplace smoothing over a shared
    * vocabulary keeps per-doc evidence to a few bits, so quarter-bit
    * resolution is what resolves the curve) and censused per
    * (split, bucket) with the empirical
    * positive rate and mean evidence. A gate threshold is only as
    * good as the score's calibration — a monotone pos_rate curve says
    * the evidence ORDERING is informative (so a tighter/looser
    * threshold trades precision for recall predictably); a flat curve
    * says the NB gate adds nothing over its prior. The held-out
    * val/test curves are the ones that matter (train's curve measures
    * fit).
    *
    * Both-engine gotcha baked in: the bucket floor-divides a possibly
    * NEGATIVE evidence, and Spark `div` truncates toward zero while
    * DuckDB `//` floors — the +2^40 offset (subtracted back as
    * 2^40/64 after the divide, exact because 64 | 2^40) keeps the
    * operand positive so both engines floor identically (the
    * q231/q233 division-dialect rule). |bits| < 2^40 holds to
    * ~40M-token documents at the worst per-token weight.
    *
    * 100 TB design: rides [[nbDocBits]]'s vocab-grain layout; the
    * curve itself is a (3 splits × 17 buckets)-row aggregate with
    * decimal-routed evidence sums. */
  val q268NbCalibration: Q = (s, d) => {
    nbDocBits(s, d)
      .withColumn("bucket",
        greatest(lit(-8L), least(lit(8L),
          expr("(bits + 1099511627776) div 64") - lit(17179869184L))))
      .groupBy(col("split"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).cast("long").as("n_pos"),
        sum(col("bits").cast("decimal(38,0)")).as("bits_dec"))
      .select(col("split"), col("bucket"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("pos_rate"),
        (col("bits_dec").cast("double")
          / (col("n_docs").cast("double") * lit(256.0)))
          .as("mean_bits"))
  }
  val o268: String = s"""
    WITH ${nbChainDuck("")}
    SELECT split, bucket, n_docs, n_pos,
      CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pos_rate,
      CAST(bits_dec AS DOUBLE)
        / (CAST(n_docs AS DOUBLE) * 256.0) AS mean_bits
    FROM (
      SELECT split,
        GREATEST(-8, LEAST(8,
          (bits + 1099511627776) // 64 - 17179869184)) AS bucket,
        COUNT(*) AS n_docs, CAST(SUM(y) AS BIGINT) AS n_pos,
        CAST(SUM(CAST(bits AS HUGEINT)) AS HUGEINT) AS bits_dec
      FROM nbbits GROUP BY 1, 2)"""

  // ------------------------------- NB ROC / threshold sweep
  /** ROC sweep of the q264 classifier: cumulative TPR/FPR/precision at
    * every evidence threshold, per split — the operating-point menu a
    * pipeline reads before PICKING the gate's cut (q264 reports the
    * bits ≥ 0 point; q268 says the score is calibrated; this says what
    * every other threshold would buy). Thresholds are q268's
    * quarter-bit buckets: "predict positive iff bucket ≥ thr" for each
    * observed bucket value, so tp/fp at a row are the counts at or
    * above that row's bucket. youden_j = tpr − fpr is the standard
    * threshold-selection score (its argmax is the balanced operating
    * point).
    *
    * 100 TB design: rides [[nbDocBits]]'s vocab-grain layout down to
    * the same (split × ≤17 buckets) census as q268; the cumulative
    * sums are windows PARTITIONED by split over ≤17-row partitions
    * (never a global window), so the whole sweep adds one
    * census-grain shuffle to q268's plan. */
  val q272NbRocSweep: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cens = nbDocBits(s, d)
      .withColumn("thr",
        greatest(lit(-8L), least(lit(8L),
          expr("(bits + 1099511627776) div 64") - lit(17179869184L))))
      .groupBy(col("split"), col("thr"))
      .agg(sum(col("y")).cast("long").as("n_pos"),
        sum(lit(1L) - col("y")).cast("long").as("n_neg"))
    val wCum = Window.partitionBy(col("split"))
      .orderBy(col("thr").desc)
    val wTot = Window.partitionBy(col("split"))
    cens
      .withColumn("tp", sum(col("n_pos")).over(wCum).cast("long"))
      .withColumn("fp", sum(col("n_neg")).over(wCum).cast("long"))
      .withColumn("pos", sum(col("n_pos")).over(wTot).cast("long"))
      .withColumn("neg", sum(col("n_neg")).over(wTot).cast("long"))
      .select(col("split"), col("thr"), col("tp"), col("fp"),
        when(col("pos") > 0L,
          col("tp").cast("double") / col("pos").cast("double"))
          .as("tpr"),
        when(col("neg") > 0L,
          col("fp").cast("double") / col("neg").cast("double"))
          .as("fpr"),
        // tp + fp ≥ the row's own bucket count ≥ 1, so no zero guard
        (col("tp").cast("double")
          / (col("tp") + col("fp")).cast("double")).as("prec"),
        when(col("pos") > 0L && col("neg") > 0L,
          col("tp").cast("double") / col("pos").cast("double")
            - col("fp").cast("double") / col("neg").cast("double"))
          .as("youden_j"))
  }
  val o272: String = s"""
    WITH ${nbChainDuck("")},
    rcens AS (
      SELECT split,
        GREATEST(-8, LEAST(8,
          (bits + 1099511627776) // 64 - 17179869184)) AS thr,
        CAST(SUM(y) AS BIGINT) AS n_pos,
        CAST(SUM(1 - y) AS BIGINT) AS n_neg
      FROM nbbits GROUP BY 1, 2),
    rcum AS (
      SELECT split, thr,
        CAST(SUM(n_pos) OVER (PARTITION BY split ORDER BY thr DESC)
          AS BIGINT) AS tp,
        CAST(SUM(n_neg) OVER (PARTITION BY split ORDER BY thr DESC)
          AS BIGINT) AS fp,
        CAST(SUM(n_pos) OVER (PARTITION BY split) AS BIGINT) AS pos,
        CAST(SUM(n_neg) OVER (PARTITION BY split) AS BIGINT) AS neg
      FROM rcens)
    SELECT split, thr, tp, fp,
      CASE WHEN pos > 0
        THEN CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) END AS tpr,
      CASE WHEN neg > 0
        THEN CAST(fp AS DOUBLE) / CAST(neg AS DOUBLE) END AS fpr,
      CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS prec,
      CASE WHEN pos > 0 AND neg > 0
        THEN CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)
           - CAST(fp AS DOUBLE) / CAST(neg AS DOUBLE) END AS youden_j
    FROM rcum"""

  // ------------------------------- gate-agreement audit
  /** Pairwise Cohen's kappa between the three quality gates the
    * engine now trains or applies — the heuristic RULE (the q51
    * composite at the q264 label threshold), the discriminative NB
    * verdict (q264, evidence ≥ 0), and the generative LM tertile cut
    * (q250, `kept`) — the "are my filters redundant or
    * complementary?" audit a pipeline runs before stacking gates:
    * κ ≈ 1 means the second gate adds nothing; κ ≈ 0 means the gates
    * see different documents (stacking multiplies the cut); κ < 0
    * means they actively disagree (investigate before shipping
    * either). Same chance-corrected statistic as q181's annotator
    * audit, here over gate verdicts. Docs outside the LM gate's
    * scope (no trigram evidence) count as kept — q257's abstention
    * convention, shared so the verdicts compose identically.
    *
    * Float parity: κ = (p_obs − p_exp)/(1 − p_exp) from exact-count
    * divisions in pinned order, one guard on the p_exp = 1
    * degenerate; all counts from ONE conditional aggregate over the
    * doc-grain verdict frame.
    *
    * 100 TB design: rides [[nbDocBits]] (vocab-grain) and q250 (its
    * own two-level layout) joined at doc grain; the agreement census
    * is one aggregate collapsing to a single row, stacked to 3 pair
    * rows. */
  val q269GateAgreement: Q = (s, d) => {
    val nb = nbDocBits(s, d)
      .select(col("doc_id"), (col("y") === 1L).as("rule"),
        (col("bits") >= 0L).as("nb"))
    val lm = q250PplGate(s, d)
      .select(col("doc_id"), col("kept").as("lm"))
    val flags = nb.join(lm, Seq("doc_id"), "left")
      .withColumn("lm", coalesce(col("lm"), lit(true)))
    val agg = flags.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("rule"), 1L).otherwise(0L)).cast("long").as("c_rule"),
      sum(when(col("nb"), 1L).otherwise(0L)).cast("long").as("c_nb"),
      sum(when(col("lm"), 1L).otherwise(0L)).cast("long").as("c_lm"),
      sum(when(col("rule") && col("nb"), 1L).otherwise(0L))
        .cast("long").as("rb11"),
      sum(when(!col("rule") && !col("nb"), 1L).otherwise(0L))
        .cast("long").as("rb00"),
      sum(when(col("rule") && col("lm"), 1L).otherwise(0L))
        .cast("long").as("rl11"),
      sum(when(!col("rule") && !col("lm"), 1L).otherwise(0L))
        .cast("long").as("rl00"),
      sum(when(col("nb") && col("lm"), 1L).otherwise(0L))
        .cast("long").as("bl11"),
      sum(when(!col("nb") && !col("lm"), 1L).otherwise(0L))
        .cast("long").as("bl00"))
    agg.select(expr("""stack(3,
        'rule', 'nb', c_rule, c_nb, rb11, rb00,
        'rule', 'lm', c_rule, c_lm, rl11, rl00,
        'nb',   'lm', c_nb,   c_lm, bl11, bl00)
        AS (gate_a, gate_b, ca, cb, n11, n00)"""), col("n"))
      .withColumn("p_obs", (col("n11") + col("n00")).cast("double")
        / col("n").cast("double"))
      .withColumn("p_exp",
        (col("ca").cast("double") / col("n").cast("double"))
          * (col("cb").cast("double") / col("n").cast("double"))
        + (lit(1.0) - col("ca").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("cb").cast("double") / col("n").cast("double")))
      .select(col("gate_a"), col("gate_b"), col("n"),
        col("p_obs"), col("p_exp"),
        when(lit(1.0) - col("p_exp") =!= 0.0,
          (col("p_obs") - col("p_exp")) / (lit(1.0) - col("p_exp")))
          .as("kappa"))
  }
  val o269: String = s"""
    WITH ${nbChainDuck("")},
    ppl AS (${o250}),
    gfl AS (
      SELECT b.doc_id,
        CASE WHEN b.y = 1 THEN 1 ELSE 0 END AS rule,
        CASE WHEN b.bits >= 0 THEN 1 ELSE 0 END AS nb,
        CASE WHEN p.doc_id IS NULL OR p.kept THEN 1 ELSE 0 END AS lm
      FROM nbbits b LEFT JOIN ppl p ON p.doc_id = b.doc_id),
    gagg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(rule) AS BIGINT) AS c_rule,
        CAST(SUM(nb) AS BIGINT) AS c_nb,
        CAST(SUM(lm) AS BIGINT) AS c_lm,
        CAST(SUM(CASE WHEN rule = 1 AND nb = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS rb11,
        CAST(SUM(CASE WHEN rule = 0 AND nb = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS rb00,
        CAST(SUM(CASE WHEN rule = 1 AND lm = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS rl11,
        CAST(SUM(CASE WHEN rule = 0 AND lm = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS rl00,
        CAST(SUM(CASE WHEN nb = 1 AND lm = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS bl11,
        CAST(SUM(CASE WHEN nb = 0 AND lm = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS bl00
      FROM gfl),
    gpairs AS (
      SELECT 'rule' AS gate_a, 'nb' AS gate_b, n,
        c_rule AS ca, c_nb AS cb, rb11 AS n11, rb00 AS n00 FROM gagg
      UNION ALL SELECT 'rule', 'lm', n, c_rule, c_lm, rl11, rl00
      FROM gagg
      UNION ALL SELECT 'nb', 'lm', n, c_nb, c_lm, bl11, bl00
      FROM gagg)
    SELECT gate_a, gate_b, n, p_obs, p_exp,
      CASE WHEN 1.0 - p_exp <> 0.0
        THEN (p_obs - p_exp) / (1.0 - p_exp) END AS kappa
    FROM (
      SELECT gate_a, gate_b, n,
        CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS p_obs,
        (CAST(ca AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
        + (1.0 - CAST(ca AS DOUBLE) / CAST(n AS DOUBLE))
          * (1.0 - CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) AS p_exp
      FROM gpairs)"""

  // ------------------------------- data-constrained epoch allocation
  /** Data-constrained epoch math (the Muennighoff et al. 2023
    * operational face): allocate a fixed training-token budget across
    * sources by q246's post-curation temperature mixture and report
    * how many EPOCHS of each source's unique effective tokens that
    * allocation implies — with the >4-epoch flag where repetition is
    * past the measured value knee (repeating data helps to ~4 epochs,
    * then decays). The budget is 3× the corpus's total effective
    * tokens (a documented constant — training well past one epoch is
    * the data-constrained regime this audit exists for), so
    * upweighted sources genuinely cross integer epoch counts at
    * every SF.
    *
    * 100 TB design: everything derives from q246's per-source census
    * (its own scale story at its definition), localCheckpointed once
    * so the report and the budget scalar never re-run the gate chain
    * (the q262 inline lesson); the report is a |sources|-row frame
    * against one broadcast scalar. */
  val q270EpochAllocation: Q = (s, d) =>
    epochAllocFrom(
      q246EffectiveMixture(s, d).localCheckpoint(eager = false))

  /** The epoch-allocation math over ANY (source, t_eff, share_eff)
    * census — q270 applies it to q246's mixture; EpochFixtureSpec
    * drives it with a hand-built SKEWED census (one source upweighted
    * far past its unique mass) to exercise the >4-epoch `over_cap`
    * branch, which this near-uniform testdata mixture never fires —
    * the round-8 verdict's "logic oracle-checked, interesting branch
    * unexercised" seam. */
  def epochAllocFrom(mix: DataFrame): DataFrame = {
    val tot = mix.agg(sum(col("t_eff")).cast("long").as("tot_eff"))
    mix.join(broadcast(tot))
      .withColumn("budget", col("tot_eff") * lit(3L))
      .withColumn("alloc_tokens",
        floor(col("budget").cast("double") * col("share_eff"))
          .cast("long"))
      .withColumn("epochs", when(col("t_eff") > 0L,
        col("alloc_tokens").cast("double") / col("t_eff").cast("double")))
      .withColumn("over_cap",
        coalesce(col("epochs") > lit(4.0), lit(false)))
      .select(col("source"), col("t_eff"), col("share_eff"),
        col("budget"), col("alloc_tokens"), col("epochs"),
        col("over_cap"))
  }
  val o270: String = s"""
    WITH mix AS (${o246}),
    etot AS (SELECT CAST(SUM(t_eff) AS BIGINT) AS tot_eff FROM mix)
    SELECT source, t_eff, share_eff,
      tot_eff * 3 AS budget,
      CAST(FLOOR(CAST(tot_eff * 3 AS DOUBLE) * share_eff) AS BIGINT)
        AS alloc_tokens,
      CASE WHEN t_eff > 0
        THEN CAST(CAST(FLOOR(CAST(tot_eff * 3 AS DOUBLE) * share_eff)
            AS BIGINT) AS DOUBLE) / CAST(t_eff AS DOUBLE) END
        AS epochs,
      COALESCE(CASE WHEN t_eff > 0
        THEN CAST(CAST(FLOOR(CAST(tot_eff * 3 AS DOUBLE) * share_eff)
            AS BIGINT) AS DOUBLE) / CAST(t_eff AS DOUBLE) END > 4.0,
        FALSE) AS over_cap
    FROM mix CROSS JOIN etot"""

  // ------------------------------- shard source-mixing audit
  /** Within-shard source-mixing audit over the q262 release: for each
    * (split, shard) and two READING ORDERS — ingestion (doc_id) and
    * length-sorted (q261's padding-optimal batching order) — the
    * share of ADJACENT document pairs drawn from the same source,
    * next to the expectation under perfect shuffling
    * (Σ c_s·(c_s−1) / (n·(n−1)) from the shard's own source counts).
    * mixing_ratio = observed/expected: ≈1 means the order is as
    * mixed as random, ≫1 means same-source clumping (gradient
    * batches see correlated text — the cost side of the
    * padding-vs-mixing trade q261 prices the other side of).
    *
    * 100 TB design: within-shard positions ride
    * [[Relational.twoLevelRank]] PARTITIONED by (split, shard) —
    * never a census-scale window; adjacency is ONE keyed self-join
    * on (split, shard, pos−1); both order lanes and the expectation
    * derive from one checkpointed assignment frame (which itself
    * checkpoints q262's gate composite). The oracle uses naive
    * per-shard LAG windows as the independent witness. */
  val q271ShardMixing: Q = (s, d) => {
    import s.implicits._
    val src = Tables.documents(s, d).select($"doc_id", $"source")
    // LAZY checkpoints (round-12 gate-chain fold): an eager
    // localCheckpoint runs a dedicated materialization job per site —
    // on this 11-checkpoint cascade that was ~76 AQE stage-jobs of
    // ~50-90 ms scheduling each. eager=false keeps the same
    // materialize-once reuse (the first consuming job persists every
    // partition; lineage truncates after) without the extra job.
    val asg = releaseAssignments(s, d).join(src, Seq("doc_id"))
      .localCheckpoint(eager = false) // two order lanes + expectation
    // 0-pair shards anchor (both lanes): NOT checkpointed — the
    // distinct's exchange appears twice in the one final plan and AQE
    // ReuseExchange dedupes it; a checkpoint here was a pure extra job
    val shards = asg.select($"split", $"shard").distinct()
    // BOTH order lanes' positions come off ONE checkpointed frame
    // (two chained twoLevelRank passes) instead of a per-lane
    // checkpoint each — one materialization, and the two adjacency
    // joins below read the same in-memory rows
    val pos2 = Relational.twoLevelRank(
        Relational.twoLevelRank(asg, "doc_id", "doc_id", asc = true,
          partCols = Seq("split", "shard"), rankCol = "pos_id"),
        "ntok", "doc_id", asc = true,
        partCols = Seq("split", "shard"), rankCol = "pos_len")
      .select($"split", $"shard", $"pos_id", $"pos_len", $"source")
      .localCheckpoint(eager = false)
    def lane(posCol: String, name: String): DataFrame = {
      val pos = pos2.select($"split", $"shard",
        col(posCol).as("pos"), $"source")
      val nxt = pos.select($"split", $"shard",
        ($"pos" - 1L).as("pos"), $"source".as("next_source"))
      val pairs = pos.join(nxt, Seq("split", "shard", "pos"))
        .groupBy($"split", $"shard")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when($"source" === $"next_source", 1L).otherwise(0L))
            .cast("long").as("n_same"))
      // a 1-doc shard has NO adjacent pair rows — anchor on the shard
      // frame so it still reports (0, 0), as the oracle's LAG does
      shards.join(pairs, Seq("split", "shard"), "left")
        .na.fill(0L, Seq("n_pairs", "n_same"))
        .withColumn("order_by", lit(name))
    }
    val exp = asg.groupBy($"split", $"shard", $"source")
      .agg(count(lit(1)).as("c"))
      .groupBy($"split", $"shard")
      .agg(sum($"c").cast("long").as("n_docs"),
        sum($"c" * ($"c" - 1L)).cast("long").as("same_mass"))
      .withColumn("exp_share", when($"n_docs" > 1L,
        $"same_mass".cast("double")
          / ($"n_docs".cast("double") * ($"n_docs" - 1L).cast("double"))))
      .select($"split", $"shard", $"n_docs", $"exp_share")
    lane("pos_id", "doc_id").unionByName(lane("pos_len", "length"))
      .join(exp, Seq("split", "shard"))
      .select($"split", $"shard", $"order_by", $"n_docs", $"n_pairs",
        $"n_same",
        when($"n_pairs" > 0L, $"n_same".cast("double")
          / $"n_pairs".cast("double")).as("obs_share"),
        $"exp_share",
        when($"exp_share" > 0.0 && $"n_pairs" > 0L,
          ($"n_same".cast("double") / $"n_pairs".cast("double"))
            / $"exp_share").as("mixing_ratio"))
  }
  val o271: String = s"""
    WITH $funnelFlagsSql,
    mk AS (
      SELECT f.doc_id, f.ntok, dsx.source,
        CASE WHEN f.b < 80 THEN 'train'
             WHEN f.b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, ntok,
              (((doc_id % 1000000007) * 2654435761 + 5851)
                % 1000000007) % 100 AS b
            FROM fun_flags
            WHERE is_surv = 1 AND pass_q = 1 AND lm_kept = 1) f
      JOIN (SELECT doc_id, source FROM documents) dsx
        USING (doc_id)),
    shx AS (
      SELECT doc_id, ntok, source, split,
        CASE WHEN ((rank - 1) // $ManifestShards) % 2 = 0
          THEN (rank - 1) % $ManifestShards
          ELSE $ManifestShards - 1 - (rank - 1) % $ManifestShards
        END AS shard
      FROM (SELECT *, CAST(row_number() OVER (PARTITION BY split
              ORDER BY ntok DESC, doc_id ASC) AS BIGINT) AS rank
            FROM mk)),
    lane1 AS (
      SELECT split, shard, 'doc_id' AS order_by, source,
        LAG(source) OVER (PARTITION BY split, shard
          ORDER BY doc_id ASC) AS prev_source
      FROM shx),
    lane2 AS (
      SELECT split, shard, 'length' AS order_by, source,
        LAG(source) OVER (PARTITION BY split, shard
          ORDER BY ntok ASC, doc_id ASC) AS prev_source
      FROM shx),
    lpair AS (
      SELECT split, shard, order_by,
        CAST(COUNT(prev_source) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
          AS BIGINT) AS n_same
      FROM (SELECT * FROM lane1 UNION ALL SELECT * FROM lane2)
      GROUP BY 1, 2, 3),
    eexp AS (
      SELECT split, shard, CAST(SUM(c) AS BIGINT) AS n_docs,
        CASE WHEN SUM(c) > 1 THEN CAST(SUM(c * (c - 1)) AS DOUBLE)
          / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) - 1 AS DOUBLE)) END
          AS exp_share
      FROM (SELECT split, shard, source, COUNT(*) AS c
            FROM shx GROUP BY 1, 2, 3)
      GROUP BY 1, 2)
    SELECT l.split, l.shard, l.order_by, e.n_docs, l.n_pairs, l.n_same,
      CASE WHEN l.n_pairs > 0 THEN CAST(l.n_same AS DOUBLE)
        / CAST(l.n_pairs AS DOUBLE) END AS obs_share,
      e.exp_share,
      CASE WHEN e.exp_share > 0.0 AND l.n_pairs > 0
        THEN (CAST(l.n_same AS DOUBLE) / CAST(l.n_pairs AS DOUBLE))
          / e.exp_share END AS mixing_ratio
    FROM lpair l JOIN eexp e USING (split, shard)"""

  // ------------------------------ DoReMi-lite domain reweighting
  /** One DoReMi-style multiplicative-weights update of the per-source
    * mixture (Xie et al. 2023, reduced to the in-engine observable):
    * each source's EXCESS LOSS proxy is how far its mean q240
    * backoff-LM score falls below the corpus mean (less fluent under
    * the shared reference LM = harder domain = upweight), and the new
    * mixture weight is w ∝ base_share · 2^(η·excess). The exponential
    * rides integer bit arithmetic: the exponent is quantized to
    * e = floor(excess·2048 + 16384) (η = 2048 steps per unit score,
    * the +16384 offset keeps it nonnegative — a COMMON factor the
    * normalization cancels exactly, as does the min-shift below), and
    * 2^(e/256) is spelled shiftleft(1, e div 256)·(256 + e mod 256) —
    * the [[ilog256]] chord in reverse (≤ 6% per-step bias, identical
    * in both engines, monotone in e, so the weight ORDERING is exact).
    * Subtracting min(e) before exponentiating bounds the shift at
    * |sources|-census grain, keeping every multiplier comfortably in
    * int64.
    *
    * 100 TB design: everything after q240's (already scale-argued)
    * scoring pass lives at |sources| grain — the per-source censuses,
    * the single-row global mean / min-exponent / weight-total crosses
    * are all broadcast scalars; the tiny exponent frame is
    * localCheckpointed so its two consumers never re-run the LM
    * subtree (the q262 plan-inline lesson). */
  val q265DoremiReweight: Q = (s, d) => {
    val lm = q240BackoffLm(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
    // per-source Σ of 1e15-scale fixed-point scores overflows int64
    // past ~9e3 doc·trigram mass — decimal(38,0) keeps the sums exact
    // (the q255 convention); means surface as one double divide of the
    // exact integers (both engines round the same exact value)
    val srcs = lm.groupBy(col("source"))
      .agg(sum(col("score_fp").cast("decimal(38,0)")).as("s_fp"),
        sum(col("n_tri").cast("decimal(38,0)")).as("n"))
    val ndocs = Tables.documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val glob = srcs.agg(sum(col("s_fp")).as("gs"),
      sum(col("n")).as("gn"))
    val e = srcs.join(ndocs, Seq("source")).join(broadcast(glob))
      .withColumn("mean_src",
        col("s_fp").cast("double") / col("n").cast("double"))
      .withColumn("mean_g",
        col("gs").cast("double") / col("gn").cast("double"))
      .withColumn("e", floor(((col("mean_g") - col("mean_src"))
        / lit(1.0e15)) * lit(2048.0) + lit(16384.0)).cast("long"))
      .localCheckpoint(eager = false) // |sources| rows; 3 consumers
    val emin = e.agg(min(col("e")).as("e_min"))
    val tot = e.agg(sum(col("n_docs")).cast("long").as("tot_docs"))
    val w = e.join(broadcast(emin)).join(broadcast(tot))
      .withColumn("e_bits", col("e") - col("e_min"))
      // int64 headroom guard: Spark's shiftleft wraps the shift amount
      // mod 64 (silent wrong weights) while DuckDB's << raises — so the
      // multiplier SATURATES at e_bits = 8959 (shift 34, mult ≤ 2^34·511
      // ≈ 8.8e12, w_fp ≤ 8.8e18 < int64 max even at weight_base = 1).
      // Beyond the cap the un-capped source would outweigh the rest by
      // ≥ 2^34 ≈ 1.7e10, so every other normalized weight is < 1e-10 —
      // zero at the double precision weight_new surfaces in; saturation
      // is observationally exact. e_bits itself is reported unclamped.
      .withColumn("mult", expr(
        """shiftleft(CAST(1 AS BIGINT),
             CAST(least(e_bits, 8959L) div 256 AS INT))
           * (256 + least(e_bits, 8959L) % 256)"""))
      .withColumn("weight_base",
        col("n_docs").cast("double") / col("tot_docs").cast("double"))
      .withColumn("w_fp", floor(col("weight_base")
        * col("mult").cast("double") * lit(1.0e6)).cast("long"))
    val totw = w.agg(sum(col("w_fp").cast("decimal(38,0)")).as("tot_w"))
    w.join(broadcast(totw))
      .select(col("source"), col("n_docs"),
        (col("mean_src") / lit(1.0e15)).as("mean_score"),
        ((col("mean_g") - col("mean_src")) / lit(1.0e15))
          .as("excess_score"),
        col("e_bits"), col("mult"), col("weight_base"),
        (col("w_fp").cast("double") / col("tot_w").cast("double"))
          .as("weight_new"))
  }
  val o265: String = s"""
    WITH lm AS (${o240}),
    dsrc AS (SELECT doc_id, source FROM documents),
    srcs AS (
      SELECT source, CAST(SUM(CAST(score_fp AS HUGEINT)) AS HUGEINT)
          AS s_fp,
        CAST(SUM(CAST(n_tri AS HUGEINT)) AS HUGEINT) AS n
      FROM lm JOIN dsrc USING (doc_id) GROUP BY source),
    nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
    gl AS (SELECT CAST(SUM(s_fp) AS HUGEINT) AS gs,
             CAST(SUM(n) AS HUGEINT) AS gn FROM srcs),
    ee AS (
      SELECT srcs.source, nd.n_docs,
        CAST(s_fp AS DOUBLE) / CAST(n AS DOUBLE) AS mean_src,
        CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE) AS mean_g,
        CAST(FLOOR(((CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)
            - CAST(s_fp AS DOUBLE) / CAST(n AS DOUBLE))
          / 1.0e15) * 2048.0 + 16384.0) AS BIGINT) AS e
      FROM srcs JOIN nd USING (source) CROSS JOIN gl),
    em AS (SELECT MIN(e) AS e_min FROM ee),
    td AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM ee),
    ww AS (
      SELECT source, n_docs, mean_src, mean_g, e - e_min AS e_bits,
        (CAST(1 AS BIGINT)
            << CAST(LEAST(e - e_min, 8959) // 256 AS INT))
          * (256 + LEAST(e - e_min, 8959) % 256) AS mult,
        CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE) AS weight_base
      FROM ee CROSS JOIN em CROSS JOIN td),
    ww2 AS (
      SELECT *, CAST(FLOOR(weight_base * CAST(mult AS DOUBLE) * 1.0e6)
        AS BIGINT) AS w_fp
      FROM ww),
    tw AS (SELECT CAST(SUM(CAST(w_fp AS HUGEINT)) AS HUGEINT) AS tot_w
           FROM ww2)
    SELECT source, n_docs,
      mean_src / 1.0e15 AS mean_score,
      (mean_g - mean_src) / 1.0e15 AS excess_score,
      e_bits, mult, weight_base,
      CAST(w_fp AS DOUBLE) / CAST(tot_w AS DOUBLE) AS weight_new
    FROM ww2 CROSS JOIN tw"""

  val queries: Map[String, Q] = Map(
    "q264_nb_quality_classifier" -> q264NbQualityClassifier,
    "q265_doremi_reweight" -> q265DoremiReweight,
    "q268_nb_calibration" -> q268NbCalibration,
    "q269_gate_agreement" -> q269GateAgreement,
    "q270_epoch_allocation" -> q270EpochAllocation,
    "q272_nb_roc_sweep" -> q272NbRocSweep,
    "q273_bpe_encode" -> q273BpeEncode,
    "q274_bpe_pack" -> q274BpePack,
    "q271_shard_mixing" -> q271ShardMixing,
    "q262_release_manifest" -> q262ReleaseManifest,
    "q261_padding_waste" -> q261PaddingWaste,
    "q259_cluster_density" -> q259ClusterDensity,
    "q257_curation_funnel" -> q257CurationFunnel,
    "q252_heaps_fit" -> q252HeapsFit,
    "q250_ppl_gate" -> q250PplGate,
    "q251_source_drift" -> q251SourceDrift,
    "q247_vocab_sweep" -> q247VocabSweep,
    "q246_effective_mixture" -> q246EffectiveMixture,
    "q245_bpe_deep_train" -> q245BpeDeepTrain,
    "q263_bpe_converged_train" -> q263BpeConvergedTrain,
    "q241_dsir_select" -> q241DsirSelect,
    "q240_backoff_lm" -> q240BackoffLm,
    "q233_packing_spans" -> q233PackingSpans,
    "q234_window_occupancy" -> q234WindowOccupancy,
    "q235_bpe_fertility" -> q235BpeFertility,
    "q168_length_quantiles_sketch" -> q168LengthQuantilesSketch,
    "q171_pagerank_dup_graph" -> q171PagerankDupGraph,
    "q175_oov_coverage" -> q175OovCoverage,
    "q176_token_diversity" -> q176TokenDiversity,
    "q177_replica_checksums" -> q177ReplicaChecksums,
    "q179_ks_drift" -> q179KsDrift,
    "q183_chi2_drift" -> q183Chi2Drift,
    "q184_wasserstein_drift" -> q184WassersteinDrift,
    "q164_pii_census" -> q164PiiCensus,
    "q214_text_hygiene" -> q214TextHygiene,
    "q221_countmin_audit" -> q221CountMinAudit,
    "q223_bpe_train3" -> q223BpeTrain3,
    "q224_filter_funnel" -> q224FilterFunnel,
    "q229_deletion_audit" -> q229DeletionAudit,
    "q163_incremental_clusters" -> q163IncrementalClusters,
    "q154_corr_audit" -> q154CorrAudit,
    "q149_novelty_curve" -> q149NoveltyCurve,
    "q231_shared_run_chunks" -> q231SharedRunChunks,
    "q238_split_leakage" -> q238SplitLeakage,
    "q239_temperature_sweep" -> q239TemperatureSweep,
    "q147_method_agreement" -> q147MethodAgreement,
    "q145_quality_dup_calibration" -> q145QualityDupCalibration,
    "q143_dup_degree" -> q143DupDegree,
    "q134_bigram_fluency" -> q134BigramFluency,
    "q125_token_budget" -> q125TokenBudget,
    "q121_survivor_election" -> q121SurvivorElection,
    "q122_chunk_dedup" -> q122ChunkDedup,
    "q123_source_contamination" -> q123SourceContamination,
    "q119_rarity_score" -> q119RarityScore,
    "q118_boilerplate" -> q118BoilerplateCensus,
    "q112_bpe_merges" -> q112BpeMerges,
    "q114_pack_sequences" -> q114PackSequences,
    "q115_zipf_census" -> q115ZipfCensus,
    "q116_quality_sample" -> q116QualitySample,
    "q96_length_histogram" -> q96LengthHistogram,
    "q98_union_dup_clusters" -> q98UnionDupClusters,
    "q276_union_dup_clusters_knn" -> q276UnionDupClustersKnn,
    "q99_chunk_docs" -> q99ChunkDocs,
    "q100_redact_blocklist" -> q100RedactBlocklist,
    "q101_length_quantiles" -> q101LengthQuantiles,
    "q103_fixed_stratum" -> q103FixedStratum,
    "q104_heavy_hitters" -> q104HeavyHitters,
    "q105_split_census" -> q105SplitCensus,
    "q108_topk_native" -> q108TopKNative,
    "q109_bloom_dedup" -> q109BloomDedup,
    "q83_dup_clusters" -> q83DupClusters,
    "q85_tfidf_topk" -> q85TfIdf,
    "q86_stratified_sample" -> q86StratifiedSample,
    "q87_incremental_dedup" -> q87IncrementalDedup,
    "q88_repetition_filter" -> q88RepetitionFilter,
    "q89_decontaminate" -> q89Decontaminate,
    "q90_mixture_weights" -> q90MixtureWeights)

  val oracles: Map[String, String] = Map(
    "q264_nb_quality_classifier" -> o264,
    "q265_doremi_reweight" -> o265,
    "q268_nb_calibration" -> o268,
    "q269_gate_agreement" -> o269,
    "q270_epoch_allocation" -> o270,
    "q272_nb_roc_sweep" -> o272,
    "q273_bpe_encode" -> o273,
    "q274_bpe_pack" -> o274,
    "q271_shard_mixing" -> o271,
    "q262_release_manifest" -> o262,
    "q261_padding_waste" -> o261,
    "q259_cluster_density" -> o259,
    "q257_curation_funnel" -> o257,
    "q252_heaps_fit" -> o252,
    "q250_ppl_gate" -> o250,
    "q251_source_drift" -> o251,
    "q247_vocab_sweep" -> o247,
    "q246_effective_mixture" -> o246,
    "q245_bpe_deep_train" -> o245,
    "q263_bpe_converged_train" -> o263,
    "q241_dsir_select" -> o241,
    "q240_backoff_lm" -> o240,
    "q233_packing_spans" -> o233,
    "q234_window_occupancy" -> o234,
    "q235_bpe_fertility" -> o235,
    "q171_pagerank_dup_graph" -> o171,
    "q175_oov_coverage" -> o175,
    "q176_token_diversity" -> o176,
    "q177_replica_checksums" -> o177,
    "q179_ks_drift" -> o179,
    "q183_chi2_drift" -> o183,
    "q184_wasserstein_drift" -> o184,
    "q164_pii_census" -> o164,
    "q214_text_hygiene" -> o214,
    "q221_countmin_audit" -> o221,
    "q223_bpe_train3" -> o223,
    "q224_filter_funnel" -> o224,
    "q229_deletion_audit" -> o229,
    "q163_incremental_clusters" -> o163,
    "q154_corr_audit" -> o154,
    "q149_novelty_curve" -> o149,
    "q231_shared_run_chunks" -> o231,
    "q238_split_leakage" -> o238,
    "q239_temperature_sweep" -> o239,
    "q147_method_agreement" -> o147,
    "q145_quality_dup_calibration" -> o145,
    "q143_dup_degree" -> o143,
    "q134_bigram_fluency" -> o134,
    "q125_token_budget" -> o125,
    "q121_survivor_election" -> o121,
    "q122_chunk_dedup" -> o122,
    "q123_source_contamination" -> o123,
    "q119_rarity_score" -> o119,
    "q118_boilerplate" -> o118,
    "q112_bpe_merges" -> o112,
    "q114_pack_sequences" -> o114,
    "q115_zipf_census" -> o115,
    "q116_quality_sample" -> o116,
    "q96_length_histogram" -> o96,
    "q98_union_dup_clusters" -> o98,
    "q276_union_dup_clusters_knn" -> o276,
    "q99_chunk_docs" -> o99,
    "q100_redact_blocklist" -> o100,
    "q101_length_quantiles" -> o101,
    "q103_fixed_stratum" -> o103,
    "q104_heavy_hitters" -> o104,
    "q105_split_census" -> o105,
    "q108_topk_native" -> o108,
    "q109_bloom_dedup" -> o109,
    "q83_dup_clusters" -> o83,
    "q85_tfidf_topk" -> o85,
    "q86_stratified_sample" -> o86,
    "q87_incremental_dedup" -> o87,
    "q88_repetition_filter" -> o88,
    "q89_decontaminate" -> o89,
    "q90_mixture_weights" -> o90)
}
