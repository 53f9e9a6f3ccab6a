package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard distilled from the round-8 scale rehearsal: the
  * dedup evidence paths must grow LINEARLY with corpus amplification.
  * The rehearsal found two quadratic regressions the oracle gate
  * cannot see (it only runs at fixed SF): the simhash all-pairs
  * census fed to cluster consumers (~10⁸ edges on a 40k corpus once
  * boilerplate collapses 34% of docs onto one signature), and an
  * int64 fixed-point census sum that overflows past ~9.2k pairs per
  * group. This spec re-runs the amplifier at sf0.001 ×4 — small
  * enough for the suite, structured identically — and asserts the
  * EDGE-COUNT growth contract exactly (deterministic counts, not
  * wall-clock, so it cannot flake on a loaded machine). */
class ScaleGrowthSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new functions.GraftExtensions)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private lazy val ampDir: String = {
    val d = "target/scale-spec/x4"
    ScaleRehearsal.amplify(spark, sf, d, 4)
    d
  }

  test("amplifier: x4 corpus is exactly 4x docs with disjoint ids " +
    "and proportional planted-replay mass") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val amp = spark.read.parquet(s"$ampDir/documents.parquet")
    assert(amp.count() == 4 * base.count())
    assert(amp.select(col("doc_id")).distinct().count() == amp.count())
    // the exact-dedup recipe (planted replays at ids ≥ 2⁴⁰ in the
    // GENERATOR corpus) must keep firing proportionally: q54's dup
    // count at x4 = 4 × its count at x1 (replicas are bijective
    // images of the base corpus, fingerprint structure preserved)
    def dups(d: String): Long = {
      val fp = graft.ops.TextOps.fingerprintCol
      val docs = Tables.documents(spark, d).withColumn("fp", fp)
      docs.count() - docs.select(col("fp")).distinct().count()
    }
    assert(dups(ampDir) == 4 * dups(sf))
  }

  test("amplifier: x4 embedding near-dup structure is replica-" +
    "isomorphic — no cross-replica edges, per-replica counts near base") {
    // the round-9 ×1024 probe caught the embedding analogue of the
    // round-8 constant-salt collapse: replicas of one base vector
    // stayed pairwise cosine-close AND shared the base label space,
    // so q64's near-dup edge count grew 16× per 4× amplification
    // (102M edges at x1024 = 95% of q98's input). The fix is a
    // per-replica ±1 sign pattern (cancels within a replica, scrambles
    // across) plus a per-replica label-space offset (the "k ∝ N
    // clusters" production contract). This pins both: cross-replica
    // edges must be STRUCTURALLY zero (labels disjoint), and each
    // replica's internal edge count must stay near the base corpus's
    // (the ±noise moves borderline-0.3 pairs slightly).
    val baseEdges = graft.ops.VectorOps
      .q64CosineNearDup(spark, sf).count()
    val amp = graft.ops.VectorOps.q64CosineNearDup(spark, ampDir)
      .withColumn("rep_a", expr("id_a div 1048576"))
      .withColumn("rep_b", expr("id_b div 1048576"))
    val cross = amp.filter(col("rep_a") =!= col("rep_b")).count()
    assert(cross == 0L,
      s"cross-replica embedding near-dup edges must be zero, got $cross")
    val perRep = amp.groupBy(col("rep_a")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRep.size == 4, s"expected 4 replicas, got ${perRep.keys}")
    perRep.foreach { case (rep, n) =>
      assert(n >= baseEdges / 2 && n <= baseEdges * 2,
        s"replica $rep edge count $n far from base $baseEdges — " +
          "amplified near-dup structure is no longer isomorphic")
    }
  }

  test("cluster-grain simhash edges satisfy the exact structural " +
    "identity: (docs − distinct sigs) stars + one edge per verified " +
    "signature pair — NO member-pair quadratic term, at any scale") {
    // the contract the round-8 OOM fix established: member-pair
    // volume may never appear in the cluster-edge count. Star edges
    // are exactly n_docs − n_distinct_signatures (m−1 per group) and
    // cross edges exactly the verified signature-pair count, so the
    // total is an identity we can assert EXACTLY — on the base dir
    // and on the amplified dir, where cross-replica near-signatures
    // (the token hash is locality-heavy by design) would have made
    // an all-pairs spelling blow up C(m,2)-style instead.
    for (d <- Seq(sf, ampDir)) {
      val sig = graft.ops.DedupOps.q59SimHash(spark, d).localCheckpoint()
      val nDocs = sig.count()
      val nSigs = sig.select(col("simhash")).distinct().count()
      val nSigPairs = graft.ops.DedupOps.verifiedSigPairs(
        sig.select(col("simhash")).distinct()).count()
      val edges = graft.ops.DedupOps.q60ClusterEdges(spark, d).count()
      assert(edges == (nDocs - nSigs) + nSigPairs,
        s"$d: $edges edges vs ${nDocs - nSigs} stars + $nSigPairs sig pairs")
    }
  }

  test("q98 on the amplified dir: clusters stay a partition of the " +
    "clustered docs and keep at least the base corpus's mass") {
    val out4 = SparkEntry.queries("q98_union_dup_clusters")(spark, ampDir)
      .localCheckpoint()
    val n1 = SparkEntry.queries("q98_union_dup_clusters")(spark, sf).count()
    assert(out4.count() >= n1, "amplification lost cluster mass")
    assert(out4.select(col("doc_id")).distinct().count() == out4.count(),
      "a doc appears in two clusters")
    // cluster_size is consistent with the actual membership census
    val bad = out4.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), max(col("cluster_size")).as("sz"),
        min(col("cluster_size")).as("sz2"))
      .filter(col("n") =!= col("sz") || col("n") =!= col("sz2"))
      .count()
    assert(bad == 0L, s"$bad clusters with inconsistent cluster_size")
  }

  test("fixed-point census sums survive past int64 via decimal(38,0) " +
    "(the q255/q123 overflow class)") {
    val s = spark
    import s.implicits._
    // 10k pairs at the 1e15 fixed point = 10¹⁹ > Long.MaxValue
    // (9.22·10¹⁸): the int64 sum ANSI-aborts exactly as the ×64
    // rehearsal showed; the decimal(38,0) spelling both queries now
    // ride must return the exact total.
    val jfp = (1 to 10000).map(_ => 1000000000000000L).toDF("j_fp")
    val dec = jfp
      .agg(sum($"j_fp".cast("decimal(38,0)")).cast("double").as("s"))
      .head.getDouble(0)
    assert(dec == 1.0e19, s"decimal census sum inexact: $dec")
    val int64 = intercept[Exception] {
      jfp.agg(sum($"j_fp").cast("long")).head.getLong(0)
    }
    assert(int64.getMessage.toLowerCase.contains("overflow"),
      s"expected the int64 spelling to overflow, got: ${int64.getMessage}")
  }

  test("jaccard census: decimal sum is exact on a maximal capped " +
    "identical-text group") {
    val s = spark
    import s.implicits._
    // MaxShingleDf-sized identical-text group (the largest a posting
    // list admits): every pair has jaccard exactly 1.0, so the
    // decimal-summed fixed point must equal n_pairs × 1e15 exactly
    val docs = (1L to 100L)
      .map(i => (i,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val r = graft.ops.DedupOps.jaccardPairsOver(docs)
      .select(floor($"jaccard" * lit(1.0e15)).cast("long").as("j_fp"))
      .agg(count(lit(1)).as("n"),
        sum($"j_fp".cast("decimal(38,0)")).cast("double").as("s"))
      .head
    assert(r.getLong(0) == 100L * 99L / 2,
      s"expected C(100,2) pairs, got ${r.getLong(0)}")
    assert(r.getDouble(1) == r.getLong(0).toDouble * 1.0e15)
  }
}
