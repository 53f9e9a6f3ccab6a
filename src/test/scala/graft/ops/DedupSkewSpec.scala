package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => PropTest}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-skew contracts for the banded pair generators (the
  * round-5 verdict's #1): a bucket of IDENTICAL signatures — what
  * planted replay corpora and boilerplate produce — must pre-collapse
  * into one group (its member pairs are output, not candidate waste),
  * and residual band buckets holding more than
  * `DedupOps.MaxBandBucket` DISTINCT signatures must drop identically
  * to the oracle's mirrored cap. */
class DedupSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private def sigFrame(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "simhash")
  }

  test("all-identical corpus: exactly C(n,2) hamming-0 pairs, " +
    "generated from ONE collapsed group") {
    val n = 60
    val out = DedupOps.simhashPairsFrom(
      sigFrame((1L to n.toLong).map(i => i -> 0xABCD1234L))).collect()
    assert(out.length == n * (n - 1) / 2)
    assert(out.forall(_.getAs[Int]("hamming") == 0))
    // pairs are ordered and unique
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("over-cap band bucket drops its cross-signature candidates") {
    // MaxBandBucket+1 DISTINCT signatures share the top half; low
    // halves 0..cap are pairwise within hamming 2 for many pairs —
    // all must drop because the band-0 bucket exceeds the cap and
    // the band-1 buckets are singletons.
    val top = 0x7L << 16
    val sigs = (0 to DedupOps.MaxBandBucket)
      .map(i => (i + 1).toLong -> (top | i.toLong))
    val out = DedupOps.simhashPairsFrom(sigFrame(sigs)).collect()
    assert(out.isEmpty)
  }

  test("at-cap band bucket keeps its candidates (boundary is <=)") {
    val top = 0x7L << 16
    val sigs = (0 until DedupOps.MaxBandBucket)
      .map(i => (i + 1).toLong -> (top | i.toLong))
    val out = DedupOps.simhashPairsFrom(sigFrame(sigs)).collect()
    // e.g. low halves 0 and 1 differ by one bit → hamming 1 survives
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("hamming") <= 2))
  }

  test("mixed: identical-signature clique + near signature cross pairs") {
    // 5 docs share signature A; doc 6 differs from A by one low bit
    // (same top half). Expect C(5,2)=10 hamming-0 pairs + 5 cross
    // pairs at hamming 1 — and nothing else.
    val a = 0x00050003L
    val rows = (1L to 5L).map(_ -> a) :+ (6L -> (a ^ 1L))
    val out = DedupOps.simhashPairsFrom(sigFrame(rows)).collect()
    val (h0, h1) = out.partition(_.getAs[Int]("hamming") == 0)
    assert(h0.length == 10 && h1.length == 5)
    assert(h1.forall(_.getLong(1) == 6L))
  }

  test("property: n identical docs always yield n·(n−1)/2 pairs, " +
    "all hamming 0 (bounded output, no quadratic candidate waste)") {
    val prop = Prop.forAllNoShrink(Gen.choose(2, 40),
      Gen.choose(0L, 0xFFFFFFFFL)) { (n: Int, sig: Long) =>
      val out = DedupOps.simhashPairsFrom(
        sigFrame((1L to n.toLong).map(_ -> sig))).collect()
      out.length == n * (n - 1) / 2 &&
        out.forall(_.getAs[Int]("hamming") == 0)
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
