package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the ×1024 q98 residue: counts the three
  * union-of-evidence edge sources (simhash cluster edges, jaccard
  * pairs, embedding cosine near-dups) per amplification, so the
  * SCALE_r09_deep stage decomposition's "edge checkpoints grew ≫4×"
  * finding can be attributed to a SPECIFIC lane. Run:
  *   sbt "Test/runMain graft.EdgeCensusProbe [amps]"
  */
object EdgeCensusProbe {
  def main(args: Array[String]): Unit = {
    val amps = args.lift(0).getOrElse("64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (a <- amps) {
      val d = s"target/scale/x$a"
      val shared = DedupOps.sharedTextSignals(spark, d)
      val sim = DedupOps
        .simhashClusterEdges(DedupOps.simhashFrom(shared)).count()
      val jac = DedupOps.jaccardFrom(shared).count()
      val emb = VectorOps.q64CosineNearDup(spark, d).count()
      println(s"[edges] x$a sim=$sim jac=$jac emb=$emb")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
