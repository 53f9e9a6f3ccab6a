package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: counts and times each q98 edge source at an
  * amplified dir, to locate where the x8 wall-time goes. Not part of
  * the suite. */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("target/scale/x8")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[edge] $name%-12s n=$n%12d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val shared = DedupOps.sharedTextSignals(spark, d)
    timed("simhash") {
      DedupOps.simhashPairsFrom(DedupOps.simhashFrom(shared)).count()
    }
    timed("jaccard") { DedupOps.jaccardFrom(shared).count() }
    timed("cosine") { VectorOps.q64CosineNearDup(spark, d).count() }
    spark.stop()
  }
}
