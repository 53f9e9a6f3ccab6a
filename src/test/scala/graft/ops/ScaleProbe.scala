package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the scale rehearsal: prints the simhash
  * group-size and band-bucket distributions at an amplified dir, to
  * locate the q98/q60 x8 OOM. Not part of the suite. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("target/scale/x8")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shared = DedupOps.sharedTextSignals(spark, d)
    val sig = DedupOps.simhashFrom(shared)
    println("=== docs vs distinct signatures (resolution)")
    sig.agg(count(lit(1)).as("docs"),
      countDistinct($"simhash").as("nsig")).show(false)
    println("=== simhash identical-signature group sizes (top 10)")
    sig.groupBy($"simhash").agg(count(lit(1)).as("m"))
      .orderBy($"m".desc).limit(10).show(false)
    println("=== band-bucket sizes: distinct signatures per (band, bk), top 10")
    val groups = sig.groupBy($"simhash")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
    val posts = groups
      .select($"simhash", $"ids", expr(
        """explode(array(
             named_struct('band', 0, 'bk', shiftright(simhash, 48) & 65535),
             named_struct('band', 1, 'bk', shiftright(simhash, 32) & 65535),
             named_struct('band', 2, 'bk', shiftright(simhash, 16) & 65535),
             named_struct('band', 3, 'bk', simhash & 65535)))
           AS b"""))
      .groupBy($"b.band", $"b.bk")
      .agg(count(lit(1)).as("nsig"), sum(size($"ids")).as("nmembers"))
    posts.orderBy($"nsig".desc).limit(10).show(false)
    println("=== capped buckets (2 <= nsig <= 100): total C(nsig,2) struct volume")
    posts.filter($"nsig" >= 2 && $"nsig" <= 100)
      .agg(sum($"nsig" * ($"nsig" - 1) / 2).as("pairs"),
           max($"nmembers").as("max_bucket_members"),
           sum($"nmembers" * ($"nmembers" - 1) / 2).as("worst_member_pairs"))
      .show(false)
    spark.stop()
  }
}
