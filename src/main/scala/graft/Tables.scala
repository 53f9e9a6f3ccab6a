package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir. Schemas are
  * carried by parquet; dates arrive as TIMESTAMP and are cast at use
  * sites to keep oracle (DuckDB) parity explicit.
  */
object Tables {
  /** The driver's testdata is one parquet file with ONE row group per
    * table, so a bare scan feeds every upstream operator from a single
    * task. For the relational tables that is FINE — map-side partial
    * aggregation collapses them in one cheap pass and an exchange
    * would cost more than it buys (measured 0.67s vs 1.2s on the q01
    * shape). The text/vector tables are different: their per-row work
    * (higher-order array folds, 64-dim dot products) dwarfs scan cost,
    * so those redistribute to all cores right after the scan — the
    * local stand-in for the many-file splits a real 100 TB table has.
    * Catalyst still pushes filters/pruning through the repartition. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (HeavyPerRow(name))
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }
  private val HeavyPerRow = Set("documents", "embeddings")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (vectorized reader rejects it
    * unless nanos are surfaced as long, then ns→us matches DuckDB's
    * truncation) and plain TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ).
    * Normalize both to session-zone TimestampType (UTC everywhere here)
    * so every downstream query sees one stable type. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
