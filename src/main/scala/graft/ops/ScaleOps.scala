package graft.ops

import graft.Tables
import graft.functions.Cleaning._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators: skew salting, Spanish calendar
  * derivations (F18), seeded sampling (U6).
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------- salting
  /** Two-phase salted aggregation: when one grouping key dominates
    * (l_returnflag has 3 values over the whole table), a single hash
    * agg funnels each hot key through one reducer. Salting splits
    * each key 16 ways for the wide partial, then re-aggregates the 16
    * partials — same result, no hot reducer. The salt is derived from
    * the row (deterministic), never random. */
  val q79SaltedAgg: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .withColumn("salt", pmod($"l_orderkey", lit(16)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).as("q"),
        count(lit(1)).as("n"))
      .groupBy($"l_returnflag")
      .agg(sum($"q").cast("double").as("sum_qty"),
        sum($"n").as("n_rows"))
  }
  val o79 = """
    SELECT l_returnflag,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag"""

  // ------------------------------------------------------------- F18
  /** Spanish calendar derivation (forecasting/date_formatters.py:10-60):
    * "Jueves 20 de Noviembre" labels, via expression-level lookup —
    * no UDF, no locale dependence. */
  private val SpanishDays = Seq("Domingo", "Lunes", "Martes",
    "Miércoles", "Jueves", "Viernes", "Sábado") // index = dayofweek-1
  private val SpanishMonths = Seq("Enero", "Febrero", "Marzo", "Abril",
    "Mayo", "Junio", "Julio", "Agosto", "Septiembre", "Octubre",
    "Noviembre", "Diciembre")

  val q80SpanishCalendar: Q = (s, d) => {
    import s.implicits._
    val dayName = element_at(
      array(SpanishDays.map(lit): _*), dayofweek($"fecha"))
    val monthName = element_at(
      array(SpanishMonths.map(lit): _*), month($"fecha"))
    Tables.events(s, d)
      .select(to_date($"ts").as("fecha"), $"value")
      .withColumn("label",
        concat(dayName, lit(" "), dayofmonth($"fecha"), lit(" de "),
          monthName))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_events"),
        (sum($"value".cast("decimal(28,2)")) * 100).cast("long")
          .as("cents"))
  }
  val o80: String = {
    val dayCase = SpanishDays.zipWithIndex.map { case (n, i) =>
      s"WHEN ${i} THEN '$n'" }.mkString(" ") // duckdb dayofweek: 0=Sun
    val monCase = SpanishMonths.zipWithIndex.map { case (n, i) =>
      s"WHEN ${i + 1} THEN '$n'" }.mkString(" ")
    s"""
    SELECT (CASE dayofweek(fecha) $dayCase END) || ' ' ||
           CAST(day(fecha) AS VARCHAR) || ' de ' ||
           (CASE month(fecha) $monCase END) AS label,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS cents
    FROM (SELECT CAST(ts AS DATE) AS fecha, value FROM events)
    GROUP BY 1"""
  }

  // -------------------------------------------------------------- U6
  /** Seeded sample via a seed-mixed multiplicative hash
    * (qa_payments.py:823-965 uses a seeded rng). `rand(seed)` is the
    * WRONG operator at scale: its stream depends on the partition
    * layout, so AQE / repartitioning silently changes which rows are
    * sampled, and no other engine can reproduce it. A seeded hash of
    * the key is stable under any partitioning, reproducible by any
    * engine (→ full oracle check), and equally uniform. Two mod-prime
    * rounds keep every intermediate < 2^63 (no ANSI overflow) while
    * mixing the seed into high bits. Distinct from q15's single
    * unseeded hash-mod round. */
  private val SampleSeed = 42L

  val q81SeededSample: Q = (s, d) => {
    import s.implicits._
    // key is reduced mod-prime BEFORE the multiply: p·A ≈ 2.65e18 fits
    // Int64, whereas key·A would overflow for keys ≥ ~3.47e9 (an
    // ANSI-mode runtime error exactly at the scale this protects)
    val h1 = (pmod($"c_custkey", lit(1000000007L)) * lit(2654435761L) +
      lit(SampleSeed * 40503L)) % lit(1000000007L)
    val h2 = (h1 * lit(2654435761L)) % lit(1000000007L)
    Tables.customer(s, d)
      .filter(h2 % 100 < 5)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }
  val o81: String = s"""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE ((((c_custkey % 1000000007) * 2654435761
             + ${SampleSeed * 40503L}) % 1000000007)
            * 2654435761) % 1000000007 % 100 < 5"""

  // --------------------------------------------- shard bin-packing
  /** Snake-draft shard assignment: sources ranked by token mass
    * (desc, name tie-break) are dealt onto [[NumShards]] shards in
    * alternating direction per pass (1..N, then N..1, …) — the
    * deterministic one-pass approximation of longest-processing-time
    * bin packing a layout planner uses to balance training shards,
    * with the per-shard balance factor (shard total / ideal) as the
    * audit. A greedy exact LPT is inherently sequential; the snake is
    * the relational-friendly version whose worst case is bounded and
    * whose assignment is pure rank arithmetic.
    *
    * 100 TB design: one corpus scan to the per-source token census;
    * the rank window and everything after ride the |sources| census.
    * Balance divides are single double ops. */
  private[ops] val NumShards = 4

  /** The snake-draft (source → shard) assignment shared by q225 (the
    * balance audit) and q232 (the embedding-distribution audit):
    * per-source token census → global rank (|sources| census window —
    * whitelisted) → alternating-direction deal. Returns
    * (source, tokens, shard). */
  private[ops] def shardAssignments(s: SparkSession,
                                    d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val src = Tables.documents(s, d)
      .withColumn("ntok", size(split($"text", " ")).cast("long"))
      .groupBy($"source")
      .agg(sum($"ntok").cast("long").as("tokens"))
    val w = Window.orderBy($"tokens".desc, $"source".asc)
    src
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("shard", expr(
        s"""CASE WHEN ((rank - 1) DIV $NumShards) % 2 = 0
              THEN (rank - 1) % $NumShards
              ELSE $NumShards - 1 - (rank - 1) % $NumShards END"""))
      .select($"source", $"tokens", $"shard")
  }

  /** DuckDB twin of [[shardAssignments]] — CTE chain ending in
    * `assign(source, tokens, shard)`; callers prepend `WITH`. */
  private[ops] val shardAssignSql: String = s"""
    srcw AS (
      SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        AS tokens
      FROM documents GROUP BY source),
    rankedw AS (
      SELECT source, tokens,
        CAST(row_number() OVER (ORDER BY tokens DESC, source ASC)
          AS BIGINT) AS rank
      FROM srcw),
    assign AS (
      SELECT source, tokens,
        CASE WHEN ((rank - 1) // $NumShards) % 2 = 0
          THEN (rank - 1) % $NumShards
          ELSE $NumShards - 1 - (rank - 1) % $NumShards END AS shard
      FROM rankedw)"""

  val q225ShardBalance: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val per = shardAssignments(s, d)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_sources"),
        sum($"tokens").cast("long").as("shard_tokens"))
    per.withColumn("balance", $"shard_tokens".cast("double")
      / (sum($"shard_tokens").over(Window.partitionBy())
           .cast("double") / NumShards))
  }
  val o225: String = s"""
    WITH $shardAssignSql,
    per AS (
      SELECT shard, COUNT(*) AS n_sources,
        CAST(SUM(tokens) AS BIGINT) AS shard_tokens
      FROM assign GROUP BY shard)
    SELECT shard, n_sources, shard_tokens,
      CAST(shard_tokens AS DOUBLE)
        / (CAST(SUM(shard_tokens) OVER () AS DOUBLE) / $NumShards)
        AS balance
    FROM per"""

  val queries: Map[String, Q] = Map(
    "q79_salted_agg" -> q79SaltedAgg,
    "q80_spanish_calendar" -> q80SpanishCalendar,
    "q81_seeded_sample" -> q81SeededSample,
    "q225_shard_balance" -> q225ShardBalance)

  val oracles: Map[String, String] = Map(
    "q79_salted_agg" -> o79,
    "q80_spanish_calendar" -> o80,
    "q81_seeded_sample" -> o81,
    "q225_shard_balance" -> o225)
}
