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
  /** Seeded random sample (qa_payments.py:823-965): rand(seed) is
    * deterministic WITHIN Spark (same seed + partitioning → same
    * rows) but not reproducible by other engines, so this query has
    * no SQL oracle — the driver records a rows-only check. The
    * cross-engine-reproducible variant is q15's hash-mod sample. */
  val q81SeededSample: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .withColumn("r", rand(42))
      .filter($"r" < 0.05)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  val queries: Map[String, Q] = Map(
    "q79_salted_agg" -> q79SaltedAgg,
    "q80_spanish_calendar" -> q80SpanishCalendar,
    "q81_seeded_sample" -> q81SeededSample)

  val oracles: Map[String, String] = Map(
    "q79_salted_agg" -> o79,
    "q80_spanish_calendar" -> o80)
}
