package graft.pos

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Payments forecasting + banking deposit schedule
  * (`/root/reference/src/pos_core/forecasting/`), set-based:
  *
  *  - series densification (W3) via `sequence`/`explode`;
  *  - NaiveLastWeek (W7): for each target date, the nearest k ∈ 1..52
  *    with source = target − 7k on/before the branch's last data date
  *    and not holiday-adjacent, value from the densified series else 0
  *    — expressed as a candidate explode + `row_number`, no per-row
  *    driver loop (naive.py:19-56,92-176);
  *  - deposit schedule (W5/W6): weekday-conditional batching over
  *    hist-else-forecast daily totals (deposit_schedule.py:31-155,
  *    cash_flow.py:19-85).
  *
  * Parallelism is (branch × metric × date) — every step is a
  * DataFrame op that scales with partitions, not branches.
  */
object Forecast {

  val DefaultMetrics: Seq[String] = Seq("ingreso_total",
    "ingreso_efectivo", "ingreso_credito", "ingreso_debito")

  /** Row-sum ingreso_total (preparation.py:42-66). */
  def withIngresoTotal(df: DataFrame): DataFrame = {
    val cols = PaymentsDaily.BucketCols.filter(df.columns.contains)
    if (cols.isEmpty) throw new DataQualityError("no ingreso_* columns")
    df.withColumn("ingreso_total",
      cols.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _))
  }

  /** Long (sucursal, metric, fecha, valor) densified to every day in
    * each branch's [min, max] range, gaps = 0.0 (preparation.py:12-39). */
  def buildDailySeries(mart: DataFrame, metrics: Seq[String]): DataFrame = {
    val spark = mart.sparkSession
    import spark.implicits._
    val present = metrics.filter(mart.columns.contains)
    if (present.isEmpty)
      throw new DataQualityError(s"none of $metrics present")
    val stackArgs = present.map(m => s"'$m', coalesce(`$m`, 0.0)")
      .mkString(", ")
    val long = mart.select($"sucursal", $"fecha".cast("date").as("fecha"),
      expr(s"stack(${present.size}, $stackArgs) as (metric, valor)"))
    val cal = long.groupBy($"sucursal", $"metric")
      .agg(min($"fecha").as("d0"), max($"fecha").as("d1"))
      .select($"sucursal", $"metric",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("fecha"))
    cal.join(long, Seq("sucursal", "metric", "fecha"), "left")
      .groupBy($"sucursal", $"metric", $"fecha")
      .agg(coalesce(sum($"valor"), lit(0.0)).as("valor"))
  }

  /** W6 holiday adjacency: date is a holiday or ±1 day from one
    * (holiday set broadcast as literals — it is tiny and fixed). */
  def holidayAdjacent(d: Column,
                      holidays: Set[LocalDate]): Column =
    if (holidays.isEmpty) lit(false)
    else {
      val hs = holidays.map(_.toString).toSeq
      d.cast("string").isin(hs: _*) ||
        date_add(d, 1).cast("string").isin(hs: _*) ||
        date_sub(d, 1).cast("string").isin(hs: _*)
    }

  /** NaiveLastWeek forecast: `horizonDays` rows per (sucursal, metric)
    * after each branch's last data date. Guard: ≥ minObs observed days
    * (api.py:296-299); under-observed combinations are dropped, and if
    * ALL drop a [[DataQualityError]] is thrown (api.py:332-336). */
  def naiveForecast(series: DataFrame, horizonDays: Int,
                    holidays: Set[LocalDate] = Set.empty,
                    minObs: Int = 30,
                    maxWeeksBack: Int = 52): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val bounds = series.groupBy($"sucursal", $"metric")
      .agg(max($"fecha").as("last_date"), count(lit(1)).as("n_obs"))
      .filter($"n_obs" >= minObs)
    if (bounds.isEmpty)
      throw new DataQualityError(
        s"no (sucursal, metric) series with >= $minObs observations")

    // target dates × candidate weeks-back, first valid candidate wins
    val targets = bounds.select($"sucursal", $"metric", $"last_date",
      explode(sequence(lit(1), lit(horizonDays))).as("step"))
      .withColumn("fecha", expr("date_add(last_date, step)"))
    val cands = targets.select($"sucursal", $"metric", $"last_date",
        $"fecha", explode(sequence(lit(1), lit(maxWeeksBack))).as("k"))
      .withColumn("src", expr("date_sub(fecha, 7 * k)"))
      .filter($"src" <= $"last_date" &&
        !holidayAdjacent($"src", holidays))
    val w = Window.partitionBy($"sucursal", $"metric", $"fecha")
      .orderBy($"k")
    val first = cands.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
    first
      .join(series.select($"sucursal", $"metric",
          $"fecha".as("src"), $"valor"),
        Seq("sucursal", "metric", "src"), "left")
      .select($"sucursal", $"fecha", $"metric",
        coalesce($"valor", lit(0.0)).as("valor"))
      // fallback rows for targets with no valid candidate at all → 0.0
      .unionByName(
        targets.join(first.select($"sucursal", $"metric", $"fecha"),
            Seq("sucursal", "metric", "fecha"), "left_anti")
          .select($"sucursal", $"fecha", $"metric",
            lit(0.0).as("valor")))
      .orderBy($"sucursal", $"fecha", $"metric")
  }

  /** One daily observation of a (branch, metric) series. */
  final case class SeriesRow(sucursal: String, metric: String,
                             fecha: java.sql.Date, valor: Double)

  /** Log-AR forecast (W8): per-(sucursal, metric) series collected
    * INSIDE `flatMapGroups` on executors — the cluster parallelizes
    * across branch × metric, each tiny series fits locally
    * (arima.py:31-185 contract; see [[ArimaLite]]). Combinations with
    * < minObs observations are skipped; all-skipped raises
    * (api.py:296-336). */
  def arimaForecast(series: DataFrame, horizonDays: Int,
                    minObs: Int = 30): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    // emptiness guard runs on the tiny bounds aggregate, NOT on the
    // fitted output — out.isEmpty would execute the whole per-series
    // grid twice (once for the check, once for the caller's action)
    val anyEligible = !series.groupBy($"sucursal", $"metric")
      .agg(count(lit(1)).as("n")).filter($"n" >= minObs).isEmpty
    if (!anyEligible)
      throw new DataQualityError(
        s"no (sucursal, metric) series with >= $minObs observations")
    val out = series.select($"sucursal", $"metric",
        $"fecha".cast("date").as("fecha"), $"valor".cast("double"))
      .as[SeriesRow]
      .groupByKey(r => (r.sucursal, r.metric))
      .flatMapGroups { (key: (String, String),
                        it: Iterator[SeriesRow]) =>
        val (suc, m) = key
        val rows = it.toArray.sortBy(_.fecha.getTime)
        if (rows.length < minObs) Iterator.empty
        else {
          val fc = ArimaLite.forecastLog1p(rows.map(_.valor), horizonDays)
          val last = rows.last.fecha.toLocalDate
          fc.iterator.zipWithIndex.map { case (v, i) =>
            SeriesRow(suc, m,
              java.sql.Date.valueOf(last.plusDays(i + 1L)), v)
          }
        }
      }.toDF()
    out.orderBy($"sucursal", $"fecha", $"metric")
  }

  /** Deposit schedule over the forecast window: cash batched Mon/Wed/
    * Fri, cards next-business-day; values from historical where the
    * source date ≤ last historical date, else from the forecast
    * (summed across branches — cash_flow.py:19-85). Output
    * (fecha, efectivo, credito, debito, total). */
  def depositSchedule(forecastLong: DataFrame,
                      historicalMart: DataFrame): DataFrame = {
    val spark = forecastLong.sparkSession
    import spark.implicits._
    val metrics = Seq("ingreso_efectivo", "ingreso_credito",
      "ingreso_debito")

    val lastHist = historicalMart.agg(max($"fecha".cast("date")))
      .collect()(0).getDate(0)
    // an empty historical mart would make both null-comparison filters
    // below drop every row → silent all-zero schedule; fail loudly
    if (lastHist == null)
      throw new DataQualityError(
        "depositSchedule: historical mart has no rows (no last date)")

    // absent metric columns count as zero (cash_flow.py:42-57)
    val histCols = historicalMart.columns.toSet
    val histDaily = historicalMart
      .select(($"fecha".cast("date").as("d") +:
        metrics.map(m =>
          (if (histCols(m)) coalesce(col(m), lit(0.0))
           else lit(0.0)).as(m))): _*)
      .groupBy($"d")
      .agg(sum(col(metrics.head)).as(metrics.head),
        metrics.tail.map(m => sum(col(m)).as(m)): _*)
    val fcDaily = forecastLong.filter($"metric".isin(metrics: _*))
      .groupBy($"fecha".cast("date").as("d"))
      .pivot("metric", metrics).sum("valor")
      .na.fill(0.0, metrics)

    // hist-else-forecast union: hist rows ≤ lastHist, forecast after
    val daily = histDaily.filter($"d" <= lit(lastHist))
      .unionByName(fcDaily.filter($"d" > lit(lastHist)))

    val deposits = forecastLong.select($"fecha".cast("date").as("dep"))
      .distinct()
    // dayofweek: 1=Sun..7=Sat. Cash sources (deposit_schedule.py:31-67):
    // Mon←{-3,-2,-1}, Wed←{-2,-1}, Fri←{-2,-1}, else none.
    val cashSrcs = expr("""CASE dayofweek(dep)
        WHEN 2 THEN array(date_sub(dep,3), date_sub(dep,2), date_sub(dep,1))
        WHEN 4 THEN array(date_sub(dep,2), date_sub(dep,1))
        WHEN 6 THEN array(date_sub(dep,2), date_sub(dep,1))
        ELSE array() END""")
    // Card sources (:70-101): Mon←{-3,-2,-1}; else previous business day
    val cardSrcs = expr("""CASE dayofweek(dep)
        WHEN 2 THEN array(date_sub(dep,3), date_sub(dep,2), date_sub(dep,1))
        WHEN 1 THEN array(date_sub(dep,2))
        WHEN 7 THEN array(date_sub(dep,1))
        ELSE array(date_sub(dep,1)) END""")

    def total(srcs: Column, metric: String, alias: String) = {
      deposits.select($"dep", explode(srcs).as("d"))
        .join(daily, Seq("d"), "left")
        .groupBy($"dep")
        .agg(coalesce(sum(coalesce(col(metric), lit(0.0))), lit(0.0))
          .as(alias))
    }
    val cash = total(cashSrcs, "ingreso_efectivo", "efectivo")
    val cred = total(cardSrcs, "ingreso_credito", "credito")
    val deb = total(cardSrcs, "ingreso_debito", "debito")

    deposits
      .join(cash, Seq("dep"), "left").join(cred, Seq("dep"), "left")
      .join(deb, Seq("dep"), "left")
      .select($"dep".as("fecha"),
        coalesce($"efectivo", lit(0.0)).as("efectivo"),
        coalesce($"credito", lit(0.0)).as("credito"),
        coalesce($"debito", lit(0.0)).as("debito"))
      .withColumn("total", $"efectivo" + $"credito" + $"debito")
      .orderBy($"fecha")
  }

  /** End-to-end: mart → ingreso_total → densified series → naive
    * forecast → deposit schedule (api.py:179-362 shape). */
  def runPaymentsForecast(mart: DataFrame, horizonDays: Int = 7,
                          metrics: Seq[String] = DefaultMetrics,
                          holidays: Set[LocalDate] = Set.empty,
                          model: String = "naive",
                          minObs: Int = 30)
      : (DataFrame, DataFrame) = {
    val withTotal = withIngresoTotal(mart)
    val series = buildDailySeries(withTotal, metrics)
    val fc = model match {
      case "naive" => naiveForecast(series, horizonDays, holidays, minObs)
      case "arima" => arimaForecast(series, horizonDays, minObs)
      case other => throw new ConfigError(s"unknown model: $other")
    }
    // The schedule derives deposits + all three bucket totals from the
    // forecast frame — five references, each of which would re-execute
    // the entire candidate-walk subtree. The forecast output is tiny
    // (branches x metrics x horizon), so materialize it once; at
    // cluster scale this is the same call the q82 curation capstone
    // makes on its shared shingle basis.
    val fcM = fc.localCheckpoint()
    (fcM, depositSchedule(fcM, withTotal))
  }
}
