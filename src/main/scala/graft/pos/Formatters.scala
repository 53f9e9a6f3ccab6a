package graft.pos

import java.time.LocalDate
import org.apache.spark.sql.DataFrame

/** Forecast output renderers — console + Telegram-HTML text, mirroring
  * `/root/reference/src/pos_core/forecasting/formatters/console.py` and
  * `telegram.py` (wired by `forecasting/pipeline.py:97-136`).
  *
  * Rendering is inherently driver-side: the forecast frame is
  * branches × metrics × horizonDays rows (tens to hundreds), so
  * [[ForecastResult.collect]] materializes it once and the formatters
  * are pure functions String-in/String-out. The reference's actual
  * Telegram POST lives behind an OPTIONAL import that is absent from
  * the repo (`pipeline.py:22-27` — `TELEGRAM_AVAILABLE = False`), so
  * the message string IS the reference's full testable surface; any
  * real send would ride the same injected-transport seam as S1
  * ([[graft.pos.ingest.Extraction]]).
  */
object Formatters {

  /** Monday-first day names (`date_formatters.py:10`). */
  private val SpanishDaysMon = Vector("Lunes", "Martes", "Miércoles",
    "Jueves", "Viernes", "Sábado", "Domingo")

  private def dayName(d: LocalDate): String =
    SpanishDaysMon(d.getDayOfWeek.getValue - 1)

  /** Python `f"${v:,.2f}"`: half-even rounding of the exact binary
    * double, comma thousands grouping. `new BigDecimal(v)` (exact
    * binary expansion, NOT `valueOf`'s shortest-repr) keeps the
    * boundary behavior identical. */
  private[pos] def money(v: Double): String = {
    val bd = new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN)
    val sym = new java.text.DecimalFormatSymbols(java.util.Locale.US)
    val fmt = new java.text.DecimalFormat("#,##0.00", sym)
    "$" + fmt.format(bd)
  }

  /** One forecast point (sucursal, fecha, metric, valor). */
  final case class ForecastPoint(sucursal: String, fecha: LocalDate,
                                 metric: String, valor: Double)

  /** One deposit-schedule day. */
  final case class DepositDay(fecha: LocalDate, efectivo: Double,
                              credito: Double, debito: Double,
                              total: Double)

  /** Driver-side snapshot of a forecast run (`api.py` ForecastResult:
    * forecast + deposit_schedule frames + horizon metadata). */
  final case class ForecastResult(forecast: Seq[ForecastPoint],
                                  depositSchedule: Seq[DepositDay],
                                  horizonDays: Int = 7)

  object ForecastResult {
    /** Collect the (tiny) forecast + schedule frames produced by
      * [[Forecast.runPaymentsForecast]] into a renderable result. */
    def collect(forecast: DataFrame, depositSchedule: DataFrame,
                horizonDays: Int = 7): ForecastResult = {
      val fc = forecast
        .select("sucursal", "fecha", "metric", "valor").collect().toSeq
        .map(r => ForecastPoint(r.getString(0),
          r.getDate(1).toLocalDate, r.getString(2), r.getDouble(3)))
      val dep = depositSchedule
        .select("fecha", "efectivo", "credito", "debito", "total")
        .collect().toSeq
        .map(r => DepositDay(r.getDate(0).toLocalDate, r.getDouble(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      ForecastResult(fc, dep, horizonDays)
    }
  }

  /** Strip emojis/non-ASCII and HTML tags for cp1252-safe console
    * output (`console.py:13-30`). */
  def sanitizeForConsole(text: String): String =
    text.replaceAll("[^\\x00-\\x7F]+", "").replaceAll("<[^>]+>", "")

  /** Console metric labels are unaccented (`console.py:53-58`);
    * Telegram's carry accents (`telegram.py:33-38`). */
  private val ConsoleMetricNames = Map(
    "ingreso_efectivo" -> "Efectivo", "ingreso_credito" -> "Credito",
    "ingreso_debito" -> "Debito", "ingreso_total" -> "Total")
  private val TelegramMetricNames = Map(
    "ingreso_efectivo" -> "Efectivo", "ingreso_credito" -> "Crédito",
    "ingreso_debito" -> "Débito", "ingreso_total" -> "Total")

  /** Human-readable console rendering (`console.py:33-127`): per
    * branch → per metric daily lines + total, then the deposit
    * schedule with zero-valued buckets suppressed. */
  def formatForecastForConsole(result: ForecastResult): String = {
    if (result.forecast.isEmpty) return "No forecasts available."
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += s"Forecast de Pagos - Proximos ${result.horizonDays} Dias"
    lines += "=" * 60
    lines += ""

    val branches = result.forecast.map(_.sucursal).distinct.sorted
    val metrics = result.forecast.map(_.metric).distinct.sorted
    for (branch <- branches) {
      val bf = result.forecast.filter(_.sucursal == branch)
      lines += s"$branch:"
      for (metric <- metrics) {
        val mf = bf.filter(_.metric == metric).sortBy(_.fecha)
        if (mf.nonEmpty) {
          lines += s"  ${ConsoleMetricNames.getOrElse(metric, metric)}:"
          for (p <- mf)
            lines += s"    ${dayName(p.fecha)} ${p.fecha}: ${money(p.valor)}"
          lines += s"    Total: ${money(mf.map(_.valor).sum)}"
        }
      }
      lines += ""
    }

    if (result.depositSchedule.nonEmpty) {
      lines += "Cash Flow (Depositos Reales):"
      lines += "-" * 60
      for (d <- result.depositSchedule) {
        lines += s"${dayName(d.fecha)} ${d.fecha}:"
        if (d.efectivo > 0) lines += s"  Efectivo: ${money(d.efectivo)}"
        if (d.credito > 0) lines += s"  Credito: ${money(d.credito)}"
        if (d.debito > 0) lines += s"  Debito: ${money(d.debito)}"
        lines += s"  Total: ${money(d.total)}"
        lines += ""
      }
    }
    lines.mkString("\n")
  }

  /** Telegram-HTML rendering (`telegram.py:13-146`): per-branch
    * breakdown, a cross-branch TOTAL section with per-day sums, then
    * the Cash Flow block. Raises on an empty forecast
    * (`telegram.py:29-30`). */
  def formatTelegramMessage(result: ForecastResult): String = {
    if (result.forecast.isEmpty)
      throw new DataQualityError(
        "No forecasts to format: forecast DataFrame is empty")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines +=
      s"📊 <b>Forecast de Pagos - Próximos ${result.horizonDays} Días</b>\n"

    val branches = result.forecast.map(_.sucursal).distinct.sorted
    val metrics = result.forecast.map(_.metric).distinct.sorted
    // metric -> date -> cross-branch sum (telegram.py:49)
    val daily = scala.collection.mutable.Map
      .empty[(String, LocalDate), Double].withDefaultValue(0.0)

    for (branch <- branches) {
      val bf = result.forecast.filter(_.sucursal == branch)
      lines += s"<b>$branch</b>"
      for (metric <- metrics) {
        val mf = bf.filter(_.metric == metric).sortBy(_.fecha)
        if (mf.nonEmpty) {
          lines += s"${TelegramMetricNames.getOrElse(metric, metric)}:"
          for (p <- mf) {
            lines += s"  ${dayName(p.fecha)} ${p.fecha}: ${money(p.valor)}"
            daily((metric, p.fecha)) += p.valor
          }
          lines += s"  <b>Total: ${money(mf.map(_.valor).sum)}</b>\n"
        }
      }
      lines += ""
    }

    lines += "<b>TOTAL:</b>"
    val allDates = daily.keys.map(_._2).toSeq.distinct.sorted
    for (metric <- metrics) {
      lines += s"${TelegramMetricNames.getOrElse(metric, metric)}:"
      for (d <- allDates if daily.contains((metric, d)))
        lines += s"  ${dayName(d)} $d: ${money(daily((metric, d)))}"
      val metricTotal =
        allDates.filter(d => daily.contains((metric, d)))
          .map(d => daily((metric, d))).sum
      lines += s"  <b>Total: ${money(metricTotal)}</b>\n"
    }

    lines += "<b>Cash Flow (Depósitos Reales):</b>"
    for (d <- result.depositSchedule) {
      lines += s"${dayName(d.fecha)} ${d.fecha}:"
      if (d.efectivo > 0) lines += s"  Efectivo: ${money(d.efectivo)}"
      if (d.credito > 0) lines += s"  Crédito: ${money(d.credito)}"
      if (d.debito > 0) lines += s"  Débito: ${money(d.debito)}"
      lines += s"  <b>Total: ${money(d.total)}</b>\n"
    }
    lines.mkString("\n")
  }

  /** Best-effort error notification body (`pipeline.py:132`). */
  def errorTelegram(errorMsg: String): String =
    s"[ERROR] <b>Forecast Pipeline Error</b>\n\nPipeline failed: $errorMsg"
}
