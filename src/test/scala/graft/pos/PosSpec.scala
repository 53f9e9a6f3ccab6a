package graft.pos

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** POS-domain mart/QA/forecast behavior on the FIXTURES.md scenarios —
  * the Spark twin of the reference's own unit tiers (SURVEY §5). */
class PosSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  private def paymentsFixture: DataFrame = {
    val s = spark
    import s.implicits._
    // FIXTURES.md §1: split-payment ticket, elimination flag, 2 branches
    Seq(
      ("Kavia", "2025-01-15", 1001, "Efectivo", 100.0, 10.0, 100.0, 25.0, false),
      ("Kavia", "2025-01-15", 1001, "Tarjeta Crédito", 50.0, 5.0, 100.0, 25.0, false),
      ("Kavia", "2025-01-15", 1002, "Tarjeta Débito", 80.0, 10.0, 100.0, 25.0, true),
      ("Kavia", "2025-01-16", 1003, "UberEats", 60.0, 0.0, 60.0, 0.0, false),
      ("Nativa", "2025-01-15", 2001, "RAPPI pago", 40.0, 4.0, 40.0, 4.0, false),
      ("Nativa", "2025-01-15", 2002, "Transferencia bancaria", 30.0, 0.0, 40.0, 4.0, false)
    ).toDF("sucursal", "operating_date", "order_index", "payment_method",
      "ticket_total", "ticket_tip", "day_total", "total_day_tips",
      "elimination_present")
      .withColumn("operating_date",
        org.apache.spark.sql.functions.col("operating_date").cast("date"))
  }

  test("payment bucketing: rule order and accents (payments_daily.py:157-194)") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "Efectivo" -> "ingreso_efectivo",
      "EFECTIVO MXN" -> "ingreso_efectivo",
      "Rappi crédito" -> "ingreso_rappi",        // rappi wins over credito
      "UberEats" -> "ingreso_ubereats",
      "Subsidio TEC" -> "ingreso_SubsidioTEC",
      "Transferencia" -> "ingreso_transferencia",
      "AMEX" -> "ingreso_amex",
      "American Express" -> "ingreso_amex",
      "Tarjeta Débito" -> "ingreso_debito",
      "Tarjeta DEBITO" -> "ingreso_debito",      // accent-insensitive
      "Tarjeta Crédito" -> "ingreso_credito",
      "Vales" -> "ingreso_otros",
      "" -> "ingreso_otros")
    val got = cases.map(_._1).toDF("m")
      .select(PaymentsDaily.bucketForPaymentMethod($"m"))
      .collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("payments daily mart: hand-computed values (payments_daily.py:125-133)") {
    val mart = PaymentsDaily.aggregate(paymentsFixture,
      holidays = Set(LocalDate.parse("2025-01-15")))
    val rows = mart.collect().map(r =>
      (r.getAs[String]("sucursal"), r.getAs[java.sql.Date]("fecha").toString) -> r).toMap
    val k15 = rows(("Kavia", "2025-01-15"))
    assert(k15.getAs[Double]("ingreso_efectivo") == 100.0)
    assert(k15.getAs[Double]("ingreso_credito") == 50.0)
    assert(k15.getAs[Double]("ingreso_debito") == 80.0)
    assert(k15.getAs[Double]("propinas") == 25.0)
    assert(k15.getAs[Long]("num_tickets") == 2)
    assert(k15.getAs[Long]("tickets_with_eliminations") == 1)
    assert(k15.getAs[Double]("pct_tickets_with_eliminations") == 50.0)
    assert(k15.getAs[Boolean]("is_national_holiday"))
    val n15 = rows(("Nativa", "2025-01-15"))
    assert(n15.getAs[Double]("ingreso_rappi") == 40.0)
    assert(n15.getAs[Double]("ingreso_transferencia") == 30.0)
    val k16 = rows(("Kavia", "2025-01-16"))
    assert(k16.getAs[Double]("ingreso_ubereats") == 60.0)
    assert(!k16.getAs[Boolean]("is_national_holiday"))
  }

  test("tip reconciliation aborts on mismatch (Q6, payments_daily.py:368-397)") {
    val s = spark
    import s.implicits._
    val bad = Seq(
      ("Kavia", "2025-01-15", 1, "Efectivo", 10.0, 1.0, 99.0)
    ).toDF("sucursal", "operating_date", "order_index", "payment_method",
      "ticket_total", "ticket_tip", "total_day_tips")
    val e = intercept[DataQualityError] { PaymentsDaily.aggregate(bad) }
    assert(e.getMessage.contains("tip reconciliation"))
  }

  test("missing required column raises (Q1)") {
    val s = spark
    import s.implicits._
    val df = Seq(("K", "2025-01-01")).toDF("sucursal", "operating_date")
    val e = intercept[DataQualityError] { PaymentsDaily.aggregate(df) }
    assert(e.getMessage.contains("payment_method"))
  }

  private def salesFixture: DataFrame = {
    val s = spark
    import s.implicits._
    // FIXTURES.md §2 (no pdv_txn_id → composite key)
    Seq(
      ("Kavia", "2025-01-15", 1001, "CAFE01", false, "CAFE", 1.0, 45.0, 52.2),
      ("Kavia", "2025-01-15", 1001, "PAN01", false, "PAN DULCE", 2.0, 30.0, 34.8),
      ("Kavia", "2025-01-15", 1001, "MOD_LECHE", true, "MOD BEBIDAS", 1.0, 10.0, 11.6),
      ("Kavia", "2025-01-15", 1002, "CAFE01", false, "CAFE", 1.0, 45.0, 52.2),
      ("Nativa", "2025-01-15", 2001, "JUGO01", false, "JUGOS", 1.0, 35.0, 40.6),
      ("Nativa", "2025-01-15", 2001, "PAN02", false, "PAN DULCE", 1.0, 25.0, 29.0)
    ).toDF("sucursal", "operating_date", "order_id", "item_key",
      "is_modifier", "group", "quantity", "subtotal_item", "total_item")
  }

  test("sales by ticket: dynamic pivot + total cost (A7/A9)") {
    val t = SalesByTicket.aggregateByTicket(salesFixture)
    assert(t.count() == 3) // item-line grain → ticket grain
    val cols = t.columns.toSet
    assert(cols("CAFE_subtotal") && cols("PAN_DULCE_total") &&
      cols("MOD_BEBIDAS_subtotal") && cols("total_ticket_cost"))
    val k1001 = t.filter(t("order_id") === 1001).collect()(0)
    assert(k1001.getAs[Double]("CAFE_subtotal") == 45.0)
    assert(k1001.getAs[Double]("PAN_DULCE_subtotal") == 30.0)
    assert(math.abs(k1001.getAs[Double]("total_ticket_cost") -
      (52.2 + 34.8 + 11.6)) < 1e-9)
    val n2001 = t.filter(t("order_id") === 2001).collect()(0)
    assert(n2001.getAs[Double]("CAFE_subtotal") == 0.0) // filled
    assert(math.abs(n2001.getAs[Double]("total_ticket_cost") -
      (40.6 + 29.0)) < 1e-9)
  }

  test("sales by ticket: pdv_txn_id key when fully populated") {
    val s = spark
    import s.implicits._
    val withPdv = salesFixture.withColumn("pdv_txn_id",
      org.apache.spark.sql.functions.concat(
        $"sucursal", org.apache.spark.sql.functions.lit("-"), $"order_id"))
    assert(SalesByTicket.groupingKey(withPdv) == Seq("pdv_txn_id"))
    assert(SalesByTicket.groupingKey(salesFixture) ==
      Seq("order_id", "sucursal", "operating_date"))
  }

  test("sales by group: RAW_MAP consolidation + row order (sales_by_group.py)") {
    val t = SalesByTicket.aggregateByTicket(salesFixture)
    val g = SalesByGroup.buildCategoryPivot(t)
    val rows = g.collect()
    val labels = rows.map(_.getString(0)).toSeq
    // CAFE (unmapped raw) → EXTRAS y MISC default; MOD BEBIDAS → EXTRAS;
    // PAN DULCE maps to itself; JUGOS (unmapped) → EXTRAS
    assert(labels.contains("PAN DULCE") && labels.contains("EXTRAS y MISC"))
    // fixed order: PAN DULCE (RowOrder) before extras appended at bottom
    val pan = rows.find(_.getString(0) == "PAN DULCE").get
    val kaviaIdx = g.columns.indexOf("Kavia")
    val nativaIdx = g.columns.indexOf("Nativa")
    assert(pan.getDouble(kaviaIdx) == 30.0)
    assert(pan.getDouble(nativaIdx) == 25.0)
    val extras = rows.find(_.getString(0) == "EXTRAS y MISC").get
    assert(extras.getDouble(kaviaIdx) == 45.0 + 10.0 + 45.0)
    assert(extras.getDouble(nativaIdx) == 35.0)
  }

  private def transfersFixture: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("T-1", "ALMACEN PRODUCTO TERMINADO", "PANEM - HOTEL KAVIA N", "COCINA", 480.0),
      ("T-2", "ALMACEN PRODUCTO TERMINADO", "PANEM - PLAZA NATIVA", "PAN DULCE", 120.0),
      ("T-3", "ALMACEN GENERAL", "PANEM - HOTEL KAVIA N", "ABARROTES", 200.0),
      ("T-4", "ALMACEN GENERAL", "PANEM - LA CARRETA N", "TOSTADOR", 90.0),
      ("T-5", "ALMACEN GENERAL", "PANEM - HOTEL KAVIA N", "MISTERIO", 55.0) // unmapped
    ).toDF("orden", "almacen_origen", "sucursal_destino", "departamento",
      "costo")
  }

  test("transfers pivot: buckets, TOTAL row/col, unmapped report (A12/F11)") {
    val p = TransfersPivot.buildPivot(transfersFixture)
    val rows = p.collect()
    assert(rows.last.getString(0) == "TOTAL")
    val kIdx = p.columns.indexOf("Kavia")
    val comida = rows.find(_.getString(0) == "Comida Salada").get
    assert(comida.getDouble(kIdx) == 480.0)
    val cafe = rows.find(_.getString(0) == "Cafe").get
    assert(cafe.getDouble(p.columns.indexOf("Carreta")) == 90.0)
    val totalIdx = p.columns.indexOf("TOTAL")
    assert(rows.last.getDouble(totalIdx) == 480.0 + 120.0 + 200.0 + 90.0)
    // unmapped row excluded from pivot, reported separately
    val um = TransfersPivot.unmappedReport(transfersFixture).collect()(0)
    assert(um.getLong(0) == 1 && um.getDouble(1) == 55.0)
  }

  private def martFixture(days: Int, spike: Boolean): DataFrame = {
    val s = spark
    import s.implicits._
    val base = LocalDate.parse("2025-01-01")
    val rows = (0 until days).flatMap { i =>
      val d = base.plusDays(i.toLong).toString
      val v = if (spike && i == days - 1) 100000.0
              else 1000.0 + 100.0 * (i % 7)
      Seq(("Kavia", d, v, 500.0, 300.0, 50L),
          ("Nativa", d, v * 0.5, 250.0, 150.0, 30L))
    }
    rows.toDF("sucursal", "fecha", "ingreso_efectivo", "ingreso_credito",
      "ingreso_debito", "num_tickets")
      .withColumn("fecha", org.apache.spark.sql.functions.col("fecha").cast("date"))
  }

  private def padMart(df: DataFrame): DataFrame = {
    // add the remaining required mart columns as zeros
    val zeros = Seq("ingreso_amex", "ingreso_ubereats", "ingreso_rappi",
      "ingreso_transferencia", "ingreso_SubsidioTEC", "ingreso_otros",
      "propinas")
    zeros.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.lit(0.0)))
  }

  test("QA: levels, zero-method, missing day, duplicate, z-score spike") {
    val s = spark
    import s.implicits._
    val good = padMart(martFixture(70, spike = true))
    // drop one day for Kavia + duplicate one Nativa day
    val gap = good.filter(!($"sucursal" === "Kavia" &&
      $"fecha" === "2025-01-10"))
    val dup = gap.unionByName(
      gap.filter($"sucursal" === "Nativa" && $"fecha" === "2025-01-05"))
    val r = Qa.runPaymentsQa(dup, level = 4)
    assert(r.summary("null_key_rows") == 0)
    assert(r.summary("negative_rows") == 0)
    assert(r.summary("missing_days") == 1)
    assert(r.summary("duplicate_days") == 1)
    assert(r.summary("zscore_anomalies") >= 1) // the spike
    assert(!r.hasErrors)
    // zero-method: tickets but no card income
    val zm = Qa.runPaymentsQa(padMart(martFixture(5, spike = false))
      .withColumn("ingreso_credito", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("ingreso_debito", org.apache.spark.sql.functions.lit(0.0)),
      level = 3)
    assert(zm.summary("zero_method_days") == 10)
  }

  test("forecast: naive lag-7 values, holiday skip, deposit schedule") {
    val mart = padMart(martFixture(35, spike = false))
    // value pattern repeats weekly → forecast = last week's values
    val (fc, dep) = Forecast.runPaymentsForecast(mart, horizonDays = 7)
    import org.apache.spark.sql.functions._
    val fcRows = fc.filter(col("sucursal") === "Kavia" &&
      col("metric") === "ingreso_efectivo").collect()
    assert(fcRows.length == 7)
    // last data date = 2025-02-04 (day 34, i%7 = 34%7 = 6 → 1600.0);
    // forecast for 2025-02-05 = value of 2025-01-29 (i=28, 28%7=0 → 1000)
    val f1 = fcRows.find(_.getAs[java.sql.Date]("fecha").toString ==
      "2025-02-05").get
    assert(f1.getAs[Double]("valor") == 1000.0)
    // deposit schedule: every forecast date has a row; totals consistent
    val depRows = dep.collect()
    assert(depRows.length == 7)
    depRows.foreach { r =>
      assert(math.abs(r.getAs[Double]("total") -
        (r.getAs[Double]("efectivo") + r.getAs[Double]("credito") +
          r.getAs[Double]("debito"))) < 1e-9)
    }
    // 2025-02-05 is a Wednesday → cash = Mon+Tue (hist), cards = Tue
    val wed = depRows.find(_.getAs[java.sql.Date]("fecha").toString ==
      "2025-02-05").get
    // Mon 2025-02-03 i=33 → 33%7=5 → 1500; Tue 2025-02-04 i=34 → 1600
    // summed across Kavia + Nativa (×1.5)
    assert(math.abs(wed.getAs[Double]("efectivo") -
      ((1500.0 + 1600.0) * 1.5)) < 1e-9)
    assert(math.abs(wed.getAs[Double]("credito") - (500.0 + 250.0)) < 1e-9)
  }

  test("QA monthly pivots and seeded month-pair sample (A13/U6)") {
    val mart = padMart(martFixture(70, spike = false))
    val (monthly, sales, elim) = Qa.monthlyPivots(mart)
    // Jan 2025 + Feb 2025 + Mar for 2 branches
    assert(monthly.count() == 6)
    assert(sales.columns.toSet == Set("year_month", "Kavia", "Nativa"))
    assert(elim.count() == 3)
    val jan = monthly.filter(monthly("year_month") === "2025-01" &&
      monthly("sucursal") === "Kavia").collect()(0)
    // 31 days × (efectivo + 500 + 300): efectivo = 1000 + 100*(i%7)
    val efJan = (0 until 31).map(i => 1000.0 + 100.0 * (i % 7)).sum
    assert(jan.getAs[Double]("total_sin_propinas") ==
      efJan + 31 * 800.0)
    // seeded sample: deterministic for a fixed seed, n pairs only
    val s1 = Qa.sampleMonthPairs(mart, 2, seed = 7)
    val s2 = Qa.sampleMonthPairs(mart, 2, seed = 7)
    assert(s1.select("sucursal", "year_month").distinct().count() == 2)
    assert(s1.collect().map(_.toString).sorted.toSeq ==
      s2.collect().map(_.toString).sorted.toSeq)
  }

  test("forecast: arima model end-to-end (W8, flatMapGroups per series)") {
    val mart = padMart(martFixture(35, spike = false))
    val (fc, dep) = Forecast.runPaymentsForecast(mart, horizonDays = 7,
      model = "arima")
    import org.apache.spark.sql.functions._
    val rows = fc.collect()
    // 2 branches × 4 metrics × 7 days
    assert(rows.length == 2 * 4 * 7)
    rows.foreach { r =>
      val v = r.getAs[Double]("valor")
      assert(v >= 0.0 && java.lang.Double.isFinite(v))
    }
    // level sanity: efectivo forecasts in the ballpark of the series
    val ef = fc.filter(col("sucursal") === "Kavia" &&
      col("metric") === "ingreso_efectivo")
      .collect().map(_.getAs[Double]("valor"))
    ef.foreach(v => assert(v > 300.0 && v < 5000.0, s"got $v"))
    assert(dep.count() == 7)
  }

  test("forecast: under-observed series raises (api.py:296-299)") {
    val tiny = padMart(martFixture(5, spike = false))
    val e = intercept[DataQualityError] {
      Forecast.runPaymentsForecast(tiny, horizonDays = 3)
    }
    assert(e.getMessage.contains("observations"))
  }
}
