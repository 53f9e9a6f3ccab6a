package graft.pos

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Fetch/load idempotence + edge CSV IO. */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private def payments: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("Kavia", "2025-01-15", 1, "Efectivo", 100.0),
      ("Kavia", "2025-01-16", 2, "Tarjeta Crédito", 50.0),
      ("Kavia", "2025-02-01", 3, "Efectivo", 75.0) // outside range
    ).toDF("sucursal", "operating_date", "order_index", "payment_method",
      "ticket_total")
      .withColumn("operating_date",
        org.apache.spark.sql.functions.col("operating_date").cast("date"))
  }

  test("fetchPaymentsDaily: compute once, serve from storage, force recompute") {
    val root = Files.createTempDirectory("api").toString
    val api = new PosApi(spark, root)
    val m1 = api.fetchPaymentsDaily(payments, "2025-01-01", "2025-01-31")
    assert(m1.count() == 2) // Feb row filtered by range
    assert(m1.columns.contains("ingreso_efectivo"))
    // second fetch: served from storage (manifest skip). Prove it by
    // passing a DIFFERENT input — output must still be the stored one.
    val other = payments.withColumn("ticket_total",
      org.apache.spark.sql.functions.lit(999.0))
    val m2 = api.fetchPaymentsDaily(other, "2025-01-01", "2025-01-31")
    assert(m2.collect().map(_.getAs[Double]("ingreso_efectivo")).sum == 100.0)
    // force: recomputes from the new input
    val m3 = api.fetchPaymentsDaily(other, "2025-01-01", "2025-01-31",
      mode = "force")
    assert(m3.collect().map(_.getAs[Double]("ingreso_efectivo")).sum == 999.0)
  }

  test("invalid mode raises ConfigError (marts.py mode validation)") {
    val api = new PosApi(spark, Files.createTempDirectory("api").toString)
    intercept[ConfigError] {
      api.fetchPaymentsDaily(payments, "2025-01-01", "2025-01-31",
        mode = "sometimes")
    }
  }

  test("order_times raw facade: fetch gates on manifests, load verifies") {
    val dir = Files.createTempDirectory("ot").toString
    val ot = new OrderTimesRaw(dir)
    // load before any fetch raises (raw.py FileNotFoundError contract)
    intercept[ExtractionError] { ot.load("2025-01-01", "2025-01-31") }

    var calls = 0
    var lastChunks: Seq[(java.time.LocalDate, java.time.LocalDate)] = Nil
    def dl(chunks: Seq[(java.time.LocalDate, java.time.LocalDate)]): Unit = {
      calls += 1; lastChunks = chunks
    }
    ot.fetch("2025-01-01", "2025-01-31")(dl)
    assert(calls == 1 && lastChunks.nonEmpty)
    assert(ot.load("2025-01-01", "2025-01-31").status == "ok")
    // second missing-mode fetch: manifest covers the range → no call
    ot.fetch("2025-01-01", "2025-01-31")(dl)
    assert(calls == 1)
    // force re-downloads the whole range
    ot.fetch("2025-01-01", "2025-01-31", mode = "force")(dl)
    assert(calls == 2)
    assert(lastChunks == Seq((java.time.LocalDate.parse("2025-01-01"),
      java.time.LocalDate.parse("2025-01-31"))))
    // a failing download leaves a failed manifest → load still raises
    val dir2 = Files.createTempDirectory("ot2").toString
    val ot2 = new OrderTimesRaw(dir2)
    intercept[RuntimeException] {
      ot2.fetch("2025-02-01", "2025-02-28") { _ =>
        throw new RuntimeException("transport down") }
    }
    intercept[ExtractionError] { ot2.load("2025-02-01", "2025-02-28") }
    // invalid mode raises before anything runs
    intercept[ConfigError] {
      ot.fetch("2025-01-01", "2025-01-31", mode = "always")(dl)
    }
  }

  test("CSV BOM round-trip preserves accents and parses back") {
    val s = spark
    import s.implicits._
    val df = Seq(("Tarjeta Crédito", 1234.56), ("Día", -7.0))
      .toDF("método", "monto")
    val out = Files.createTempDirectory("csv").resolve("out.csv").toString
    EdgeIO.writeCsvWithBom(df, out)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte &&
      bytes(2) == 0xBF.toByte)
    val back = EdgeIO.readCleanCsvs(spark, out)
    val rows = back.collect()
    // BOM must not leak into the first header name
    assert(back.columns.toSeq == Seq("método", "monto"))
    assert(rows.map(_.getString(0)).toSet ==
      Set("Tarjeta Crédito", "Día"))
  }
}
