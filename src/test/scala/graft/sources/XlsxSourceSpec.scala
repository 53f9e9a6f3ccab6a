package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 xlsx format: `spark.read.format("xlsx")` must
  * deliver the same bronze grid as the `Xlsx.readGrid` facade, one
  * partition per workbook, with column pruning reaching the reader
  * and an explicit schema skipping inference. */
class XlsxSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeWorkbooks(): String = {
    val dir = Files.createTempDirectory("xlsx_dsv2").toFile
    Files.write(new java.io.File(dir, "a.xlsx").toPath,
      Xlsx.writeBytes(Seq("Pagos" -> Seq(
        Seq("Fecha", "Total"),
        Seq("15/01/2025", 1234.56)))))
    Files.write(new java.io.File(dir, "b.xlsx").toPath,
      Xlsx.writeBytes(Seq("Resumen" -> Seq(Seq("x")),
        "Pagos" -> Seq(
          Seq("Fecha", "Total", "Nota"),
          Seq("16/01/2025", "5,000.00", "ok")))))
    dir.getAbsolutePath
  }

  test("format(xlsx) matches the readGrid facade, sheet rules included") {
    val dir = writeWorkbooks()
    val ds = spark.read.format("xlsx").option("sheet", "Pagos").load(dir)
    // 3-wide grid: b.xlsx's Pagos has 3 columns → width governs
    assert(ds.columns.toSeq == Seq("_file", "_row", "_c0", "_c1", "_c2"))
    val got = ds.collect().map(r => (
      r.getAs[String]("_file").split('/').last,
      r.getAs[Long]("_row"),
      r.getAs[String]("_c0"), r.getAs[String]("_c1"),
      r.getAs[String]("_c2"))).toSet
    assert(got == Set(
      ("a.xlsx", 0L, "Fecha", "Total", null),
      ("a.xlsx", 1L, "15/01/2025", "1234.56", null),
      ("b.xlsx", 0L, "Fecha", "Total", "Nota"),
      ("b.xlsx", 1L, "16/01/2025", "5,000.00", "ok")))
    // one partition per workbook
    assert(ds.rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the reader; explicit schema skips inference") {
    val dir = writeWorkbooks()
    val pruned = spark.read.format("xlsx").option("sheet", "Pagos")
      .load(dir).select("_c1")
    assert(pruned.collect().map(_.getString(0)).toSet ==
      Set("Total", "1234.56", "5,000.00"))
    // the physical scan's read schema carries only the pruned column
    val scanLine = pruned.queryExecution.executedPlan.toString
    assert(scanLine.contains("_c1") && !scanLine.contains("_c2"), scanLine)
    // explicit (narrower) schema: no inference parse, width as given
    val explicit = spark.read.format("xlsx").option("sheet", "Pagos")
      .schema(XlsxDataSource.gridSchema(2)).load(dir)
    assert(explicit.columns.toSeq == Seq("_file", "_row", "_c0", "_c1"))
    assert(explicit.count() == 4)
  }

  test("missing sheet fails with the available names in the message") {
    val dir = writeWorkbooks()
    val e = intercept[Exception] {
      spark.read.format("xlsx").option("sheet", "Nope").load(dir).collect()
    }
    assert(e.getMessage.contains("Nope") || e.getCause != null)
  }
}
