package graft.pos

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Transfer lines → "Gasto de Insumos" pivot: category rows × branch
  * columns with TOTAL row and column, plus the unmapped-loss report
  * (`/root/reference/src/pos_core/etl/marts/transfers.py:38-247`).
  */
object TransfersPivot {

  /** (origen, departamento) → internal bucket (transfers.py:125-166);
    * null = unmapped. */
  def bucketRow(origen: Column, depto: Column): Column = {
    val o = upper(trim(origen))
    val d = upper(trim(depto))
    val deptNoProc = Map(
      "ABARROTES" -> "ABARROTES (No-PROC)",
      "AZUCAR Y HARINA" -> "HARINAS (No-PROC)",
      "BEBIDAS" -> "BEBIDAS (No-PROC)",
      "DESECHABLE" -> "DESECHABLE (No-PROC)",
      "DESECHABLES" -> "DESECHABLE (No-PROC)",
      "PAPELERIA" -> "PAPELERIA (No-PROC)",
      "QUIMICOS" -> "QUIMICOS (No-PROC)",
      "VERDURA" -> "VERDURA (No-PROC)")
    val general = deptNoProc.foldLeft(
      when(d === "REFRIGERADOS Y CONGELADOS", "REFRICONGE")
        .when(d === "TOSTADOR", "TOSTADOR")) {
      case (acc, (k, v)) => acc.when(d === k, v)
    }
    when(o === "ALMACEN PRODUCTO TERMINADO",
      when(d === "COCINA", "COMIDA SALADA")
        .when(d === "REPOSTERIA", "REPO")
        .when(d === "PAN DULCE", "PAN DULCE")
        .when(d === "PAN SALADO", "PAN SALADO")
        .when(d === "PANADERIA DULCE Y SALADA", "PAN DULCE Y SALADA"))
      .when(o === "ALMACEN GENERAL", general)
  }

  /** Internal bucket → display row label + fixed order
    * (transfers.py:38-84). */
  val BucketToRowLabel: Seq[(String, String)] = Seq(
    "ABARROTES (No-PROC)" -> "No-Procesados (Abarrotes)",
    "HARINAS (No-PROC)" -> "No-Procesados (Harinas)",
    "BEBIDAS (No-PROC)" -> "No-Procesados (Bebidas)",
    "DESECHABLE (No-PROC)" -> "No-Procesados (Deshechables)",
    "PAPELERIA (No-PROC)" -> "No-Procesados (Papelería)",
    "QUIMICOS (No-PROC)" -> "No-Procesados (Químicos)",
    "VERDURA (No-PROC)" -> "No-Procesados (Verdura)",
    "REFRICONGE" -> "No-Procesados (Refri y Conge)",
    "TOSTADOR" -> "Cafe",
    "COMIDA SALADA" -> "Comida Salada",
    "REPO" -> "Repostería",
    "PAN DULCE" -> "Panadería Dulce",
    "PAN SALADO" -> "Panadería Salada",
    "PAN DULCE Y SALADA" -> "Panadería Dulce y Salada")

  /** Full branch name → short code (transfers.py:101-109). */
  val SucMap: Map[String, String] = Map(
    "PANEM - HOTEL KAVIA N" -> "K", "PANEM - PLAZA NATIVA" -> "N",
    "PANEM - LA CARRETA N" -> "C", "PANEM - PLAZA QIN N" -> "Q",
    "PANEM - PUNTO VALLE" -> "PV", "PANEM - HOSPITAL ZAMBRANO N" -> "HZ",
    "PANEM - CREDI CLUB" -> "CC")
  val SucToDisplay: Map[String, String] = Map(
    "K" -> "Kavia", "PV" -> "PV", "Q" -> "Qin", "HZ" -> "Zambrano",
    "C" -> "Carreta", "N" -> "Nativa", "CC" -> "Crediclub")
  val BranchColOrder: Seq[String] = Seq(
    "Kavia", "PV", "Qin", "Zambrano", "Carreta", "Nativa", "Crediclub")

  /** Unmapped rows report: count + lost cost (transfers.py:208-247). */
  def unmappedReport(transfers: DataFrame): DataFrame = {
    import transfers.sparkSession.implicits._
    transfers
      .withColumn("bucket",
        bucketRow($"almacen_origen", $"departamento"))
      .filter($"bucket".isNull)
      .agg(count(lit(1)).as("n_unmapped"),
        coalesce(sum($"costo"), lit(0.0)).as("lost_cost"))
  }

  /** Category × branch pivot with TOTAL column (row-sum) and TOTAL row
    * (column-sums), rounded to 2 (transfers.py:213-246). Expects clean
    * transfer lines with `almacen_origen`, `departamento`,
    * `sucursal_destino`, `costo`. */
  def buildPivot(transfers: DataFrame): DataFrame = {
    val spark = transfers.sparkSession
    import spark.implicits._
    val sucCode = SucMap.foldLeft(lit(null).cast("string")) {
      case (acc, (full, code)) =>
        when(upper(trim($"sucursal_destino")) === full, lit(code))
          .otherwise(acc)
    }
    val display = SucToDisplay.foldLeft(lit(null).cast("string")) {
      case (acc, (code, disp)) =>
        when($"suc_code" === code, lit(disp)).otherwise(acc)
    }
    val labelMap = BucketToRowLabel.toMap
    val rowLabel = labelMap.foldLeft(lit(null).cast("string")) {
      case (acc, (b, l)) => when($"bucket" === b, lit(l)).otherwise(acc)
    }
    val base = transfers
      .withColumn("bucket", bucketRow($"almacen_origen", $"departamento"))
      .withColumn("suc_code", sucCode)
      .withColumn("branch", display)
      .withColumn("row_label", rowLabel)
      .filter($"row_label".isNotNull && $"branch".isNotNull)

    val pivot = base.groupBy($"row_label")
      .pivot("branch", BranchColOrder)
      .sum("costo")
      .na.fill(0.0, BranchColOrder)

    // TOTAL column + rounding
    val rounded = BranchColOrder.foldLeft(pivot)(
      (df, c) => df.withColumn(c, bround(col(c), 2)))
      .withColumn("TOTAL",
        bround(BranchColOrder.map(col).reduce(_ + _), 2))

    // fixed row order + TOTAL row — 14-row result, driver-side
    val rows = rounded.collect()
    val byLabel = rows.map(r => r.getString(0) -> r).toMap
    val order = BucketToRowLabel.map(_._2).filter(byLabel.contains)
    val ordered = order.map(byLabel)
    val nCols = BranchColOrder.size + 1
    val totals = (1 to nCols).map(i =>
      math.rint(ordered.map(_.getDouble(i)).sum * 100) / 100)
    val totalRow = Row.fromSeq("TOTAL" +: totals)
    spark.createDataFrame(
      spark.sparkContext.parallelize((ordered :+ totalRow).toList),
      rounded.schema)
  }
}
