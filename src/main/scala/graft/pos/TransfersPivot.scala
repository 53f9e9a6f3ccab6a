package graft.pos

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Transfer lines → "Gasto de Insumos" pivot: category rows × branch
  * columns with TOTAL row and column, plus the unmapped-loss report
  * (`/root/reference/src/pos_core/etl/marts/transfers.py:38-247`).
  */
object TransfersPivot {

  /** (origen, departamento) → internal bucket (transfers.py:125-166);
    * null = unmapped. `out` remaps the emitted bucket value IN the
    * chain — callers that need bucket→display-label composition use it
    * so the result is ONE when-chain, not a chain-of-derived-columns
    * that projection collapse re-inlines multiplicatively. */
  def bucketRowMapped(origen: Column, depto: Column,
                      out: String => String): Column = {
    val o = upper(trim(origen))
    val d = upper(trim(depto))
    def v(bucket: String): Column = lit(out(bucket))
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
      when(d === "REFRIGERADOS Y CONGELADOS", v("REFRICONGE"))
        .when(d === "TOSTADOR", v("TOSTADOR"))) {
      case (acc, (k, b)) => acc.when(d === k, v(b))
    }
    when(o === "ALMACEN PRODUCTO TERMINADO",
      when(d === "COCINA", v("COMIDA SALADA"))
        .when(d === "REPOSTERIA", v("REPO"))
        .when(d === "PAN DULCE", v("PAN DULCE"))
        .when(d === "PAN SALADO", v("PAN SALADO"))
        .when(d === "PANADERIA DULCE Y SALADA", v("PAN DULCE Y SALADA")))
      .when(o === "ALMACEN GENERAL", general)
  }

  def bucketRow(origen: Column, depto: Column): Column =
    bucketRowMapped(origen, depto, identity)

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
    // ONE when-chain per output column. The previous spelling chained
    // derived columns (bucket → row_label, suc_code → branch) and the
    // filter/groupBy referenced them again — projection collapse then
    // re-inlines each chain into every reference, multiplying the
    // codegen'd expression tree past what JIT handles (measured 3.5 s
    // for a 150k-row pivot; ~0.5 s spelled flat).
    val branch = SucMap.foldLeft(lit(null).cast("string")) {
      case (acc, (full, code)) =>
        when(upper(trim($"sucursal_destino")) === full,
          lit(SucToDisplay(code))).otherwise(acc)
    }
    val labelMap = BucketToRowLabel.toMap
    val rowLabel = bucketRowMapped($"almacen_origen", $"departamento",
      labelMap)
    val base = transfers
      .select(rowLabel.as("row_label"), branch.as("branch"), $"costo")
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
