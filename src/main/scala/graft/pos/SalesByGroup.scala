package graft.pos

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Ticket-wise wide mart → consolidated category × sucursal pivot
  * (`/root/reference/src/pos_core/etl/marts/sales_by_group.py:98-425`).
  *
  * The `{GROUP}_subtotal` → `Grupo_Nuevo` consolidation map is static
  * (34 entries + default); the unpivot is a `stack` over the wide
  * columns (schema-driven, no shuffle), the re-aggregation is one
  * groupBy, and the final category × branch pivot is tiny (10 rows) —
  * its fixed row ordering happens driver-side after collect, exactly
  * where the reference reindexes.
  */
object SalesByGroup {

  /** Fixed output row order (sales_by_group.py:98-109). */
  val RowOrder: Seq[String] = Seq(
    "JUGOS Y BEBIDAS FRIAS", "CAFE Y  BEBIDAS CALIENTES", "DESAYUNOS",
    "COMIDAS", "PIZZA", "REPOSTERIA", "PAN DULCE", "PAN SALADO",
    "PRODUCTOS DE TEMPORADA", "EXTRAS y MISC")

  /** RAW_MAP (sales_by_group.py:112-147) keyed by the normalized form
    * (accents stripped, upper, whitespace collapsed). */
  private def normalizeKey(s: String): String = {
    val noNbsp = s.replace(' ', ' ')
    val deacc = java.text.Normalizer
      .normalize(noNbsp, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
    deacc.toUpperCase.replaceAll("\\s+", " ").trim
  }

  val CategoryMap: Map[String, String] = Map(
    "CAFE Y  BEBIDAS CALIENTES" -> "CAFE Y  BEBIDAS CALIENTES",
    " COMIDAS " -> "COMIDAS",
    " DESAYUNOS " -> "DESAYUNOS",
    "ESPECIALES-" -> "EXTRAS y MISC",
    "ESTANTERIA" -> "EXTRAS y MISC",
    " EXTRAS " -> "EXTRAS y MISC",
    " JUGOS Y BEBIDAS FRIAS " -> "JUGOS Y BEBIDAS FRIAS",
    "PAN DULCE" -> "PAN DULCE",
    " PAN SALADO " -> "PAN SALADO",
    "PANEM  MARKETPLACE" -> "EXTRAS y MISC",
    " PIZZA " -> "PIZZA",
    " PRODUCTOS DE TEMPORADA " -> "PRODUCTOS DE TEMPORADA",
    "RAPPI CAFE Y BEBIDAS CALIENTES" -> "CAFE Y  BEBIDAS CALIENTES",
    "RAPPI COMIDAS" -> "COMIDAS",
    "RAPPI DESAYUNOS" -> "DESAYUNOS",
    "RAPPI JUGOS Y BEBIDAS FRIAS" -> "JUGOS Y BEBIDAS FRIAS",
    "RAPPI PAN DULCE" -> "PAN DULCE",
    "RAPPI PAN SALADO" -> "PAN SALADO",
    "RAPPI PIZZA" -> "PIZZA",
    "RAPPI REPOSTERIA" -> "REPOSTERIA",
    " REPOSTERIA " -> "REPOSTERIA",
    " SUBSIDIO " -> "EXTRAS y MISC",
    " UBER CAFE Y BEBIDAS CALIENTES " -> "CAFE Y  BEBIDAS CALIENTES",
    "UBER COMIDAS" -> "COMIDAS",
    " UBER DESAYUNOS " -> "DESAYUNOS",
    "UBER JUGOS Y BEBIDAS FRIAS" -> "JUGOS Y BEBIDAS FRIAS",
    " UBER PAN DULCE " -> "PAN DULCE",
    "UBER PAN SALADO" -> "PAN SALADO",
    "UBER PIZZA" -> "PIZZA",
    "UBER REPOSTERIA" -> "REPOSTERIA",
    "MOD ALIMENTOS" -> "EXTRAS y MISC",
    "MOD BEBIDAS" -> "EXTRAS y MISC",
    "NATIVA TEMPORALCOMIDA" -> "PRODUCTOS DE TEMPORADA"
  ).map { case (k, v) => normalizeKey(k) -> v }

  /** Column name (`{GROUP}_subtotal`) → Grupo_Nuevo
    * (sales_by_group.py:220-257): the sanitized column name is
    * de-underscored back to a lookup key; unmatched → default. */
  def categoryForColumn(colName: String): String = {
    val raw = colName.stripSuffix("_subtotal").replace('_', ' ')
    CategoryMap.getOrElse(normalizeKey(raw), "EXTRAS y MISC")
  }

  /** Wide ticket mart → long (category, sucursal, subtotal) → pivot
    * category × sucursal, fixed row order + extras appended. */
  def buildCategoryPivot(ticketWise: DataFrame): DataFrame = {
    val spark = ticketWise.sparkSession
    import spark.implicits._
    val subCols = ticketWise.columns.filter(_.endsWith("_subtotal")).toSeq
    if (subCols.isEmpty)
      throw new DataQualityError("no {GROUP}_subtotal columns found")
    if (!ticketWise.columns.contains("sucursal"))
      throw new DataQualityError("missing required column: sucursal")

    // A10: schema-driven unpivot; the col→category map is applied to
    // NAMES (driver-side), so the stack emits the category directly
    val stackArgs = subCols.map { c =>
      val cat = categoryForColumn(c)
      s"'${cat.replace("'", "''")}', coalesce(`$c`, 0.0)"
    }.mkString(", ")
    val long = ticketWise.select($"sucursal",
      expr(s"stack(${subCols.size}, $stackArgs) as (grupo_nuevo, subtotal)"))

    val sucursales = ticketWise.select($"sucursal").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val pivot = long.groupBy($"grupo_nuevo")
      .pivot("sucursal", sucursales)
      .sum("subtotal")
      .na.fill(0.0, sucursales)

    // U4: fixed row order + unexpected categories at the bottom —
    // 10-row result, ordered driver-side like the reference reindex
    val rows = pivot.collect()
    val byCat = rows.map(r => r.getString(0) -> r).toMap
    val extras = rows.map(_.getString(0)).filterNot(RowOrder.contains).sorted
    val ordered: Seq[Row] =
      (RowOrder.filter(byCat.contains) ++ extras).map(byCat)
    spark.createDataFrame(
      spark.sparkContext.parallelize(ordered.toList), pivot.schema)
  }
}
