package graft.pos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Item lines → one row per ticket with dynamic per-group amount
  * columns (`/root/reference/src/pos_core/etl/marts/
  * sales_by_ticket.py:115-463`).
  *
  * The column set is data-dependent (A7): one cheap distinct pass over
  * the `group` column (a few dozen values) discovers the pivot domain;
  * the pivot itself is a single shuffle on the ticket key. "first"
  * metadata aggregates are `first(ignoreNulls)` like the reference's
  * positional `first` — at the mart grain every metadata value is
  * constant within a ticket, so this is deterministic in practice.
  */
object SalesByTicket {

  private val Required = Seq("order_id", "group", "subtotal_item", "total_item")
  private val MetaFirstCols = Seq("sucursal", "operating_date", "day_name",
    "week_number", "pdv_txn_id", "order_type", "order_subtype",
    "table_number", "party_size", "server", "terminal")

  /** F13 group → column-safe UPPER_SNAKE (sales_by_ticket.py:97-111);
    * collisions deduped with positional suffixes like uniquify. */
  def sanitize(groups: Seq[String]): Seq[(String, String)] = {
    val base = groups.map(g => g ->
      g.trim.replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("^_+|_+$", "").toUpperCase)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    base.map { case (g, n) =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      g -> (if (k == 0) n else s"${n}_$k")
    }
  }

  /** Ticket grouping key: `pdv_txn_id` when present and fully
    * populated, else the composite (sales_by_ticket.py:245-264). */
  def groupingKey(df: DataFrame): Seq[String] = {
    val cols = df.columns.toSet
    if (cols("pdv_txn_id") &&
        df.filter(col("pdv_txn_id").isNull).isEmpty) Seq("pdv_txn_id")
    else Seq("order_id", "sucursal", "operating_date").filter(cols)
  }

  def aggregateByTicket(lines: DataFrame): DataFrame = {
    val cols = lines.columns.toSet
    val missing = Required.filterNot(cols)
    if (missing.nonEmpty)
      throw new DataQualityError(
        s"missing required columns: ${missing.mkString(", ")}")

    val spark = lines.sparkSession
    import spark.implicits._
    val key = groupingKey(lines)

    // A7 domain discovery: tiny distinct collect (driver-side names
    // only). Null groups are excluded like pandas groupby drops NaN
    // keys — their rows still count toward ticket metadata below.
    val groups = lines.select($"group").distinct()
      .collect().flatMap(r => Option(r.getString(0))).sorted.toSeq
    val named = sanitize(groups)

    val pivoted = lines.filter($"group".isNotNull)
      .groupBy(key.map(col): _*)
      .pivot("group", groups)
      .agg(sum($"subtotal_item").as("subtotal"),
        sum($"total_item").as("total"))
    val renamed = named.foldLeft(pivoted) { case (df, (g, n)) =>
      df.withColumnRenamed(s"${g}_subtotal", s"${n}_subtotal")
        .withColumnRenamed(s"${g}_total", s"${n}_total")
    }
    // single-group pivot names columns without the value prefix
    val amountCols = named.flatMap { case (_, n) =>
      Seq(s"${n}_subtotal", s"${n}_total") }
    val filled = amountCols.foldLeft(renamed)(
      (df, c) => df.withColumn(c, coalesce(col(c), lit(0.0))))

    // A8 metadata (first/max/min)
    val metaAggs: Seq[Column] =
      MetaFirstCols.filter(c => cols(c) && !key.contains(c))
        .map(c => first(col(c), ignoreNulls = true).as(c)) ++
      (if (cols("closing_time"))
         Seq(max($"closing_time").as("closing_time")) else Nil) ++
      (if (cols("captured_time"))
         Seq(min($"captured_time").as("captured_time")) else Nil)
    val withMeta =
      if (metaAggs.nonEmpty) {
        val meta = lines.groupBy(key.map(col): _*)
          .agg(metaAggs.head, metaAggs.tail: _*)
        filled.join(meta, key, "left")
      } else filled

    // A9 horizontal total
    val totalCols = named.map { case (_, n) => s"${n}_total" }
    val totalExpr = totalCols.map(c => coalesce(col(c), lit(0.0)))
      .reduceOption(_ + _).getOrElse(lit(0.0))
    withMeta.withColumn("total_ticket_cost", totalExpr)
  }
}
