package graft.ops

import graft.Tables
import graft.functions.Cleaning._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mart-assembly operators (SURVEY §2.5 A7–A9, §2.2 F13): the
  * data-dependent pivot machinery behind `mart_sales_by_ticket`
  * (sales_by_ticket.py:284-437) re-expressed over testdata.
  */
object MartOps {
  type Q = (SparkSession, String) => DataFrame

  /** F13: group → column-safe UPPER_SNAKE pivot names with collision
    * suffixes — shared with the ticket mart
    * (sales_by_ticket.py:97-111). Driver-side — names schema. */
  def sanitizeGroupNames(gs: Seq[String]): Seq[(String, String)] =
    graft.pos.SalesByTicket.sanitize(gs)

  // ---------------------------------------------------------------- A7
  /** Dynamic two-measure pivot (sales_by_ticket.py:284-353): the column
    * set depends on the data — one distinct pass discovers it (a tiny
    * driver-side collect of the GROUP domain only), then a single
    * pivot produces `{GROUP}_sum` / `{GROUP}_cnt`. */
  val q70DynamicPivot: Q = (s, d) => {
    import s.implicits._
    val prios = Tables.orders(s, d)
      .select($"o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val pv = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .pivot("o_orderpriority", prios)
      .agg(moneySum($"o_totalprice").as("sum"),
        count(lit(1)).as("cnt"))
    // pivot names columns "<value>_<alias>"; re-key to sanitized names
    val named = sanitizeGroupNames(prios)
    val renamed = named.foldLeft(pv) { case (df, (p, n)) =>
      df.withColumnRenamed(s"${p}_sum", s"${n}_SUM")
        .withColumnRenamed(s"${p}_cnt", s"${n}_CNT")
    }
    val sel = $"o_custkey" +: named.flatMap { case (_, n) =>
      Seq(coalesce(col(s"${n}_SUM"), lit(0.0)).as(s"${n}_SUM"),
        coalesce(col(s"${n}_CNT"), lit(0L)).as(s"${n}_CNT"))
    }
    renamed.select(sel: _*)
  }
  val o70: String = {
    // same fixed domain the reference pivots over (TPC-H priorities)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val cols = prios.flatMap { p =>
      val n = p.trim.replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("^_+|_+$", "").toUpperCase
      Seq(
        s"""COALESCE(CAST(SUM(CASE WHEN o_orderpriority = '$p'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0)
             AS "${n}_SUM"""",
        s"""CAST(COUNT(CASE WHEN o_orderpriority = '$p' THEN 1 END)
             AS BIGINT) AS "${n}_CNT"""")
    }.mkString(",\n      ")
    s"""
    SELECT o_custkey,
      $cols
    FROM orders GROUP BY o_custkey"""
  }

  // ---------------------------------------------------------------- A8
  /** first/max/min metadata aggregation (sales_by_ticket.py:362-389):
    * per-ticket metadata — "first" made deterministic as min_by over
    * the line number (pandas `first` is positional; at scale an
    * explicit order key is the only correct spelling). */
  val q71TicketMeta: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(
        // (l_orderkey, l_linenumber) is NOT unique in this testdata —
        // tie-break through the value itself for a total order
        expr("min(struct(l_linenumber, l_returnflag)).l_returnflag")
          .as("first_flag"),
        expr("max(struct(l_linenumber, l_linestatus)).l_linestatus")
          .as("last_status"),
        max($"l_shipdate".cast("date")).as("max_ship"),
        min($"l_shipdate".cast("date")).as("min_ship"),
        count(lit(1)).as("n_lines"))
      .select($"l_orderkey", $"first_flag", $"last_status",
        date_format($"max_ship", "yyyy-MM-dd").as("max_ship"),
        date_format($"min_ship", "yyyy-MM-dd").as("min_ship"),
        $"n_lines")
  }
  // Spark's min(struct(n, v)).v is the lexicographic pair-min: the
  // minimal v AMONG rows holding the minimal n (and dually for max).
  // DuckDB can spell that directly as min({'n':…,'v':…}) over structs,
  // but its struct min/max aggregate is catastrophically slow at scale
  // (151 s on sf0.1's 600k-row lineitem vs 0.9 s for this spelling —
  // 63% of the whole oracle suite); the equivalent two-pass form
  // (min/max line number per key, then MIN(v)/MAX(v) restricted to
  // that line) is hash-join work DuckDB executes at full speed.
  val o71 = """
    WITH base AS MATERIALIZED (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
             CAST(l_shipdate AS DATE) AS sd
      FROM lineitem),
    mm AS MATERIALIZED (
      SELECT l_orderkey, MIN(l_linenumber) AS mn, MAX(l_linenumber) AS mx,
             MAX(sd) AS mxsd, MIN(sd) AS mnsd, COUNT(*) AS n_lines
      FROM base GROUP BY l_orderkey),
    ff AS MATERIALIZED (
      SELECT b.l_orderkey, MIN(b.l_returnflag) AS first_flag
      FROM base b JOIN mm ON mm.l_orderkey = b.l_orderkey
        AND b.l_linenumber = mm.mn
      GROUP BY b.l_orderkey),
    ls AS MATERIALIZED (
      SELECT b.l_orderkey, MAX(b.l_linestatus) AS last_status
      FROM base b JOIN mm ON mm.l_orderkey = b.l_orderkey
        AND b.l_linenumber = mm.mx
      GROUP BY b.l_orderkey)
    SELECT mm.l_orderkey, ff.first_flag, ls.last_status,
      strftime(mm.mxsd, '%Y-%m-%d') AS max_ship,
      strftime(mm.mnsd, '%Y-%m-%d') AS min_ship, mm.n_lines
    FROM mm JOIN ff USING (l_orderkey) JOIN ls USING (l_orderkey)"""

  // ---------------------------------------------------------------- A9
  /** Horizontal row-sum across pivot columns (total_ticket_cost,
    * sales_by_ticket.py:429-437): null-safe Σ of the wide columns. */
  val q72RowSum: Q = (s, d) => {
    import s.implicits._
    val pv = Tables.lineitem(s, d)
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(moneySum($"l_extendedprice"))
    val total = Seq("A", "N", "R")
      .map(c => coalesce(col(c), lit(0.0)))
      .reduce(_ + _)
    pv.select($"l_linestatus",
        coalesce($"A", lit(0.0)).as("A"),
        coalesce($"N", lit(0.0)).as("N"),
        coalesce($"R", lit(0.0)).as("R"))
      .withColumn("TOTAL", total)
  }
  val o72 = """
    SELECT l_linestatus, A, N, R, A + N + R AS TOTAL FROM (
      SELECT l_linestatus,
        COALESCE(CAST(SUM(CASE WHEN l_returnflag='A'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS A,
        COALESCE(CAST(SUM(CASE WHEN l_returnflag='N'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS N,
        COALESCE(CAST(SUM(CASE WHEN l_returnflag='R'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS R
      FROM lineitem GROUP BY l_linestatus)"""

  // ------------------------------------------------------------ A10+A11
  /** The full sales_by_group chain shape (sales_by_group.py:305-414):
    * wide pivot → unpivot → consolidation map with default → re-pivot
    * categories × branches. Composed here as one query: priorities
    * unpivoted, mapped to coarse tiers, re-aggregated per tier ×
    * orderstatus. */
  val q73UnpivotRemap: Q = (s, d) => {
    import s.implicits._
    val tierMap = Map("1-URGENT" -> "RUSH", "2-HIGH" -> "RUSH",
      "3-MEDIUM" -> "NORMAL")
    val tier = tierMap.foldLeft(lit("OTHER")) { case (acc, (k, v)) =>
      when($"o_orderpriority" === k, lit(v)).otherwise(acc)
    }
    Tables.orders(s, d)
      .withColumn("tier", tier)
      .groupBy($"tier")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneySum($"o_totalprice"))
      .na.fill(0.0, Seq("F", "O", "P"))
  }
  val o73 = """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'RUSH'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'NORMAL'
                ELSE 'OTHER' END AS tier,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='F'
        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS F,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='O'
        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS O,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='P'
        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS P
    FROM orders GROUP BY 1"""

  val queries: Map[String, Q] = Map(
    "q70_dynamic_pivot" -> q70DynamicPivot,
    "q71_ticket_meta" -> q71TicketMeta,
    "q72_row_sum" -> q72RowSum,
    "q73_unpivot_remap" -> q73UnpivotRemap)

  val oracles: Map[String, String] = Map(
    "q70_dynamic_pivot" -> o70,
    "q71_ticket_meta" -> o71,
    "q72_row_sum" -> o72,
    "q73_unpivot_remap" -> o73)
}
