package graft.pos

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality engine over `mart_payments_daily`
  * (`/root/reference/src/pos_core/qa/qa_payments.py`), level-gated like
  * `qa/api.py:105-134`:
  *   0 schema, 1 nulls, 2 non-negativity + consistency,
  *   3 missing/duplicate days + zero-method flags, 4 z-score anomalies.
  *
  * Every check is a lazy DataFrame; [[PaymentsQaResult.summary]]
  * forces only the counts. The z-score window is the same
  * exact-integer construction as the oracle queries: rolling 60-row
  * mean/sample-stddev per sucursal (qa_payments.py:331-407).
  */
final case class PaymentsQaResult(
    summary: Map[String, Long],
    missingDays: Option[DataFrame],
    duplicateDays: Option[DataFrame],
    zeroMethodFlags: Option[DataFrame],
    zscoreAnomalies: Option[DataFrame]) {
  def hasErrors: Boolean =
    summary.getOrElse("null_key_rows", 0L) > 0 ||
      summary.getOrElse("negative_rows", 0L) > 0
}

object Qa {
  private val MoneyCols = PaymentsDaily.BucketCols :+ "propinas"
  private val Required = Seq("sucursal", "fecha") ++ MoneyCols ++
    Seq("num_tickets")

  def runPaymentsQa(df: DataFrame, level: Int = 4,
                    zWindow: Int = 60,
                    zThreshold: Double = 4.0): PaymentsQaResult = {
    val spark = df.sparkSession
    import spark.implicits._

    // Q1 level 0: schema
    val missing = Required.filterNot(df.columns.toSet)
    if (missing.nonEmpty)
      throw new DataQualityError(
        s"missing required columns: ${missing.mkString(", ")}")

    var summary = Map.empty[String, Long]

    // Levels 1–3 row-level counts in ONE aggregation job: each check
    // stays a lazy DataFrame for callers, but the summary numbers come
    // from a single scan of the mart (sum-of-flags with map-side
    // partial aggregation) instead of one count() job per check —
    // at scale the mart is read once, not six times.
    val negPred = MoneyCols.map(c => col(c) < -1e-6).reduce(_ || _)
    val revenue = MoneyCols.map(c => coalesce(col(c), lit(0.0)))
      .reduce(_ + _)
    val zeroPred = $"num_tickets" > 0 &&
      $"ingreso_credito" === 0.0 && $"ingreso_debito" === 0.0
    def flag(p: org.apache.spark.sql.Column) =
      sum(when(p, 1L).otherwise(0L))
    if (level >= 1) {
      val aggs =
        Seq(flag($"sucursal".isNull || $"fecha".isNull).as("nk")) ++
          (if (level >= 2) Seq(flag(negPred).as("neg"),
            flag($"num_tickets" > 0 && revenue <= 1e-6).as("tnr"),
            flag(revenue > 1e-6 && $"num_tickets" <= 0).as("rnt"))
           else Nil) ++
          (if (level >= 3) Seq(flag(zeroPred).as("zero")) else Nil)
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      def get(n: String): Long =
        if (r.isNullAt(r.fieldIndex(n))) 0L else r.getAs[Long](n)
      summary += "null_key_rows" -> get("nk")
      if (level >= 2) {
        summary += "negative_rows" -> get("neg")
        summary += "tickets_no_revenue" -> get("tnr")
        summary += "revenue_no_tickets" -> get("rnt")
      }
      if (level >= 3) summary += "zero_method_days" -> get("zero")
    }

    // W4/W2/Q5 level 3
    val (missingDays, dupDays, zeroFlags) = if (level >= 3) {
      val cal = df.groupBy($"sucursal")
        .agg(min($"fecha").as("d0"), max($"fecha").as("d1"))
        .select($"sucursal",
          explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("fecha"))
      val md = cal.join(df.select($"sucursal", $"fecha"),
        Seq("sucursal", "fecha"), "left_anti")
      // ONE grouped pass yields both the duplicate-day count and the
      // missing-day count (per-branch span minus days present equals
      // the calendar anti-join count) — md/dd stay lazy for callers
      val dd = df.groupBy($"sucursal", $"fecha")
        .agg(count(lit(1)).as("n")).filter($"n" > 1)
      val zf = df.filter(zeroPred)
        .select($"sucursal", $"fecha", $"num_tickets")
      val grouped = df.groupBy($"sucursal", $"fecha")
        .agg(count(lit(1)).as("n"))
        .groupBy($"sucursal")
        .agg((datediff(max($"fecha"), min($"fecha")) + 1 -
          count(lit(1))).cast("long").as("gap_days"),
          sum(when($"n" > 1, 1L).otherwise(0L)).as("dup_days"))
        .agg(coalesce(sum($"gap_days"), lit(0L)).as("md"),
          coalesce(sum($"dup_days"), lit(0L)).as("dd"))
        .collect()(0)
      summary += "missing_days" -> grouped.getAs[Long]("md")
      summary += "duplicate_days" -> grouped.getAs[Long]("dd")
      (Some(md), Some(dd), Some(zf))
    } else (None, None, None)

    // W1 level 4: rolling z-score per sucursal × money column
    val zs = if (level >= 4) {
      val w = Window.partitionBy($"sucursal").orderBy($"fecha")
        .rowsBetween(-(zWindow - 1), 0)
      val perCol = MoneyCols.map { c =>
        val v = coalesce(col(c), lit(0.0))
        val mu = avg(v).over(w)
        val sd = stddev_samp(v).over(w) // ddof=1, matches pandas
        df.select($"sucursal", $"fecha", lit(c).as("metric"),
            v.as("value"), mu.as("mu"), sd.as("sd"))
          .withColumn("z", when($"sd" > 0, ($"value" - $"mu") / $"sd"))
          .filter(abs($"z") >= zThreshold)
      }
      val all = perCol.reduce(_ unionByName _)
      summary += "zscore_anomalies" -> all.count()
      Some(all)
    } else None

    PaymentsQaResult(summary, missingDays, dupDays, zeroFlags, zs)
  }

  /** A13 monthly roll-ups (qa_payments.py:704-815): per (sucursal,
    * year-month) totals, then two month × sucursal pivots — sales and
    * elimination-pct. Returns (monthly, salesPivot, elimPctPivot). */
  def monthlyPivots(df: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val revenue = MoneyCols.filter(df.columns.contains)
      .map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
    val elimCol =
      if (df.columns.contains("tickets_with_eliminations"))
        coalesce($"tickets_with_eliminations", lit(0L))
      else lit(0L)
    val monthly = df
      .withColumn("year_month", date_format($"fecha", "yyyy-MM"))
      .groupBy($"sucursal", $"year_month")
      .agg(sum(revenue).as("total_sin_propinas"),
        sum($"num_tickets").as("num_tickets"),
        sum(elimCol).as("tickets_with_eliminations"))
      .withColumn("pct_eliminations",
        when($"num_tickets" === 0, 0.0)
          .otherwise(bround($"tickets_with_eliminations" * 100.0 /
            $"num_tickets", 2)))
    val sales = monthly.groupBy($"year_month")
      .pivot("sucursal").sum("total_sin_propinas").na.fill(0.0)
    val elim = monthly.groupBy($"year_month")
      .pivot("sucursal").sum("pct_eliminations").na.fill(0.0)
    (monthly, sales, elim)
  }

  /** U6 seeded spot-check sample (qa_payments.py:823-965): choose n
    * distinct (sucursal, year-month) pairs with rand(seed), then join
    * back all detail rows for the chosen pairs. Deterministic within
    * Spark for a fixed seed. */
  def sampleMonthPairs(df: DataFrame, n: Int, seed: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withYm = df.withColumn("year_month",
      date_format($"fecha", "yyyy-MM"))
    val pairs = withYm.select($"sucursal", $"year_month").distinct()
      .orderBy($"sucursal", $"year_month") // stable pre-shuffle order
      .withColumn("r", rand(seed))
      .orderBy($"r").limit(n)
      .drop("r")
    withYm.join(broadcast(pairs), Seq("sucursal", "year_month"))
  }
}
