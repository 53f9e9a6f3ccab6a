package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window / time-series operators (SURVEY §2.6 W1–W7) over the `events`
  * table.
  *
  * Float-parity rule: every DOUBLE the oracle compares is derived from
  * EXACT integers (money as cents via decimal sums) through an IEEE
  * expression tree written identically on both sides, so Spark and
  * DuckDB produce bit-identical doubles. Rolling mean/stddev are
  * therefore computed from exact windowed sums (s1, s2, n), not from
  * the engines' own AVG/STDDEV implementations (which differ in
  * summation order).
  */
object WindowOps {
  type Q = (SparkSession, String) => DataFrame

  /** Daily series: exact integer cents per (event_type, day).
    * Shared base of every query here (reference
    * forecasting/data/preparation.py:12-39 builds the same shape). */
  private def daily(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg((sum($"value".cast("decimal(28,2)")) * 100)
        .cast("long").as("cents"),
        count(lit(1)).as("n_events"))
  }
  private val dailySql = """
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS cents,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------- W1
  /** Rolling z-score anomaly detection (qa_payments.py:331-407): per
    * event_type ordered by day, 60-row trailing window, sample stddev
    * (ddof=1, matching pandas), σ=0 or n<2 → null z. */
  val q40RollingZscore: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(-59, 0)
    val s1 = sum($"cents").over(w).cast("double")
    // decimal square: cents² overflows Int64 at ~$30M/day; decimal(19)
    // × decimal(19) → decimal(38) stays exact (DuckDB side: HUGEINT)
    val s2 = sum($"cents".cast("decimal(19,0)") *
      $"cents".cast("decimal(19,0)")).over(w).cast("double")
    val n  = count(lit(1)).over(w).cast("double")
    daily(s, d)
      .withColumn("mu", s1 / n)
      .withColumn("variance",
        when(n > 1.0, (s2 - (s1 * s1) / n) / (n - lit(1.0))))
      .withColumn("z",
        when($"variance" > 0.0, ($"cents".cast("double") - $"mu") / sqrt($"variance")))
      .withColumn("is_anomaly",
        coalesce(abs($"z") >= 4.0, lit(false)))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("d"),
        $"cents", $"z", $"is_anomaly")
  }
  val o40 = s"""
    WITH daily AS ($dailySql),
    win AS (
      SELECT event_type, d, cents,
        CAST(SUM(cents) OVER w AS DOUBLE) AS s1,
        CAST(SUM(CAST(cents AS HUGEINT) * cents) OVER w AS DOUBLE) AS s2,
        CAST(COUNT(*) OVER w AS DOUBLE) AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)),
    zz AS (
      SELECT event_type, d, cents,
        CASE WHEN n > 1.0 AND (s2 - (s1 * s1) / n) / (n - 1.0) > 0.0
             THEN (CAST(cents AS DOUBLE) - s1 / n)
                  / sqrt((s2 - (s1 * s1) / n) / (n - 1.0)) END AS z
      FROM win)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS d, cents, z,
           COALESCE(abs(z) >= 4.0, FALSE) AS is_anomaly
    FROM zz"""

  // ---------------------------------------------------------------- W3
  /** Calendar gap fill / densification (preparation.py:12-39): per
    * event_type, every day between its min and max, absent days = 0. */
  val q41GapFill: Q = (s, d) => {
    import s.implicits._
    val base = daily(s, d)
    val cal = base.groupBy($"event_type")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"event_type",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("d"))
    cal.join(base, Seq("event_type", "d"), "left")
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("d"),
        coalesce($"cents", lit(0L)).as("cents"))
  }
  val o41 = s"""
    WITH daily AS ($dailySql),
    cal AS (
      SELECT event_type, unnest(generate_series(min(d), max(d),
             INTERVAL 1 DAY))::DATE AS d
      FROM daily GROUP BY event_type)
    SELECT cal.event_type, strftime(cal.d, '%Y-%m-%d') AS d,
           COALESCE(daily.cents, 0) AS cents
    FROM cal LEFT JOIN daily
      ON cal.event_type = daily.event_type AND cal.d = daily.d"""

  // ------------------------------------------------------------- W4/J7
  /** Missing-day detection (qa_payments.py:254-297): calendar anti-join —
    * days inside each event_type's range with no data.
    *
    * The synthetic feed is dense (every type has every day), which
    * made this detector's oracle row vacuously green (0 rows). The
    * query now simulates feed outages by dropping two fixed
    * calendar days-of-month from the observed series — mirrored in
    * the oracle SQL — so the anti-join emits rows and the hash
    * compare exercises the gap arithmetic, not an empty set. */
  val q42MissingDays: Q = (s, d) => {
    import s.implicits._
    val base = daily(s, d).filter(!dayofmonth($"d").isin(5, 17))
    val cal = base.groupBy($"event_type")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"event_type",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("d"))
    cal.join(base, Seq("event_type", "d"), "left_anti")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_missing"),
        date_format(min($"d"), "yyyy-MM-dd").as("first_missing"))
  }
  val o42 = s"""
    WITH daily AS ($dailySql),
    observed AS (
      SELECT * FROM daily WHERE day(d) NOT IN (5, 17)),
    cal AS (
      SELECT event_type, unnest(generate_series(min(d), max(d),
             INTERVAL 1 DAY))::DATE AS d
      FROM observed GROUP BY event_type)
    SELECT cal.event_type, COUNT(*) AS n_missing,
           strftime(MIN(cal.d), '%Y-%m-%d') AS first_missing
    FROM cal ANTI JOIN observed
      ON cal.event_type = observed.event_type AND cal.d = observed.d
    GROUP BY cal.event_type"""

  // ---------------------------------------------------------------- W7
  /** Naive seasonal forecast (forecasting/models/naive.py:19-56): value
    * for a day = the most recent same-weekday value 1..4 weeks back that
    * was non-zero, else 0 — lag-chain over the densified series. */
  val q43NaiveLag: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"d")
    def nz(k: Int): Column = {
      val l = lag($"cents", k).over(w)
      when(l =!= 0L, l)
    }
    q41GapFill(s, d)
      .withColumn("naive",
        coalesce(nz(7), nz(14), nz(21), nz(28), lit(0L)))
      .select($"event_type", $"d", $"cents", $"naive")
  }
  val o43 = s"""
    WITH daily AS ($dailySql),
    cal AS (
      SELECT event_type, unnest(generate_series(min(d), max(d),
             INTERVAL 1 DAY))::DATE AS d
      FROM daily GROUP BY event_type),
    dense AS (
      SELECT cal.event_type, cal.d, COALESCE(daily.cents, 0) AS cents
      FROM cal LEFT JOIN daily
        ON cal.event_type = daily.event_type AND cal.d = daily.d)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS d, cents,
      COALESCE(
        CASE WHEN lag(cents, 7)  OVER w <> 0 THEN lag(cents, 7)  OVER w END,
        CASE WHEN lag(cents, 14) OVER w <> 0 THEN lag(cents, 14) OVER w END,
        CASE WHEN lag(cents, 21) OVER w <> 0 THEN lag(cents, 21) OVER w END,
        CASE WHEN lag(cents, 28) OVER w <> 0 THEN lag(cents, 28) OVER w END,
        0) AS naive
    FROM dense
    WINDOW w AS (PARTITION BY event_type ORDER BY d)"""

  // ------------------------------------------------------------- W5/W6
  /** Deposit schedule (forecasting/deposit_schedule.py:31-155): weekday-
    * conditional batching, set-based. Cash: Fri/Sat/Sun→Monday,
    * Mon/Tue→Wednesday, Wed/Thu→Friday. Cards: Fri/Sat/Sun→Monday,
    * else next day. dayofweek here: 1=Sun..7=Sat (Spark) mapped via
    * explicit CASE so both engines agree. */
  val q44DepositSchedule: Q = (s, d) => {
    import s.implicits._
    val dow = dayofweek($"d") // 1=Sun 2=Mon ... 7=Sat
    val cashShift = when(dow === 6, 3).when(dow === 7, 2)   // Fri,Sat→Mon
      .when(dow === 1, 1)                                    // Sun→Mon
      .when(dow === 2, 2).when(dow === 3, 1)                 // Mon,Tue→Wed
      .when(dow === 4, 2).when(dow === 5, 1)                 // Wed,Thu→Fri
    val cardShift = when(dow === 6, 3).when(dow === 7, 2)
      .when(dow === 1, 1).otherwise(1)
    daily(s, d)
      .withColumn("cash_deposit_date", date_add($"d", cashShift))
      .withColumn("card_deposit_date", date_add($"d", cardShift))
      .groupBy($"cash_deposit_date".as("deposit_date"))
      .agg(sum($"cents").as("cash_cents"))
      .join(
        daily(s, d)
          .withColumn("card_deposit_date",
            date_add($"d", cardShift))
          .groupBy($"card_deposit_date".as("deposit_date"))
          .agg(sum($"n_events").as("card_events")),
        Seq("deposit_date"), "full_outer")
      .select(date_format($"deposit_date", "yyyy-MM-dd").as("deposit_date"),
        coalesce($"cash_cents", lit(0L)).as("cash_cents"),
        coalesce($"card_events", lit(0L)).as("card_events"))
  }
  val o44 = s"""
    WITH daily AS ($dailySql),
    shifted AS (
      SELECT *,
        CASE dayofweek(d)  -- duckdb: 0=Sun..6=Sat; match Spark semantics
          WHEN 5 THEN 3 WHEN 6 THEN 2 WHEN 0 THEN 1
          WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 2 WHEN 4 THEN 1
        END AS cash_shift,
        CASE dayofweek(d)
          WHEN 5 THEN 3 WHEN 6 THEN 2 ELSE 1
        END AS card_shift
      FROM daily),
    cash AS (
      SELECT d + cash_shift * INTERVAL 1 DAY AS deposit_date,
             SUM(cents) AS cash_cents
      FROM shifted GROUP BY 1),
    card AS (
      SELECT d + card_shift * INTERVAL 1 DAY AS deposit_date,
             SUM(n_events) AS card_events
      FROM shifted GROUP BY 1)
    SELECT strftime(COALESCE(cash.deposit_date, card.deposit_date),
             '%Y-%m-%d') AS deposit_date,
           CAST(COALESCE(cash_cents, 0) AS BIGINT) AS cash_cents,
           CAST(COALESCE(card_events, 0) AS BIGINT) AS card_events
    FROM cash FULL OUTER JOIN card
      ON cash.deposit_date = card.deposit_date"""

  // ---------------------------------------------------------------- J6
  /** Interval islands (etl/utils.py:125-159 merge_intervals analog at
    * scale): contiguous runs of present days per event_type via the
    * date − row_number() grouping trick. */
  val q45Islands: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"d")
    daily(s, d)
      .withColumn("grp", expr("date_sub(d, row_number() over " +
        "(partition by event_type order by d))"))
      .groupBy($"event_type", $"grp")
      .agg(date_format(min($"d"), "yyyy-MM-dd").as("island_start"),
        date_format(max($"d"), "yyyy-MM-dd").as("island_end"),
        count(lit(1)).as("n_days"))
      .drop("grp")
  }
  val o45 = s"""
    WITH daily AS ($dailySql),
    g AS (
      SELECT event_type, d,
        d - CAST(row_number() OVER
            (PARTITION BY event_type ORDER BY d) AS INTEGER) AS grp
      FROM daily)
    SELECT event_type, strftime(MIN(d), '%Y-%m-%d') AS island_start,
           strftime(MAX(d), '%Y-%m-%d') AS island_end,
           COUNT(*) AS n_days
    FROM g GROUP BY event_type, grp"""

  // ------------------------------------------------------------ CUSUM
  /** CUSUM drift detection per event_type: one-sided cumulative sums
    * s⁺ₜ = max(0, s⁺ₜ₋₁ + (xₜ − μ − k)) and the mirrored s⁻, with the
    * standard allowance k = σ/2 and decision threshold h = 4σ — the
    * change-point monitor that catches slow level drifts the q40
    * z-score (point outliers) and q146 MAD (robust point outliers)
    * both miss.
    *
    * CUSUM is a NON-LINEAR recurrence (the max-with-zero clamp), so
    * no window frame expresses it; but it only ever runs over the
    * per-type DAILY CENSUS (~n_days rows per type, bounded by the
    * calendar — not by corpus size), so each type's series collects
    * into one row and the recurrence folds IN-ROW over the sorted
    * array. μ/σ come from exact integer moments (the q40 cookbook);
    * the fold is the identical IEEE op sequence on both engines.
    *
    * 100 TB design: the census aggregate is map-side combined; the
    * fold input is calendar-bounded per type (a year = 365 elements)
    * regardless of event volume. */
  val q158CusumDrift: Q = (s, d) => {
    import s.implicits._
    val m = daily(s, d).groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"cents").cast("double").as("s1"),
        sum($"cents".cast("decimal(19,0)") *
          $"cents".cast("decimal(19,0)")).cast("double").as("s2"),
        expr("transform(sort_array(collect_list(named_struct(" +
          "'d', d, 'cents', cents))), e -> CAST(e.cents AS DOUBLE))")
          .as("xs"))
      .withColumn("mu", $"s1" / $"n")
      .withColumn("variance",
        ($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1.0))
      .withColumn("sigma",
        when($"n" > 1.0 && $"variance" > 0.0, sqrt($"variance")))
      .withColumn("k", $"sigma" * 0.5)
      .withColumn("h", $"sigma" * 4.0)
    // FIELD ORDER CONTRACT: fields that READ acc.up/acc.dn come
    // BEFORE the fields that produce the new up/dn. DuckDB v1.0's
    // list_reduce evaluates result-struct fields in place (a later
    // field sees the earlier fields of `acc` already overwritten), so
    // the oracle twin is only correct when every acc reference reads
    // a not-yet-overwritten field — this ordering is correct under
    // both in-place and functional evaluation, so both engines agree.
    val fold = """aggregate(xs,
      named_struct('mxu', CAST(0 AS DOUBLE), 'mxd', CAST(0 AS DOUBLE),
                   'au', CAST(0 AS BIGINT), 'ad', CAST(0 AS BIGINT),
                   'up', CAST(0 AS DOUBLE), 'dn', CAST(0 AS DOUBLE)),
      (acc, x) -> named_struct(
        'mxu', greatest(acc.mxu,
          greatest(CAST(0 AS DOUBLE), acc.up + (x - mu - k))),
        'mxd', greatest(acc.mxd,
          greatest(CAST(0 AS DOUBLE), acc.dn + (mu - x - k))),
        'au', acc.au + (CASE WHEN greatest(CAST(0 AS DOUBLE),
          acc.up + (x - mu - k)) > h THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END),
        'ad', acc.ad + (CASE WHEN greatest(CAST(0 AS DOUBLE),
          acc.dn + (mu - x - k)) > h THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END),
        'up', greatest(CAST(0 AS DOUBLE), acc.up + (x - mu - k)),
        'dn', greatest(CAST(0 AS DOUBLE), acc.dn + (mu - x - k))))"""
    m.withColumn("cs", when($"sigma".isNotNull, expr(fold)))
      .select($"event_type", $"n".cast("long").as("n_days"),
        $"mu", $"sigma",
        $"cs.mxu".as("max_cusum_up"), $"cs.mxd".as("max_cusum_down"),
        $"cs.au".as("n_alarms_up"), $"cs.ad".as("n_alarms_down"))
  }
  val o158: String = s"""
    WITH daily AS ($dailySql),
    m AS (
      SELECT event_type,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(cents) AS DOUBLE) AS s1,
        CAST(SUM(CAST(cents AS DECIMAL(19,0))
               * CAST(cents AS DECIMAL(19,0))) AS DOUBLE) AS s2,
        list(CAST(cents AS DOUBLE) ORDER BY d) AS xs
      FROM daily GROUP BY event_type),
    p AS (
      SELECT *, s1 / n AS mu,
        (s2 - s1 * s1 / n) / (n - 1.0) AS variance
      FROM m),
    q AS (
      SELECT *,
        CASE WHEN n > 1.0 AND variance > 0.0 THEN sqrt(variance) END
          AS sigma
      FROM p),
    r AS (
      SELECT *, sigma * 0.5 AS k, sigma * 4.0 AS h FROM q),
    f AS (
      SELECT *,
        -- field order contract: see the Spark twin — acc.up/acc.dn
        -- are read by mxu/mxd/au/ad BEFORE up/dn overwrite them
        -- (DuckDB list_reduce updates result-struct fields in place)
        CASE WHEN sigma IS NOT NULL THEN
          list_reduce(
            list_prepend(
              {'mxu': CAST(0 AS DOUBLE), 'mxd': CAST(0 AS DOUBLE),
               'au': CAST(0 AS BIGINT), 'ad': CAST(0 AS BIGINT),
               'up': CAST(0 AS DOUBLE), 'dn': CAST(0 AS DOUBLE)},
              list_transform(xs, x ->
                {'mxu': CAST(0 AS DOUBLE), 'mxd': CAST(0 AS DOUBLE),
                 'au': CAST(0 AS BIGINT), 'ad': CAST(0 AS BIGINT),
                 'up': x, 'dn': CAST(0 AS DOUBLE)})),
            (acc, e) -> {
              'mxu': greatest(acc.mxu,
                greatest(CAST(0 AS DOUBLE), acc.up + (e.up - mu - k))),
              'mxd': greatest(acc.mxd,
                greatest(CAST(0 AS DOUBLE), acc.dn + (mu - e.up - k))),
              'au': acc.au + (CASE WHEN greatest(CAST(0 AS DOUBLE),
                acc.up + (e.up - mu - k)) > h THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END),
              'ad': acc.ad + (CASE WHEN greatest(CAST(0 AS DOUBLE),
                acc.dn + (mu - e.up - k)) > h THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END),
              'up': greatest(CAST(0 AS DOUBLE), acc.up + (e.up - mu - k)),
              'dn': greatest(CAST(0 AS DOUBLE), acc.dn + (mu - e.up - k))})
        END AS cs
      FROM r)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, mu, sigma,
      cs.mxu AS max_cusum_up, cs.mxd AS max_cusum_down,
      cs.au AS n_alarms_up, cs.ad AS n_alarms_down
    FROM f"""

  // -------------------------------------------------------- OLS trend
  /** Per-type OLS revenue trend: slope, intercept, and R² of
    * cents ~ day fitted per event_type — the in-engine "is this
    * series growing and how fast" answer a monitoring mart serves
    * without a modeling sidecar (the closed-form twin of q154's
    * Pearson audit; q43/W7 forecast consumes level, this reports
    * direction).
    *
    * Float parity: x = integer day offset from the shared 1970
    * epoch, y = exact cents; the five moments accumulate as exact
    * decimal(38,0) sums, each casts to double once, and
    * slope/intercept/R² are then ONE identical IEEE expression per
    * column on both engines (q154 cookbook). Zero-variance series
    * yield nulls, not NaN. */
  val q159TrendOls: Q = (s, d) => {
    import s.implicits._
    val base = daily(s, d)
      .select($"event_type",
        datediff($"d", to_date(lit("1970-01-01"))).cast("long").as("x"),
        $"cents".as("y"))
    val m = base.groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"x".cast("decimal(38,0)")).cast("double").as("sx"),
        sum($"y".cast("decimal(38,0)")).cast("double").as("sy"),
        sum(($"x" * $"y").cast("decimal(38,0)")).cast("double").as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).cast("double").as("sxx"),
        sum(($"y".cast("decimal(19,0)") * $"y".cast("decimal(19,0)")))
          .cast("double").as("syy"))
    m.withColumn("vx", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("vy", $"n" * $"syy" - $"sy" * $"sy")
      .withColumn("cov", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("slope", when($"vx" > 0.0, $"cov" / $"vx"))
      .withColumn("intercept",
        when($"vx" > 0.0, ($"sy" - $"cov" / $"vx" * $"sx") / $"n"))
      .withColumn("r2",
        when($"vx" > 0.0 && $"vy" > 0.0,
          ($"cov" * $"cov") / ($"vx" * $"vy")))
      .select($"event_type", $"n".cast("long").as("n_days"),
        $"slope", $"intercept", $"r2")
  }
  val o159: String = s"""
    WITH daily AS ($dailySql),
    base AS (
      SELECT event_type,
        CAST(d - DATE '1970-01-01' AS BIGINT) AS x,
        cents AS y
      FROM daily),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
          AS DOUBLE) AS syy
      FROM base GROUP BY event_type),
    v AS (
      SELECT *, n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        n * sxy - sx * sy AS cov
      FROM m)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
      CASE WHEN vx > 0.0 THEN cov / vx END AS slope,
      CASE WHEN vx > 0.0 THEN (sy - cov / vx * sx) / n END AS intercept,
      CASE WHEN vx > 0.0 AND vy > 0.0
        THEN (cov * cov) / (vx * vy) END AS r2
    FROM v"""

  // --------------------------------------------- weekday seasonality
  /** Day-of-week seasonality profile per event_type: mean cents per
    * weekday ÷ the type's overall daily mean — the multiplicative
    * seasonal index the naive forecaster (W7/q43) implicitly assumes
    * and a capacity planner reads directly. Spark `dayofweek` is
    * 1=Sun..7=Sat; DuckDB's is 0=Sun..6=Sat (+1 aligns — the q44
    * mapping).
    *
    * 100 TB design: two nested map-side-combined censuses
    * (type×dow → type); the 7-rows-per-type census joins its
    * broadcast type totals; indices are IEEE divisions of exact
    * integer sums, written identically on both engines. */
  val q162DowSeasonality: Q = (s, d) => {
    import s.implicits._
    val byDow = daily(s, d)
      .groupBy($"event_type", dayofweek($"d").cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum($"cents").cast("long").as("cents"))
    val totals = byDow.groupBy($"event_type")
      .agg(sum($"n_days").cast("long").as("tot_days"),
        sum($"cents").cast("long").as("tot_cents"))
    byDow.join(broadcast(totals), Seq("event_type"))
      .select($"event_type", $"dow", $"n_days",
        ($"cents".cast("double") / $"n_days".cast("double"))
          .as("mean_cents"),
        (($"cents".cast("double") / $"n_days".cast("double"))
          / ($"tot_cents".cast("double") / $"tot_days".cast("double")))
          .as("seasonal_idx"))
  }
  val o162 = s"""
    WITH daily AS ($dailySql),
    by_dow AS (
      SELECT event_type, CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        COUNT(*) AS n_days, CAST(SUM(cents) AS BIGINT) AS cents
      FROM daily GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(n_days) AS BIGINT) AS tot_days,
        CAST(SUM(cents) AS BIGINT) AS tot_cents
      FROM by_dow GROUP BY 1)
    SELECT b.event_type, b.dow, b.n_days,
      CAST(b.cents AS DOUBLE) / CAST(b.n_days AS DOUBLE) AS mean_cents,
      (CAST(b.cents AS DOUBLE) / CAST(b.n_days AS DOUBLE))
        / (CAST(t.tot_cents AS DOUBLE) / CAST(t.tot_days AS DOUBLE))
        AS seasonal_idx
    FROM by_dow b JOIN tot t USING (event_type)"""

  // --------------------------------------------------- changepoint
  /** Offline changepoint detection — one binary-segmentation step per
    * event_type: the split day t maximizing the between-segment sum
    * of squares BSS(t) = (S₁·n − S·t)² / (n·t·(n−t)) over the daily
    * census (S₁ = prefix cents sum, S = total). The OFFLINE twin of
    * the q158 CUSUM monitor: CUSUM watches a stream against a fitted
    * baseline; this locates where a stored series' level shifted.
    *
    * Exactness: prefix/total sums are exact int64;
    * A(t) = S₁·n − S·t routes through decimal(38,0) — a corpus with
    * S ~ 10¹⁶ cents × 10³ days would overflow an int64 product (and
    * Spark 4 ANSI would throw where DuckDB's HUGEINT sails on), while
    * decimal(38) holds any realistic magnitude and DuckDB's HUGEINT
    * carries the identical integer; both engines' double casts of
    * that integer round identically. BSS is then one identical IEEE
    * expression on both engines. Argmax ties break on the earliest
    * day. All windows ride the per-type DAILY census — keyed,
    * bounded, never event-grain. */
  val q211Changepoint: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"event_type")
    val pre = daily(s, d)
      .withColumn("t", row_number().over(
        Window.partitionBy($"event_type").orderBy($"d")))
      .withColumn("s1", sum($"cents").over(w))
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("stot", sum($"cents").over(tot))
    val cand = pre.filter($"t" < $"n")
      .withColumn("a", $"s1".cast("decimal(38,0)") * $"n" -
        $"stot".cast("decimal(38,0)") * $"t")
      .withColumn("bss",
        ($"a".cast("double") * $"a".cast("double")) /
          ($"n".cast("double") * $"t".cast("double") *
            ($"n" - $"t").cast("double")))
    val wr = Window.partitionBy($"event_type")
      .orderBy($"bss".desc, $"d".asc)
    cand.withColumn("rn", row_number().over(wr)).filter($"rn" === 1)
      .select($"event_type",
        date_format($"d", "yyyy-MM-dd").as("split_day"),
        ($"s1".cast("double") / $"t".cast("double"))
          .as("mean_left_cents"),
        (($"stot" - $"s1").cast("double") /
          ($"n" - $"t").cast("double")).as("mean_right_cents"),
        $"bss")
  }
  val o211: String = s"""
    WITH daily AS ($dailySql),
    pre AS (
      SELECT event_type, d, cents,
        row_number() OVER wo AS t,
        SUM(cents) OVER w AS s1,
        COUNT(*) OVER tot AS n,
        SUM(cents) OVER tot AS stot
      FROM daily
      WINDOW wo AS (PARTITION BY event_type ORDER BY d),
             w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             tot AS (PARTITION BY event_type)),
    cand AS (
      SELECT *, s1 * n - stot * t AS a  -- HUGEINT: SUM(BIGINT) widens
      FROM pre WHERE t < n),
    scored AS (
      SELECT *, (CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)
             * CAST(n - t AS DOUBLE)) AS bss
      FROM cand),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY bss DESC, d ASC) AS rn
      FROM scored)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS split_day,
      CAST(s1 AS DOUBLE) / CAST(t AS DOUBLE) AS mean_left_cents,
      CAST(stot - s1 AS DOUBLE) / CAST(n - t AS DOUBLE)
        AS mean_right_cents,
      bss
    FROM best WHERE rn = 1"""

  val queries: Map[String, Q] = Map(
    "q211_changepoint" -> q211Changepoint,
    "q162_dow_seasonality" -> q162DowSeasonality,
    "q40_rolling_zscore" -> q40RollingZscore,
    "q41_gap_fill" -> q41GapFill,
    "q42_missing_days" -> q42MissingDays,
    "q43_naive_lag" -> q43NaiveLag,
    "q44_deposit_schedule" -> q44DepositSchedule,
    "q45_islands" -> q45Islands,
    "q158_cusum_drift" -> q158CusumDrift,
    "q159_trend_ols" -> q159TrendOls)

  val oracles: Map[String, String] = Map(
    "q211_changepoint" -> o211,
    "q162_dow_seasonality" -> o162,
    "q40_rolling_zscore" -> o40,
    "q41_gap_fill" -> o41,
    "q42_missing_days" -> o42,
    "q43_naive_lag" -> o43,
    "q44_deposit_schedule" -> o44,
    "q45_islands" -> o45,
    "q158_cusum_drift" -> o158,
    "q159_trend_ols" -> o159)
}
