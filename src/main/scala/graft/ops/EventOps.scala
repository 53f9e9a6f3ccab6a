package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-log operators: semi-structured JSON extraction and batch
  * sessionization — the batch twins of the streaming module.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------- JSON
  /** JSON property extraction from the `props` payload column —
    * `get_json_object` stays inside codegen; no UDF, no full parse. */
  val q77JsonExtract: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("k",
        get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"k").as("sum_k"),
        sum(when($"k" > 50, 1L).otherwise(0L)).as("n_high"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("n_null"))
  }
  val o77 = """
    SELECT event_type, COUNT(*) AS n_events,
      CAST(SUM(k) AS BIGINT) AS sum_k,
      CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM (SELECT event_type,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type"""

  // ---------------------------------------------------- sessionization
  /** Batch sessionization (the streaming module's gap logic as a
    * window query): per user, a new session starts where the gap from
    * the previous event exceeds 30 minutes; session id = running count
    * of starts; one row per session. */
  val q78SessionizeBatch: Q = (s, d) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
    val sess = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(sess))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        (sum($"value".cast("decimal(28,2)")) * 100).cast("long")
          .as("value_cents"))
  }
  val o78 = """
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS session_id
      FROM marked)
    SELECT user_id, session_id, COUNT(*) AS n_events,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS value_cents
    FROM numbered GROUP BY user_id, session_id"""

  val queries: Map[String, Q] = Map(
    "q77_json_extract" -> q77JsonExtract,
    "q78_sessionize_batch" -> q78SessionizeBatch)

  val oracles: Map[String, String] = Map(
    "q77_json_extract" -> o77,
    "q78_sessionize_batch" -> o78)
}
