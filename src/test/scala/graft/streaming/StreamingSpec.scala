package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transforms driven through MemoryStream → memory sink. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed totals aggregate by event-time window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreaming.Event]
    input.addData(
      EventStreaming.Event(1, ts("2024-01-01 10:05:00"), 1, "click", 10.0),
      EventStreaming.Event(2, ts("2024-01-01 10:45:00"), 2, "click", 5.0),
      EventStreaming.Event(3, ts("2024-01-01 11:05:00"), 1, "view", 2.0))
    val q = EventStreaming.windowedTotals(input.toDF())
      .writeStream.format("memory").queryName("wt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only closed windows; push the watermark past
      input.addData(EventStreaming.Event(4,
        ts("2024-01-01 23:00:00"), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wt").collect()
      val clicks10 = rows.find(r =>
        r.getAs[String]("event_type") == "click" &&
          r.getAs[java.sql.Timestamp]("window_start")
            .toString.startsWith("2024-01-01 10:00"))
      assert(clicks10.isDefined)
      assert(clicks10.get.getAs[Double]("total_value") == 15.0)
      assert(clicks10.get.getAs[Long]("n_events") == 2)
    } finally q.stop()
  }

  test("sessionize: emitOpen flushes trailing sessions for batch use") {
    val s = spark
    import s.implicits._
    val events = Seq(
      EventStreaming.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStreaming.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      EventStreaming.Event(3, ts("2024-01-01 12:00:00"), 1, "view", 3.0),
      EventStreaming.Event(4, ts("2024-01-01 09:00:00"), 2, "view", 5.0)
    ).toDS()
    val sess = EventStreaming.sessionize(events, emitOpen = true)
      .collect().sortBy(r => (r.user_id, r.session_start.getTime))
    // user 1: burst + trailing singleton; user 2: single trailing
    assert(sess.length == 3)
    assert(sess(0).n_events == 2 && sess(0).total_value == 3.0)
    assert(sess(1).n_events == 1 && sess(1).total_value == 3.0)
    assert(sess(2).user_id == 2 && sess(2).n_events == 1)
  }

  test("sessionize: inactivity gap splits sessions within a batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreaming.Event]
    // user 1: two bursts separated by > 30 min → first session closes
    input.addData(
      EventStreaming.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStreaming.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      EventStreaming.Event(3, ts("2024-01-01 12:00:00"), 1, "view", 3.0))
    val q = EventStreaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
      assert(rows.length == 1) // first burst closed; second still open
      val r = rows(0)
      assert(r.getAs[Long]("n_events") == 2)
      assert(r.getAs[Double]("total_value") == 3.0)
      assert(r.getAs[java.sql.Timestamp]("session_end").toString
        .startsWith("2024-01-01 10:10"))
    } finally q.stop()
  }
}
