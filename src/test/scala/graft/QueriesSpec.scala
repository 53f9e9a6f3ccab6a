package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke + targeted assertions for every SparkEntry query at
  * sf0.001 (the driver's t1 tier). One shared session per suite. */
class QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every query with an oracle is declared") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle without query: $undeclared")
  }

  test("q01 pricing summary has the 6 flag/status groups") {
    val rows = SparkEntry.queries("q01_agg_pricing")(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("q17 grain check: dup rows at least double dup keys") {
    // the synthetic lineitem deliberately contains duplicate
    // (orderkey, linenumber) keys — the audit must surface them
    val r = SparkEntry.queries("q17_grain_check")(spark, sf).collect()(0)
    val keys = r.getAs[Long]("n_dup_keys")
    val rows = r.getAs[Long]("n_dup_rows")
    assert(keys > 0 && rows >= 2 * keys)
  }

  test("q07 pivot columns are the fixed domain") {
    val df = SparkEntry.queries("q07_pivot_fixed")(spark, sf)
    assert(df.columns.toSeq == Seq("l_linestatus", "A", "N", "R"))
  }

  test("q21 parse-money truth table matches expectations in-engine") {
    val got = SparkEntry.queries("q21_parse_money_table")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1).contains(1234.56))
    assert(got(2).contains(1234.56))
    assert(got(3).contains(-1234.56))
    assert(got(12).isEmpty)
  }
}
