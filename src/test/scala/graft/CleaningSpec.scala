package graft

import graft.functions.Cleaning
import org.scalatest.funsuite.AnyFunSuite

/** Truth-table tests for the parity kernel (SURVEY §7.4 risk #1):
  * pure-function level, no SparkSession needed. */
class CleaningSpec extends AnyFunSuite {

  private def pm(s: String): Option[Double] = Cleaning.parseMoneyFn(s)

  test("parseMoney: reference docstring examples (cleaning_utils.py:128-143)") {
    assert(pm("1,234.56").contains(1234.56))
    assert(pm("1.234,56").contains(1234.56))
    assert(pm("(1,234.56)").contains(-1234.56))
    assert(pm("$ 1 234,56").contains(1234.56))
  }

  test("parseMoney: separator disambiguation (cleaning_utils.py:159-197)") {
    assert(pm("1.234").contains(1.234))      // single dot = decimal
    assert(pm("1,234").contains(1234.0))     // comma grouping
    assert(pm("1.234.567").contains(1234567.0)) // multi-dot grouping
    assert(pm("1,234,567").contains(1234567.0))
    assert(pm("12,34").contains(12.34))      // comma decimal fallback
  }

  test("parseMoney: unclear multi-dot falls through to None") {
    assert(pm("1.23.45").isEmpty)
  }

  test("parseMoney: negatives, currency, blanks, junk") {
    assert(pm("-42").contains(-42.0))
    assert(pm("(12,3)").contains(-12.3))
    assert(pm("$1234.5").contains(1234.5))
    assert(pm("").isEmpty)
    assert(pm("   ").isEmpty)
    assert(pm("abc").isEmpty)
    assert(pm(null).isEmpty)
    assert(pm("MX$ 99").contains(99.0))
  }

  test("parseMoney: round-trips plain decimal renderings") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val v = BigDecimal(rnd.nextInt(2000000000))./(100).setScale(2)
      assert(pm(v.toString).contains(v.toDouble), s"failed on $v")
      assert(pm(s"($v)").contains(-v.toDouble), s"failed on ($v)")
      assert(pm(v.toString.replace('.', ',')).contains(v.toDouble))
    }
  }

  test("stripAccents removes combining marks") {
    assert(Cleaning.stripAccentsFn("Café Überraschung añejo") ==
      "Cafe Uberraschung anejo")
    assert(Cleaning.stripAccentsFn(null) == null)
  }
}
