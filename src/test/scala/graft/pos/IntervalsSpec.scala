package graft.pos

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Interval algebra semantics (utils.py:94-242 parity). */
class IntervalsSpec extends AnyFunSuite {
  private def d(s: String) = LocalDate.parse(s)

  test("merge joins overlapping and adjacent intervals") {
    assert(Intervals.merge(Seq(
      (d("2025-01-01"), d("2025-01-10")),
      (d("2025-01-11"), d("2025-01-20")),   // adjacent → merged
      (d("2025-02-01"), d("2025-02-05")),
      (d("2025-02-03"), d("2025-02-10")))) == Seq(
      (d("2025-01-01"), d("2025-01-20")),
      (d("2025-02-01"), d("2025-02-10"))))
  }

  test("subtract returns uncovered gaps") {
    assert(Intervals.subtract(
      (d("2025-01-01"), d("2025-01-31")),
      Seq((d("2025-01-05"), d("2025-01-10")),
        (d("2025-01-20"), d("2025-02-15")))) == Seq(
      (d("2025-01-01"), d("2025-01-04")),
      (d("2025-01-11"), d("2025-01-19"))))
  }

  test("subtract of fully covered range is empty; isCovered agrees") {
    val t = (d("2025-03-01"), d("2025-03-10"))
    assert(Intervals.subtract(t, Seq((d("2025-02-01"), d("2025-04-01")))).isEmpty)
    assert(Intervals.isCovered(t, Seq((d("2025-02-01"), d("2025-04-01")))))
    assert(!Intervals.isCovered(t, Seq((d("2025-03-02"), d("2025-04-01")))))
  }

  test("iterChunks covers the range exactly with <= chunkDays pieces") {
    val chunks = Intervals.iterChunks(d("2025-01-01"), d("2025-07-15"), 180)
    assert(chunks.head._1 == d("2025-01-01"))
    assert(chunks.last._2 == d("2025-07-15"))
    assert(chunks.forall { case (s, e) =>
      !s.isAfter(e) && e.toEpochDay - s.toEpochDay < 180 })
    // contiguous
    chunks.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(s2 == e1.plusDays(1))
      case _ =>
    }
  }

  test("property: subtract gaps are disjoint from covered and tile target") {
    val base = d("2025-01-01")
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val target = (base, base.plusDays(60))
      val covered = (1 to rnd.nextInt(5)).map { _ =>
        val s = base.plusDays(rnd.nextInt(70).toLong)
        (s, s.plusDays(rnd.nextInt(10).toLong))
      }
      val gaps = Intervals.subtract(target, covered)
      val gapDays = gaps.flatMap { case (s, e) =>
        Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e)) }
      val coveredDays = Intervals.merge(covered).flatMap { case (s, e) =>
        Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e)) }.toSet
      val targetDays = Iterator.iterate(target._1)(_.plusDays(1))
        .takeWhile(!_.isAfter(target._2)).toSet
      assert(gapDays.forall(g => targetDays(g) && !coveredDays(g)), s"seed $seed")
      assert(targetDays.forall(t => coveredDays(t) || gapDays.contains(t)),
        s"seed $seed")
    }
  }

  test("branch registry: as-of code resolution across a transition") {
    val reg = new BranchRegistry(Seq(
      CodeWindow("Kavia", "8777", d("2024-02-21"), None),
      CodeWindow("Kavia_OLD", "6161", d("2022-11-01"), Some(d("2024-02-20"))),
      CodeWindow("Queen", "6362", d("2024-01-01"), None),
      CodeWindow("CEDIS", "5392", d("2022-01-01"), None)))
    assert(reg.codeFor("Kavia", d("2023-06-01")).contains("6161"))
    assert(reg.codeFor("Kavia", d("2024-02-21")).contains("8777"))
    assert(reg.codeFor("Kavia", d("2022-10-31")).isEmpty)
    assert(reg.codeFor("CEDIS", d("2023-01-01")).isEmpty) // excluded
    assert(reg.codesOn(d("2024-03-01")) ==
      Map("Kavia" -> "8777", "Queen" -> "6362"))
  }
}
