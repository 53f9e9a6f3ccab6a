package graft.pos

import java.time.LocalDate

/** Date-interval algebra for incremental processing — driver-side (the
  * manifests it operates on are tiny). Semantics match
  * `/root/reference/src/pos_core/etl/utils.py:94-242`:
  * closed intervals [start, end]; merge joins touching/overlapping;
  * subtract returns the requested range minus covered parts.
  */
object Intervals {
  type I = (LocalDate, LocalDate)

  /** Merge overlapping or adjacent (gap ≤ 1 day) intervals
    * (utils.py:125-159). */
  def merge(intervals: Seq[I]): Seq[I] = {
    val sorted = intervals.filter(i => !i._1.isAfter(i._2)).sortBy(_._1)
    sorted.foldLeft(List.empty[I]) {
      case (Nil, i) => List(i)
      case (acc @ ((s, e) :: rest), (s2, e2)) =>
        if (!s2.isAfter(e.plusDays(1)))
          (s, if (e2.isAfter(e)) e2 else e) :: rest
        else (s2, e2) :: acc
    }.reverse
  }

  /** target minus covered → uncovered gaps (utils.py:162-211). */
  def subtract(target: I, covered: Seq[I]): Seq[I] = {
    val (ts, te) = target
    if (ts.isAfter(te)) return Nil
    val relevant = merge(covered)
      .filter { case (s, e) => !e.isBefore(ts) && !s.isAfter(te) }
    var cursor = ts
    val gaps = scala.collection.mutable.ListBuffer.empty[I]
    relevant.foreach { case (s, e) =>
      if (s.isAfter(cursor)) gaps += ((cursor, s.minusDays(1)))
      if (e.plusDays(1).isAfter(cursor)) cursor = e.plusDays(1)
    }
    if (!cursor.isAfter(te)) gaps += ((cursor, te))
    gaps.toList
  }

  /** True when target is fully covered (utils.py:214-242). */
  def isCovered(target: I, covered: Seq[I]): Boolean =
    subtract(target, covered).isEmpty

  /** Split a range into ≤ chunkDays-day chunks (utils.py:94-122). */
  def iterChunks(start: LocalDate, end: LocalDate,
                 chunkDays: Int): Seq[I] = {
    require(chunkDays > 0, "chunkDays must be positive")
    Iterator.iterate(start)(_.plusDays(chunkDays.toLong))
      .takeWhile(!_.isAfter(end))
      .map { s =>
        val e = s.plusDays(chunkDays.toLong - 1)
        (s, if (e.isAfter(end)) end else e)
      }.toList
  }
}
