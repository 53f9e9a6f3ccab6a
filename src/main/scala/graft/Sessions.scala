package graft

import org.apache.spark.sql.SparkSession

/** THE shared SparkSession recipe for every entry point (Bench,
  * Verify, Profile, PlanAudit, the fingerprint regen main and the
  * test suites): one definition so a session-level tuning decision —
  * like the codegen-cache sizing below — cannot silently apply to one
  * entry point and not another (round-11 verdict item 5: the setting
  * lived in three mains; a fourth entry point, or a real cluster
  * driver, would have missed it).
  *
  * Master/parallelism stay CALLER-CHOSEN: the driver benches at
  * several core counts via SPARK_GRAFT_CPUS, and the plan-snapshot
  * lane is pinned at local[4] so fingerprints are machine-independent.
  */
object Sessions {
  /** Builder with the repo's session-level tuning applied.
    *
    * - `spark.sql.session.timeZone=UTC`: oracle (DuckDB) parity for
    *   every timestamp surface.
    * - `spark.sql.codegen.cache.maxEntries=10000`: the default
    *   100-entry generated-class cache thrashes on this suite —
    *   single composite queries carry 120–230 codegen fragments
    *   (q257/q262/q271 measured in round 11), so every invocation
    *   re-Janino-compiled ~2.5 s of identical source. Scale-neutral:
    *   a driver-side class cache, so the same setting is right on a
    *   real cluster driver.
    * - UI off: these are headless batch entry points.
    */
  def local(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .withExtensions(new functions.GraftExtensions)
}
