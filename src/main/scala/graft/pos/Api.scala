package graft.pos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layered fetch/load facade mirroring the reference's entry points
  * (`payments.marts.fetch_daily`, `sales.marts.fetch_ticket/...` —
  * `/root/reference/src/pos_core/payments/marts.py:24-82`,
  * `sales/marts.py:24-160`) with `mode ∈ {missing, force}`
  * idempotence (payments/core.py:52-73):
  *
  *  - `missing`: skip compute when a matching-version ok manifest
  *    covers the range; serve from storage.
  *  - `force`: recompute and overwrite.
  *
  * Storage: `{root}/gold/<mart>/data` parquet partitioned by `fecha`,
  * so date-range loads prune partitions at the source (the Spark-
  * native replacement for the reference's filename-encoded pruning,
  * SURVEY S11), with `_meta/` manifests beside it.
  */
final class PosApi(spark: SparkSession, rootDir: String,
                   version: String = "graft_v1") {

  private def martDir(name: String) = s"$rootDir/gold/$name"

  private def validateMode(mode: String): Unit =
    if (mode != "missing" && mode != "force")
      throw new ConfigError(s"mode must be 'missing' or 'force', got '$mode'")

  /** fact_payments_ticket rows → mart_payments_daily for [start, end],
    * computed at most once per (range, version) unless forced. */
  def fetchPaymentsDaily(payments: DataFrame, start: String, end: String,
                         mode: String = "missing",
                         holidays: Set[java.time.LocalDate] = Set.empty)
      : DataFrame = {
    validateMode(mode)
    val dir = martDir("payments_daily")
    val man = new StageManifests(dir)
    man.runStage(start, end, version, Nil, force = mode == "force") {
      val slice = payments.filter(
        col("operating_date").between(lit(start).cast("date"),
          lit(end).cast("date")))
      PaymentsDaily.aggregate(slice, holidays)
        .write.mode("overwrite")
        // dynamic: only partitions present in THIS slice are replaced;
        // static overwrite would wipe previously stored ranges whose
        // manifests still say ok
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("fecha")
        .parquet(s"$dir/data")
    }
    loadPaymentsDaily(start, end)
  }

  /** Partition-pruned load of a stored mart range. */
  def loadPaymentsDaily(start: String, end: String): DataFrame =
    spark.read.parquet(s"${martDir("payments_daily")}/data")
      .filter(col("fecha").between(lit(start).cast("date"),
        lit(end).cast("date")))

  /** Item lines → ticket mart, same idempotence contract. */
  def fetchSalesByTicket(lines: DataFrame, start: String, end: String,
                         mode: String = "missing"): DataFrame = {
    validateMode(mode)
    val dir = martDir("sales_by_ticket")
    val man = new StageManifests(dir)
    man.runStage(start, end, version, Nil, force = mode == "force") {
      val slice = lines.filter(
        col("operating_date").between(lit(start).cast("date"),
          lit(end).cast("date")))
      SalesByTicket.aggregateByTicket(slice)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("operating_date")
        .parquet(s"$dir/data")
    }
    spark.read.parquet(s"$dir/data")
      .filter(col("operating_date").between(lit(start).cast("date"),
        lit(end).cast("date")))
  }

  /** Item lines → group-level category pivot for [start, end]
    * (`sales/marts.py:117-185` fetch_group): (1) ensure the ticket
    * mart for the range (which is what the group pivot derives from),
    * (2) build/refresh the group pivot when missing or forced,
    * (3) filter the pivot's branch COLUMNS. The pivot is a tiny wide
    * table with a fixed category row order, so it is stored per-range
    * as ONE parquet file (the reference's
    * `mart_sales_by_group_{start}_{end}.csv`) — single-file storage
    * keeps the row order stable across the round-trip. */
  def fetchSalesByGroup(lines: DataFrame, start: String, end: String,
                        mode: String = "missing",
                        branches: Seq[String] = Nil): DataFrame = {
    validateMode(mode)
    val ticket = fetchSalesByTicket(lines, start, end, mode)
    val dir = martDir("sales_by_group")
    new StageManifests(dir)
      .runStage(start, end, version, Nil, force = mode == "force") {
        SalesByGroup.buildCategoryPivot(ticket)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/data/${start}_$end")
      }
    loadSalesByGroup(start, end, branches)
  }

  /** Load-without-ETL (`sales/marts.py:187-230` load_group): raises
    * when no ok manifest covers the exact range — never computes. */
  def loadSalesByGroup(start: String, end: String,
                       branches: Seq[String] = Nil): DataFrame = {
    requireOk("sales_by_group", start, end, "fetchSalesByGroup")
    filterBranchColumns(
      spark.read.parquet(s"${martDir("sales_by_group")}/data/${start}_$end"),
      branches)
  }

  /** Clean transfer lines → "Gasto de Insumos" pivot for [start, end]
    * (`transfers/marts.py:24-96` fetch_pivot over
    * `transfers/aggregate.py` aggregate_to_pivot): manifest-gated per
    * range — `missing` serves from storage when an ok same-version
    * manifest exists, `force` recomputes and overwrites. */
  def fetchTransfersPivot(transfers: DataFrame, start: String,
                          end: String, mode: String = "missing")
      : DataFrame = {
    validateMode(mode)
    val dir = martDir("transfers_pivot")
    new StageManifests(dir)
      .runStage(start, end, version, Nil, force = mode == "force") {
        TransfersPivot.buildPivot(transfers)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/data/${start}_$end")
      }
    loadTransfersPivot(start, end)
  }

  /** Load-without-ETL twin of [[fetchTransfersPivot]] (the
    * `transfers/marts.py` load_pivot contract). */
  def loadTransfersPivot(start: String, end: String): DataFrame = {
    requireOk("transfers_pivot", start, end, "fetchTransfersPivot")
    spark.read.parquet(s"${martDir("transfers_pivot")}/data/${start}_$end")
  }

  /** The reference raises FileNotFoundError when a load targets a
    * range no ok manifest covers (marts.py:100-106,213-219). */
  private def requireOk(mart: String, start: String, end: String,
                        hint: String): Unit =
    if (!new StageManifests(martDir(mart)).read(start, end)
          .exists(_.status == "ok"))
      throw new EtlError(
        s"$mart mart not found for range $start to $end; " +
          s"use $hint() to build it")

  /** fetch_group's branch filter (marts.py:164-183): keep pivot
    * columns whose name case-insensitively CONTAINS any requested
    * branch name; the category label column always survives; when
    * nothing matches the reference logs a warning and returns the
    * pivot unfiltered. */
  private def filterBranchColumns(df: DataFrame,
                                  branches: Seq[String]): DataFrame =
    if (branches.isEmpty) df
    else {
      val wanted = branches.map(_.toLowerCase)
      val matching = df.columns.tail.filter(c =>
        wanted.exists(c.toLowerCase.contains))
      if (matching.isEmpty) df
      else df.select((df.columns.head +: matching)
        .map(df.col): _*)
    }
}

/** Bronze-only order_times domain facade
  * (`/root/reference/src/pos_core/order_times/raw.py:20-93`,
  * `__init__.py`): `fetch()` ensures raw exports exist for a date
  * range — a manifest-gated download with `mode ∈ {missing, force}` —
  * and `load()` verifies coverage WITHOUT downloading, raising when
  * the range is absent. Ingestion is driver-side (SURVEY S1–S5); the
  * transport is an injected function (no egress here), which receives
  * the chunks actually missing, planned over covered-interval
  * manifests like [[graft.pos.ingest.Extraction.planDownloads]]. */
final class OrderTimesRaw(rawDir: String, version: String = "extract_v1") {
  import java.time.LocalDate

  private val man = new StageManifests(rawDir)

  private def validateMode(mode: String): Unit =
    if (mode != "missing" && mode != "force")
      throw new ConfigError(s"mode must be 'missing' or 'force', got '$mode'")

  /** Ensure raw order_times exist for [start, end]. `missing` runs the
    * download only when no ok same-version manifest covers the exact
    * range (raw.py:46-61); `force` always re-downloads (raw.py:50-53).
    * The crash-safe failed→ok manifest protocol comes from
    * [[StageManifests.runStage]]. */
  def fetch(start: String, end: String, branches: Seq[String] = Nil,
            mode: String = "missing")
           (download: Seq[(LocalDate, LocalDate)] => Unit): Unit = {
    validateMode(mode)
    man.runStage(start, end, version, branches, force = mode == "force") {
      val chunks =
        if (mode == "force")
          Seq((LocalDate.parse(start), LocalDate.parse(end)))
        else ingest.Extraction.planDownloads(LocalDate.parse(start),
          LocalDate.parse(end), man.coveredIntervals(version))
      download(chunks)
    }
  }

  /** Verify-only load: returns the ok manifest for the exact range or
    * raises — never downloads (raw.py:64-93 FileNotFoundError
    * contract). */
  def load(start: String, end: String): StageMetadata =
    man.read(start, end).filter(_.status == "ok")
      .getOrElse(throw new ExtractionError(
        s"raw order times not found for range $start to $end; " +
          "use OrderTimesRaw.fetch() to download"))
}

/** Edge-format IO (SURVEY S9/S10): UTF-8-BOM CSV at the boundary —
  * internal storage stays parquet. */
object EdgeIO {
  /** Write a (small, final) DataFrame as ONE `utf-8-sig` CSV file, the
    * reference's export format (payments_cleaner.py:716-728). The
    * single-file coalesce is for edge exports only — marts stay
    * partitioned parquet. */
  def writeCsvWithBom(df: DataFrame, outFile: String): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("csvout")
    try {
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(tmp.toString)
      val src = {
        val st = Files.list(tmp)
        try st.iterator().asScala.find(_.toString.endsWith(".csv"))
          .getOrElse(throw new EtlError(s"no csv part written in $tmp"))
        finally st.close()
      }
      val out = Paths.get(outFile)
      if (out.getParent != null) Files.createDirectories(out.getParent)
      val os = Files.newOutputStream(out)
      try {
        os.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
        Files.copy(src, os)
      } finally os.close()
    } finally {
      val st = Files.walk(tmp)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally st.close()
    }
  }

  /** Read many clean CSVs (BOM-tolerant, recursive glob, header) —
    * the multi-file union the reference does with pd.concat
    * (payments_daily.py:504-526). */
  def readCleanCsvs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("recursiveFileLookup", "true")
      .option("encoding", "UTF-8")
      .csv(path)
}
