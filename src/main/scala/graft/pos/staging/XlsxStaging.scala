package graft.pos.staging

import graft.sources.Xlsx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full xlsx staging flow (S6 end-to-end,
  * `payments_cleaner.py:282-420`): open the workbook, pick the detail
  * sheet by the case-insensitive/substring rule, bronze-grid it, parse
  * the optional "Pagos Eliminados" sheet (its own header scan, block
  * columns B..L), and hand both to [[PaymentsCleaner.clean]].
  *
  * Until this round the bronze grid had to be produced elsewhere; with
  * [[Xlsx]] the workbook itself is the input, no POI required.
  */
object PaymentsXlsx {

  /** Clean every payments workbook under `path` and union the results.
    * Each workbook is cleaned SEPARATELY — header offsets, the modal
    * sucursal fallback, and the eliminations sheet are per-workbook
    * facts, so a union of raw grids would smear one file's header
    * index onto another's rows. The per-file driver loop mirrors the
    * reference's one-call-per-export flow; the file list is bounded
    * metadata (daily exports), never cell data. */
  def clean(spark: SparkSession, path: String, sucursalHint: String,
            chunkStart: Option[String] = None,
            chunkEnd: Option[String] = None): DataFrame =
    perFile(spark, path) { f =>
      val grid = Xlsx.readGrid(spark, f, "Detalle por forma de pago")
        .drop("_file")
      PaymentsCleaner.clean(grid, sucursalHint,
        eliminations = eliminations(spark, f),
        chunkStart = chunkStart, chunkEnd = chunkEnd)
    }

  private[staging] def perFile(spark: SparkSession, path: String)(
      one: String => DataFrame): DataFrame = {
    val files = Xlsx.listFiles(spark, path)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no .xlsx workbooks under $path")
    files.map(one).reduce(_.unionByName(_))
  }

  /** One workbook's "Pagos Eliminados" sheet → (Fecha de operación,
    * Orden) DataFrame, or None when the sheet (or its required
    * columns) is absent — the reference logs and continues without the
    * flag (payments_cleaner.py:306-420: header row = first of the top
    * 40 containing "Fecha de operación", else row 6; data block =
    * columns B..L below it). */
  def eliminations(spark: SparkSession, file: String)
      : Option[DataFrame] = {
    val grid =
      try Xlsx.readGrid(spark, file, "Pagos Eliminados")
      catch { case _: Exception => return None }
    val cellCols = grid.columns.filter(_.startsWith("_c"))
    // block B..L = _c1.._c11 (payments_cleaner.py:339)
    val block = cellCols.filter { c =>
      val i = c.drop(2).toInt; i >= 1 && i <= 11
    }
    if (block.isEmpty) return None
    val head = grid.orderBy(col("_row")).limit(40).collect()
    val headerIdx = head.find(r => cellCols.exists { c =>
      val v = r.getAs[String](c)
      v != null && Headers.stripInvisibles(v).contains("Fecha de operación")
    }).map(_.getAs[Long]("_row")).getOrElse(5L)
    val headerRow = head.find(_.getAs[Long]("_row") == headerIdx)
      .getOrElse(return None)
    def colFor(target: String): Option[String] = block.find { c =>
      val v = headerRow.getAs[String](c)
      v != null && Headers.stripInvisibles(v).trim == target
    }
    for {
      fecha <- colFor("Fecha de operación")
      orden <- colFor("Orden")
    } yield grid.filter(col("_row") > headerIdx)
      .select(col(fecha).as("Fecha de operación"),
        col(orden).as("Orden"))
      .na.drop("all")
  }
}

/** Sales workbooks: sheet "Detalle de Ventas" by the same lookup rule
  * (sales_cleaner.py:366-371); the cleaner then does its own header
  * scan and top-left sucursal parse over the grid. */
object SalesXlsx {
  def clean(spark: SparkSession, path: String,
            sucursalHint: Option[String] = None): DataFrame =
    PaymentsXlsx.perFile(spark, path) { f =>
      SalesCleaner.clean(
        Xlsx.readGrid(spark, f, "Detalle de Ventas").drop("_file"),
        sucursalHint)
    }
}

/** Transfers workbooks: EXACT (case-sensitive) sheet "Transferencias",
  * else the workbook's FIRST sheet — a deliberately different rule
  * than the other cleaners (transfer_cleaner.py:143-149). */
object TransfersXlsx {
  def clean(spark: SparkSession, path: String): DataFrame =
    PaymentsXlsx.perFile(spark, path) { f =>
      TransfersCleaner.clean(
        Xlsx.readGridWith(spark, f,
          names => if (names.contains("Transferencias")) "Transferencias"
                   else names.head)
          .drop("_file"))
    }
}
