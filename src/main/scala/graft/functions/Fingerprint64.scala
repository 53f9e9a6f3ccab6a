package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the document content fingerprint (the dedup key
  * of q53/q55/q82/q87/q109 and the streaming corpus dedup): one pass
  * over the text instead of the composed
  * `aggregate(transform(split(...)))` spelling, whose higher-order
  * lambdas are interpreted per element and allocate the full token
  * array per row.
  *
  * Bit-parity contract (pinned by a ScalaCheck property against the
  * composed spelling): token hash = ascii(t)·131 + length(t) where
  * ascii = first CODEPOINT (0 for the empty token — Spark `ascii`
  * semantics) and length counts codepoints (Spark `length`), folded as
  * (acc·31 + x) mod 1e9+7 over `split(text, ' ')` WITH empty tokens
  * kept (Spark split keeps them). The DuckDB twin is
  * [[graft.ops.TextOps.fingerprintSql]].
  */
object Fingerprint64Util {
  private val Mod = 1000000007L

  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var start = 0
    var done = false
    while (!done) {
      val sp = str.indexOf(' ', start)
      val end = if (sp < 0) str.length else sp
      // token = str[start, end): first codepoint and codepoint count
      // without materializing the substring
      val a =
        if (end == start) 0L else str.codePointAt(start).toLong
      val len = str.codePointCount(start, end).toLong
      acc = (acc * 31L + (a * 131L + len)) % Mod
      if (sp < 0) done = true else start = sp + 1
    }
    acc
  }
}

/** `fingerprint64_native(string)` → bigint — registered through
  * [[GraftExtensions]] and used directly (via the plan bridge) by
  * `TextOps.fingerprintCol`, so every dedup path shares the single
  * codegen'd kernel. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Fingerprint64Util.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fingerprint64Util.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Fingerprint64 = copy(child = newChild)
  override def prettyName: String = "fingerprint64"
}
