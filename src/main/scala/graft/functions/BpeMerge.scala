package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the greedy leftmost non-overlapping BPE merge
  * step (`CorpusOps.bpeFoldExpr`'s semantics): one linear pass over
  * the symbol array, replacing the composed in-row `aggregate` fold
  * whose interpreted lambda rebuilds the accumulator array per
  * element (O(n²) copies per word per round) and whose struct
  * accumulator allocates per element. The trainer loop applies this
  * once per word per round — 10 rounds × 4 query families at bench
  * scale, unbounded rounds in a production trainer.
  *
  * Contract (pinned against the composed fold by a ScalaCheck
  * property in EngineProperties): scan left to right; at position i,
  * if syms(i)==mx and syms(i+1)==my emit concat(mx,my) and advance
  * by 2, else emit syms(i) and advance by 1 — identical to the
  * fold's (prev, out) recurrence including the overlap case
  * ("aaa" + (a,a) → [aa, a]). A NULL mx or my (the degenerate
  * LEFT-join-on-TRUE round whose pair census is empty) is the
  * identity, NOT null-out — the vocabulary must pass through
  * unchanged. */
object BpeMergeUtil {
  def merge(syms: ArrayData, mx: UTF8String, my: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (mx == null || my == null || n < 2) {
      val out = new Array[AnyRef](n)
      var i = 0
      while (i < n) { out(i) = syms.getUTF8String(i); i += 1 }
      return new GenericArrayData(out)
    }
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && mx.equals(syms.getUTF8String(i))
          && my.equals(syms.getUTF8String(i + 1))) {
        out(k) = UTF8String.concat(mx, my)
        k += 1; i += 2
      } else {
        out(k) = syms.getUTF8String(i)
        k += 1; i += 1
      }
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** `bpe_merge(syms, mx, my)` → array<string>: null syms → null;
  * null mx/my → syms unchanged (see [[BpeMergeUtil]]). */
case class BpeMerge(syms: Expression, mx: Expression, my: Expression)
    extends TernaryExpression {
  override def first: Expression = syms
  override def second: Expression = mx
  override def third: Expression = my
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = syms.nullable

  override def eval(input: InternalRow): Any = {
    val a = syms.eval(input)
    if (a == null) null
    else BpeMergeUtil.merge(a.asInstanceOf[ArrayData],
      mx.eval(input).asInstanceOf[UTF8String],
      my.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val a = syms.genCode(ctx)
    val x = mx.genCode(ctx)
    val y = my.genCode(ctx)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${a.code}
        boolean ${ev.isNull} = ${a.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${x.code}
          ${y.code}
          ${ev.value} = graft.functions.BpeMergeUtil.merge(${a.value},
            ${x.isNull} ? null : ${x.value},
            ${y.isNull} ? null : ${y.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMerge =
    copy(syms = newFirst, mx = newSecond, my = newThird)
  override def prettyName: String = "bpe_merge"
}
