package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable polynomial hash — the hot kernel under every
  * sketch and deterministic-sampling operator (KMV, count-min, quantile,
  * hash/mixture sampling, simhash signatures).
  *
  * Semantics are EXACTLY the relational fold the oracles replay:
  * `h ← (h·mult + ascii(c)) mod p` over the characters of
  * `split(text, "")` — i.e. per Unicode code point, contributing the
  * code point value for BMP characters and (mirroring `ascii()`'s
  * charAt(0)) the high-surrogate unit for supplementary ones. The
  * SQL-expressible recurrence is the portability contract; this kernel
  * is only a faster evaluator for it. The previous formulation — a
  * `transform(split(...))` + `aggregate` higher-order pipeline — ran
  * interpreted (HOFs never enter whole-stage codegen) and allocated a
  * per-character string array per row; this expression participates in
  * whole-stage codegen via `doGenCode` (static-call kernel, the same
  * shape as TextKernels.BoundedLevenshtein) and walks the string once.
  * Measured in ScaleProbe `ops`: the 100M-token count-min counter build
  * drops from 26 s (interpreted, C2-warm) to ~3 s.
  *
  * Equality with the HOF form is pinned two ways: a randomized unit spec
  * (ASCII + multibyte) and the 86-query DuckDB oracle gate, which
  * hash-compares every sketch output at three scale factors.
  */
object HashKernels {

  /** The fold kernel. Empty input → 0 (the fold's initial accumulator —
    * identical to the HOF form, whose `split("", "") = [""]` contributes
    * `ascii("") = 0` through one fold step: (0·m + 0) mod p = 0). */
  def polyHash(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    val n = str.length
    var h = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      // ascii(c) of a split-element is charAt(0): the code point for BMP
      // chars, the high surrogate for supplementary ones
      val v = if (w == 1) cp else str.charAt(i).toInt
      h = (h * mult + v) % mod
      i += w
    }
    h
  }

  case class PolyHash(child: Expression, mult: Long, mod: Long)
      extends UnaryExpression {
    require(mod > 0 && mult > 0 && mult < mod,
      s"poly_hash needs 0 < mult < mod, got mult=$mult mod=$mod")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects a string input, got $other")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override protected def nullSafeEval(input: Any): Any =
      polyHash(input.asInstanceOf[UTF8String], mult, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashKernels.polyHash($c, ${mult}L, ${mod}L)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: `h ← (h·mult + char) mod p` over `text`'s characters. */
  def polyHash(text: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(text), mult, mod))

  /** Cut positions of a token array: indices `i` with
    * `polyHash(ts[i]) mod divisor == remainder` — the boundary scan of
    * content-defined chunking as ONE kernel call per row. A
    * `filter(sequence(...), i -> polyHash(element_at(ts, i+1)) ...)`
    * HOF computes the identical positions but runs interpreted per
    * ELEMENT (HOFs never enter whole-stage codegen); this walks the
    * array once in compiled code (measured on the q176 bench: 7.3 s →
    * sub-second at sf0.1). Null elements are never cuts. */
  def cdcCutsKernel(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                    mult: Long, mod: Long, divisor: Int,
                    remainder: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          polyHash(arr.getUTF8String(i), mult, mod) % divisor == remainder)
        buf += i
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.result())
  }

  case class CdcCuts(child: Expression, mult: Long, mod: Long,
                     divisor: Int, remainder: Int)
      extends UnaryExpression {
    require(mod > 0 && mult > 0 && mult < mod,
      s"cdc_cuts needs 0 < mult < mod, got mult=$mult mod=$mod")
    require(divisor >= 2 && remainder >= 0 && remainder < divisor,
      s"cdc_cuts needs 0 <= remainder < divisor, divisor >= 2; " +
        s"got divisor=$divisor remainder=$remainder")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_cuts expects array<string>, got $other")
    }
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "cdc_cuts"

    override protected def nullSafeEval(input: Any): Any =
      cdcCutsKernel(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        mult, mod, divisor, remainder)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashKernels.cdcCutsKernel($c, ${mult}L, ${mod}L, " +
          s"$divisor, $remainder)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: [[CdcCuts]] over a token-array column. */
  def cdcCuts(tokens: Column, mult: Long, mod: Long, divisor: Int,
              remainder: Int): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(tokens),
      mult, mod, divisor, remainder))
}
