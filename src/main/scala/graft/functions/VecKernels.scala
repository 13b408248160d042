package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dense-vector kernels — the inner loop of every
  * similarity operator (brute-force/IVF top-k scoring, embedding
  * near-dup, LSH plane projections, k-means assignment).
  *
  * Semantics are EXACTLY the relational fold the oracles replay:
  * `aggregate(zip_with(cast(a), cast(b), x·y), 0.0, +)` — element-wise
  * product (or squared difference) accumulated left-to-right in double.
  * float→double widening is exact and the loop preserves the fold's
  * addition order, so results are bit-identical to the higher-order
  * form (pinned by VecKernelsSpec and the oracle gate). Like PolyHash,
  * the HOF pipeline ran interpreted (HOFs never enter whole-stage
  * codegen) and boxed every element; this expression walks the two
  * ArrayData buffers once per row inside codegen.
  *
  * Null semantics mirror the HOF form: null array, mismatched lengths
  * (zip_with pads with null), or any null element → null result. */
object VecKernels {

  /** mode 0: Σ a·b (dot); mode 1: Σ (a−b)² (squared L2). Boxed return
    * carries the null case; one box per ROW, vs one per element before. */
  def combine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
      mode: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (if (mode == 0) x * y else (x - y) * (x - y))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  case class VecCombine(left: Expression, right: Expression, mode: Int)
      extends BinaryExpression {
    private def elemFloat(dt: DataType): Option[Boolean] = dt match {
      case ArrayType(FloatType, _) => Some(true)
      case ArrayType(DoubleType, _) => Some(false)
      case _ => None
    }
    override def checkInputDataTypes(): TypeCheckResult =
      (elemFloat(left.dataType), elemFloat(right.dataType)) match {
        case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> inputs, got " +
            s"(${left.dataType}, ${right.dataType})")
      }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String =
      if (mode == 0) "vec_dot" else "vec_l2sq"

    private lazy val aFloat = elemFloat(left.dataType).get
    private lazy val bFloat = elemFloat(right.dataType).get

    override protected def nullSafeEval(a: Any, b: Any): Any =
      combine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        aFloat, bFloat, mode)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("vecR")
        s"""
           |java.lang.Double $r = graft.functions.VecKernels.combine(
           |  $a, $b, $aFloat, $bFloat, $mode);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecCombine(
      ColumnBridge.expression(a), ColumnBridge.expression(b), 0))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(VecCombine(
      ColumnBridge.expression(a), ColumnBridge.expression(b), 1))
}
