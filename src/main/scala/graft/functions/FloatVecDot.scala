package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric arrays
  * (`array<float>` or `array<double>`, independently per side) accumulated
  * in double precision, with whole-stage codegen.
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function fold
  * in the similarity operators: HOF lambdas evaluate interpreted per
  * element, while this compiles to a tight primitive loop inside the
  * generated stage — the hot path of brute-force and LSH cosine search is
  * O(|pairs|·dim) multiplies, exactly where codegen pays.
  *
  * Semantics: elements promoted to double, then a left-to-right sequential
  * sum over the COMMON PREFIX `min(|a|,|b|)` (length-mismatched inputs are
  * truncated, not nulled — unlike a `zip_with` fold, which pads with
  * nulls and returns null). Null ARRAY ELEMENTS are read as 0 (no per-
  * element null branch in the hot loop); a null array on either side
  * yields null via the standard null-safe wrapper. On equal-length
  * null-free inputs — the embeddings contract, pinned by the spec — the
  * result is bit-identical to DuckDB's list_dot_product over DOUBLE[],
  * which the oracle relies on.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"float_vec_dot expects array<float|double>, got $other")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (lt, rt) = (elemType(left), elemType(right))
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(lt, x, i)} * ${getter(rt, y, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-API entry point. Inputs: `array<float>`/`array<double>`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
