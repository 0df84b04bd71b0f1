package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a codegen'd Catalyst expression.
  *
  * The declarative equivalent — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is a CodegenFallback higher-order function: per row it allocates the
  * zipped intermediate array and walks an interpreted expression tree per
  * element. On the all-pairs similarity ops that means millions of
  * interpreted 64-element folds (measured ~30 s at sf0.1); this expression
  * is a tight primitive loop inside whole-stage codegen (~1 s).
  *
  * Semantics match the declarative form and DuckDB's `list_dot_product` on
  * DOUBLE[]: elements upcast to double, multiply-add left to right (IEEE
  * summation order preserved for cross-engine hash parity). Null elements
  * count as 0; a null or length-mismatched pair yields null.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(
      a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Double ${ev.value}$$r = graft.functions.VecDot.dot(
         |  $a, $leftIsFloat, $b, $rightIsFloat);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Shared by interpreted eval and generated code. Boxed return so a
    * length mismatch can surface as SQL null instead of an exception. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean)
      : java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x =
        if (a.isNullAt(i)) 0.0
        else if (aFloat) a.getFloat(i).toDouble
        else a.getDouble(i)
      val y =
        if (b.isNullAt(i)) 0.0
        else if (bFloat) b.getFloat(i).toDouble
        else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-level entry point: `vecDot(a, b)`. */
  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(VecDot(GraftShims.expression(a), GraftShims.expression(b)))
  }
}
