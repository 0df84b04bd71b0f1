package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, first-occurrence order —
  * the codegen'd equivalent of
  * `array_distinct(transform(sequence(1, size(w)-n+1),
  *    i -> concat_ws(" ", element_at(w,i), ..., element_at(w,i+n-1))))`.
  *
  * That declarative form is a CodegenFallback higher-order-function stack
  * interpreted per row (measured ~10 s just to shingle 5 000 docs at sf0.1,
  * and the dedup self-joins recompute it per join side); this expression is
  * one pass over the tokens with a hash-set dedupe, inside whole-stage
  * codegen. Output strings are tokens joined by a single space — identical
  * to the declarative form and to the DuckDB oracle's
  * `w[i] || ' ' || w[i+1] || ' ' || w[i+2]`.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"shingles requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = graft.functions.Shingles.shingle($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. Null tokens are skipped
    * together with their separator — exactly `concat_ws`'s null handling, so
    * the declarative-equivalence property holds even for arrays with nulls.
    */
  def shingle(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val parts = new Array[UTF8String](2 * n - 1)
    while (i + n <= total) {
      var j = 0
      var k = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        if (t != null) {
          if (k > 0) { parts(k) = Space; k += 1 }
          parts(k) = t
          k += 1
        }
        j += 1
      }
      out.add(UTF8String.concat(parts.take(k): _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Column-level entry point: `shingles(tokensCol, 3)`. */
  def shingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(Shingles(GraftShims.expression(c), n))
  }
}
