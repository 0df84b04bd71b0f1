package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest occurrence count of any word n-gram in a token array (NOT
  * distinct — repeats are the point). This is the core of the Gopher/C4
  * repetition quality signals: a document whose single most frequent bigram
  * covers a large fraction of the text is boilerplate/spam, not prose.
  *
  * Equivalent declarative form (what the DuckDB oracle runs):
  * `unnest` all n-grams, `GROUP BY doc, gram`, `max(count)`. Running that
  * shape in Spark would shuffle every n-gram of every document; this
  * expression computes the same number in one codegen'd map-side pass with
  * a per-row hash map (bounded by the token count of one document), so the
  * repetition score is a zero-shuffle scan at any corpus size.
  *
  * Returns 0 for arrays with fewer than n tokens (no n-grams exist).
  */
case class MaxShingleFreq(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"max_shingle_freq requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MaxShingleFreq.maxFreq(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = graft.functions.MaxShingleFreq.maxFreq($arr, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): MaxShingleFreq = copy(child = newChild)
}

object MaxShingleFreq {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. N-gram strings are
    * tokens joined by a single space with `concat_ws` null-skipping — the
    * same convention as [[Shingles.shingle]], so the two families agree on
    * what an n-gram IS.
    */
  def maxFreq(tokens: ArrayData, n: Int): Long = {
    val total = tokens.numElements()
    if (total < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Long]()
    var best = 0L
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
      val gram = UTF8String.concat(parts.take(k): _*)
      val c = counts.merge(gram, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Column-level entry point: `maxShingleFreq(tokensCol, 2)`. */
  def maxShingleFreq(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(MaxShingleFreq(GraftShims.expression(c), n))
  }
}
