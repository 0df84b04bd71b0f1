package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms"; applied to near-dup detection as in
  * Manku et al., WWW 2007): each token is hashed to 64 bits; per bit
  * position, set bits vote +1 and unset bits -1; the sign of each position's
  * total is the output bit. Hamming-close outputs ⇒ similar token multisets.
  *
  * A native Catalyst `Expression` with codegen (not a Scala UDF): evaluates
  * per row inside the stage with zero shuffle and no serialization — at
  * 100 TB the fingerprint is computed in the same scan that reads the text.
  *
  * The token hash is two zero-copy xxHash64 passes over the UTF8 bytes with
  * distinct seeds, combined into 64 bits; any fixed 64-bit hash works, it
  * only has to be stable.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(
      ctx,
      ev,
      arr => s"${ev.value} = graft.functions.SimHash64.hashTokens($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Stable 64-bit token hash: two seeded xxHash64 passes directly over the
    * UTF8String's backing memory (no per-token byte-array copy — this runs
    * per token per row inside the scan), mixed into one word.
    */
  def tokenHash(w: UTF8String): Long = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 0x9747b28cL)
    val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 0x85ebca6bL)
    h1 ^ java.lang.Long.rotateLeft(h2, 32)
  }

  /** Called from both interpreted eval and generated code. */
  def hashTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level entry point: `simhash64(tokensCol)`. */
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(SimHash64(GraftShims.expression(c)))
  }
}
