package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass dedup normalization — byte-identical to the declarative chain
  * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
  * ' +', ' '))` that the DuckDB oracle keeps computing, without the two
  * regex engines and three intermediate strings the chain materializes per
  * row. Lowercasing delegates to the same `UTF8String.toLowerCase` that
  * Spark's `lower` uses (so Unicode case mapping stays identical); the
  * strip + collapse + trim then run as ONE byte scan: the character class
  * `[a-z0-9 ]` is pure ASCII, and every byte of a multi-byte UTF-8
  * character has the high bit set, so byte-wise filtering IS
  * character-wise filtering. Skipping a stripped byte without touching
  * the last-was-space state reproduces exactly the chain's
  * strip-THEN-collapse order (space runs merged across removed chars),
  * and emitting no leading space plus dropping the at-most-one trailing
  * space reproduces `trim`. FunctionsSpec pins equivalence against the
  * declarative chain by scalacheck over punctuated/multi-space/Unicode
  * strings. Used by q_dedup_normalized and q_pipeline_curate — the most
  * data-bound linear scans in the registry (the full text of the corpus
  * flows through them; at 100 TB the normalize is the dominant CPU).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"${ev.value} = graft.functions.NormalizeText.normalize($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Called from both interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.getBytes
    val out = new Array[Byte](lowered.length)
    var n = 0
    var lastSpace = true // true at start => no leading space is emitted
    var i = 0
    while (i < lowered.length) {
      val b = lowered(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(n) = b; n += 1; lastSpace = false
      } else if (b == ' ') {
        if (!lastSpace) { out(n) = ' '; n += 1; lastSpace = true }
      }
      // any other byte (punctuation, control, every byte of a multi-byte
      // UTF-8 char) is stripped WITHOUT updating lastSpace — that models
      // the chain's strip-before-collapse order exactly
      i += 1
    }
    if (n > 0 && out(n - 1) == ' ') n -= 1 // trim: at most one trailing space survives the collapse
    UTF8String.fromBytes(out, 0, n)
  }

  def normalizeText(c: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(NormalizeText(GraftShims.expression(c)))
  }
}
