package graft

import graft.functions.{MaxShingleFreq, Md5Prefix64, MinHashSig, NormalizeText, Shingles, SimHash64, VecDot}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the custom codegen'd expressions: `spark.sql` users get
  * `vec_dot`, `shingles`, `minhash_sig`, `simhash64`, `max_shingle_freq`,
  * `md5_prefix64`, `normalize_text` as
  * first-class functions, either per-session ([[GraftFunctions.register]]) or for every
  * session via `spark.sql.extensions=graft.GraftExtensions` (the standard
  * library-installation hook — no Spark fork, no reflection).
  *
  * The integer parameters (shingle width, permutation count) must be
  * foldable literals: they parameterize CODE GENERATION (loop bounds baked
  * into the generated Java), so a per-row value is structurally impossible —
  * rejected at analysis time with a clear message rather than at runtime.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    // bounds-check BEFORE narrowing: a silent toInt would wrap 2^33+3 to 3
    // and bake the wrong loop bound into generated code
    case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue =>
      v.toInt
    case Literal(v: Short, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$fn: parameter must be an integer literal within Int range (it " +
          s"is baked into generated code), got $other")
  }

  /** (name, info, builder) triples in SparkSessionExtensions.injectFunction
    * shape. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a, b) => VecDot(a, b)
            case _ =>
              throw new IllegalArgumentException(
                s"vec_dot(arr, arr) takes 2 arguments, got ${args.length}")
          }),
      (
        FunctionIdentifier("shingles"),
        new ExpressionInfo(classOf[Shingles].getName, "shingles"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a, n) => Shingles(a, intArg(n, "shingles"))
            case _ =>
              throw new IllegalArgumentException(
                s"shingles(words, n) takes 2 arguments, got ${args.length}")
          }),
      (
        FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a, k) => MinHashSig(a, intArg(k, "minhash_sig"))
            case _ =>
              throw new IllegalArgumentException(
                s"minhash_sig(set, k) takes 2 arguments, got ${args.length}")
          }),
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a) => SimHash64(a)
            case _ =>
              throw new IllegalArgumentException(
                s"simhash64(tokens) takes 1 argument, got ${args.length}")
          }),
      (
        FunctionIdentifier("max_shingle_freq"),
        new ExpressionInfo(classOf[MaxShingleFreq].getName, "max_shingle_freq"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a, n) => MaxShingleFreq(a, intArg(n, "max_shingle_freq"))
            case _ =>
              throw new IllegalArgumentException(
                s"max_shingle_freq(words, n) takes 2 arguments, got ${args.length}")
          }),
      (
        FunctionIdentifier("md5_prefix64"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a) => Md5Prefix64(a)
            case _ =>
              throw new IllegalArgumentException(
                s"md5_prefix64(str) takes 1 argument, got ${args.length}")
          }),
      (
        FunctionIdentifier("normalize_text"),
        new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
        (args: Seq[Expression]) =>
          args match {
            case Seq(a) => NormalizeText(a)
            case _ =>
              throw new IllegalArgumentException(
                s"normalize_text(str) takes 1 argument, got ${args.length}")
          }))

  /** Register on an existing session (session-scoped, no config needed). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` installs the function
  * family into every session of the application.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
