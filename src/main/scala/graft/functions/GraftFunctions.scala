package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash signature
  * ([[graft.analytics.NearDup.simhash64]]) — the codegen'd replacement
  * for the Scala UDF on the near-dup hot path.
  *
  * Why an `Expression` instead of `udf(...)`: a ScalaUDF sits behind an
  * encoder boundary (catalyst → external String conversion plus a
  * megamorphic function call per row, with codegen falling back to an
  * opaque invoke), while this expression generates a direct static call
  * inside whole-stage codegen — no wrapper allocation, null handling
  * compiled inline. Semantics are identical to the Scala function by
  * construction (both call the same static kernel; asserted in
  * FunctionsSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  // manual input-type check: ExpectsInputTypes needs AbstractDataType,
  // which Spark 4 made private[sql]
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    graft.analytics.NearDup.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.analytics.NearDup.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native single-space token counter — the codegen'd replacement for
  * `size(split(c, " "))`, which materializes a per-row ARRAY of
  * substrings only to take its length. Semantics are EXACTLY the
  * split-size ones (separator count + 1, counting empty tokens, null →
  * null): ASCII 0x20 never occurs inside a UTF-8 multibyte sequence, so
  * the count is a raw byte scan with no string materialization at all.
  */
case class CountSpaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_space_tokens requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "count_space_tokens"

  override def nullSafeEval(input: Any): Any =
    CountSpaceTokens.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CountSpaceTokens.count($c)")

  override protected def withNewChildInternal(newChild: Expression): CountSpaceTokens =
    copy(child = newChild)
}

object CountSpaceTokens {
  /** Static kernel (also the codegen call target). */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 1
    var i = 0L
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20)
        c += 1
      i += 1
    }
    c
  }
}

/** Optimizer rule: rewrite `size(split(c, " "))` (the common word-count
  * shape over single-space-normalized text) to [[CountSpaceTokens]] —
  * algebraically identical, but the array of substrings is never built.
  * Fires only on the EXACT literal single-space separator with the
  * default limit and non-legacy size-of-null; any regex separator or
  * explicit limit is left untouched.
  */
object CountTokensRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(sep: UTF8String, StringType),
            Literal(-1, org.apache.spark.sql.types.IntegerType)), false)
          if sep.toString == " " =>
        CountSpaceTokens(str)
    }
}

/** Registration surface for the engine's native SQL functions.
  *
  *  - [[GraftFunctions.register]]: imperative, for an existing session
  *    (idempotent; used by the operators themselves).
  *  - [[GraftExtensions]]: declarative, via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    cluster-deploy path that makes `SELECT simhash64(text)` available
  *    to plain `spark.sql` users without touching code.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("simhash64", exprs => SimHash64(exprs.head),
      "64-bit SimHash document signature over whitespace word features"),
    ("count_space_tokens", exprs => CountSpaceTokens(exprs.head),
      "single-space token count, identical to size(split(c, ' '))"))

  /** Function registration ONLY — no optimizer mutation. Operators call
    * this freely (it is idempotent and session-local); installing the
    * rewrite rule is a deliberate deployment decision, not a side
    * effect of using an analytics operator.
    */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Install [[CountTokensRewrite]] on an ALREADY-BUILT session
    * (extensions only apply at construction). Explicit opt-in: skipped
    * when the session was built with [[GraftExtensions]] (the rule is
    * already injected there — appending again would traverse every plan
    * twice), and idempotent across repeat calls.
    */
  def installOptimizations(spark: SparkSession): Unit = {
    val viaExtensions = spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("graft.functions.GraftExtensions"))
    val cur = spark.experimental.extraOptimizations
    if (!viaExtensions && !cur.contains(CountTokensRewrite))
      spark.experimental.extraOptimizations = cur :+ CountTokensRewrite
  }

  /** Column API: `simhash64($"text")`. Registers on the column's session
    * lazily at call sites that own a session; here we go through
    * `call_function`, which resolves at analysis time against whatever
    * session analyzes the plan — callers must have invoked [[register]]
    * (engine operators do).
    */
  def simhash64(c: Column): Column = call_function("simhash64", c)
}

/** `spark.sql.extensions` entry point: SQL functions + the optimizer
  * rewrite rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("count_space_tokens"),
      new ExpressionInfo(classOf[CountSpaceTokens].getName, "count_space_tokens"),
      (exprs: Seq[Expression]) => CountSpaceTokens(exprs.head)))
    ext.injectOptimizerRule(_ => CountTokensRewrite)
  }
}
