package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.analytics.NearDup

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox",
    "the quick brown fox jumps",
    "",
    "  spaced   out   words  ",
    "единственный unicode пример with mixed скрипты"
  )

  test("native expression matches the Scala kernel bit-for-bit") {
    GraftFunctions.register(spark)
    val df = texts.toDF("text")
    val got = df.select(GraftFunctions.simhash64($"text")).as[Long].collect()
    assert(got.toSeq == texts.map(NearDup.simhash64))
  }

  test("null-safe and registered for plain SQL") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT simhash64(t) FROM VALUES ('a b c'), (CAST(NULL AS STRING)) AS v(t)")
      .collect()
    assert(out(0).getLong(0) == NearDup.simhash64("a b c"))
    assert(out(1).isNullAt(0))
  }

  test("expression stays inside whole-stage codegen (no ScalaUDF)") {
    GraftFunctions.register(spark)
    // non-foldable source: a local literal table would be constant-folded
    // into a LocalTableScan and hide the projection under test
    val df = spark.range(100)
      .select(concat(lit("document number "), $"id").as("text"))
      .select(GraftFunctions.simhash64($"text").as("sig"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash64"), plan)
    assert(!plan.contains("UDF"), s"fell back to a ScalaUDF:\n$plan")
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).nonEmpty,
      s"no WholeStageCodegen span:\n$plan")
  }

  test("interpreted eval path agrees with codegen") {
    // force the interpreted path by evaluating the expression directly
    val e = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha beta gamma")))
    assert(e.eval(null) == NearDup.simhash64("alpha beta gamma"))
    val n = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
      null, org.apache.spark.sql.types.StringType))
    assert(n.eval(null) == null)
  }

  test("extensions class injects the function into a fresh analyzer") {
    // same registry mechanism the spark.sql.extensions path uses
    val ext = new GraftExtensions
    // smoke: building the injection tuple must not throw and the builder
    // must produce a working expression
    val built = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("x y")))
    assert(built.dataType == org.apache.spark.sql.types.LongType)
    assert(ext != null)
  }

  test("count_space_tokens equals size(split(c, ' ')) on every edge") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq("a b c", "", " ", "a ", " a", "a  b", "solo",
      "\u00e9t\u00e9 caf\u00e9 \u4e2d\u6587 x", "a\tb") // tab is NOT a separator
    val df = rows.toDF("t")
    val both = df.selectExpr("size(split(t, ' ')) AS ref",
      "count_space_tokens(t) AS fast").as[(Int, Int)].collect()
    both.foreach { case (ref, fast) => assert(ref == fast, s"$ref != $fast") }
    // null in, null out
    val n = Seq[String](null).toDF("t")
      .selectExpr("count_space_tokens(t)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("optimizer rule rewrites size(split(c, ' ')) and nothing else") {
    import spark.implicits._
    // the shared test session is built with GraftExtensions, so the
    // rule is already injected; installOptimizations must detect that
    // and NOT append a second copy (double plan traversal otherwise)
    GraftFunctions.installOptimizations(spark)
    assert(spark.experimental.extraOptimizations.isEmpty,
      "rule double-installed on an extension-built session")
    // range-derived, not literal rows: a literal frame constant-folds to
    // a LocalRelation before the rewrite is observable
    val df = spark.range(2)
      .selectExpr("concat('w', cast(id as string), ' x y') AS t")
    val hit = df.selectExpr("size(split(t, ' ')) AS n")
    val opt = hit.queryExecution.optimizedPlan.toString
    assert(opt.contains("count_space_tokens"),
      s"rewrite did not fire:\n$opt")
    // values preserved under the rewrite
    assert(hit.as[Int].collect().toSeq == Seq(3, 3))
    // regex separators and explicit limits are untouched
    for (expr <- Seq("size(split(t, '\\\\s+'))", "size(split(t, ' ', 2))")) {
      val miss = df.selectExpr(s"$expr AS n")
      assert(!miss.queryExecution.optimizedPlan.toString
        .contains("count_space_tokens"), s"over-eager rewrite on $expr")
    }
  }

  test("count_space_tokens stays inside whole-stage codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // fallback=false: a broken doGenCode must FAIL here, not silently
    // drop to interpreted execution with the assertions still green
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = spark.range(100).selectExpr("cast(id as string) AS t")
        .selectExpr("count_space_tokens(t) AS n")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), plan)
      // "*(n)" is the wholestage-codegen span marker in simple plan strings
      assert(plan.contains("*(1)"), plan)
      assert(df.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() == 100L)
    } finally spark.conf.set(key, prev)
  }
}
