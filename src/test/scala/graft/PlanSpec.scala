package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: at 100 TB the plan IS the performance, so these
  * pin the properties that matter — filter pushdown and column pruning
  * reach the parquet scan, small dimension joins broadcast, aggregations
  * are partial+final, and the flagship filter+scrub pipeline stays a
  * single narrow (shuffle-free) stage.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan gets pushed filters and pruned columns") {
    // read via a unique copy: another suite may have cached this table, and
    // an InMemoryRelation would intercept the scan we want to audit
    val dir = java.nio.file.Files.createTempDirectory("plan_pushdown")
    val dst = dir.resolve("documents.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"), dst)
    val df = spark.read.parquet(dst.toString)
      .filter(col("n_chars") > 300)
      .select("doc_id")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(n_chars"), s"no pushdown:\n$plan")
    // ReadSchema must not include the wide text column
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"text not pruned: $readSchema")
  }

  test("semi/anti joins against small filtered dims broadcast") {
    Seq("q_semi_join", "q_anti_join").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(plan.contains("BroadcastHashJoin"), s"$q not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q sort-merges:\n$plan")
    }
  }

  test("group-by aggregations are partial+final with codegen") {
    val df = SparkEntry.queries("q_agg_sum")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan (codegen visible)
    val plan = planOf(df)
    assert(plan.contains("HashAggregate"), plan)
    // partial + final = two HashAggregate operators around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    // whole-stage codegen shows as "*(n)" operator prefixes in plan strings
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).nonEmpty,
      s"no WholeStageCodegen spans:\n$plan")
  }

  test("flagship filter+scrub plan is narrow: zero shuffles") {
    val scored = pipeline.CorpusPipeline.score(
      pipeline.Synth.pages(spark, 100L))
    val plan = planOf(scored)
    assert(!plan.contains("Exchange"),
      s"filter+scrub introduced a shuffle:\n$plan")
  }

  test("analyze struct UDF is evaluated exactly once per row in the " +
      "optimized flagship plan") {
    // the `_h` struct feeds four downstream columns; the analyze UDF is
    // DETERMINISTIC (r4 reverts the r3-advisory asNondeterministic
    // "insurance" — nondeterminism blocks CollapseProject/pushdown and
    // pins projection barriers into the plan), so single evaluation is
    // an optimizer property, pinned here: CollapseProject's cost guard
    // must keep exactly ONE analyze ScalaUDF in the optimized plan
    // rather than inlining it into each field extraction.
    val scored = pipeline.CorpusPipeline.score(
      pipeline.Synth.pages(spark, 20L))
    val analyzeUdfs = scored.queryExecution.optimizedPlan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
            if u.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
              u.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
                .fieldNames.contains("drop_stage") => u
      })
    }
    assert(analyzeUdfs.size == 1,
      s"expected exactly one analyze ScalaUDF in the optimized plan, " +
        s"found ${analyzeUdfs.size}:\n${scored.queryExecution.optimizedPlan}")
  }

  test("scoring stage keeps rows in Tungsten format and prunes html") {
    // the langid scorer must be a scalar UDF over `text`, not a Row-encoder
    // mapPartitions: no object round-trip operators may appear, and the
    // parquet scan must not read the html binary (most of the bytes/page).
    // Written to parquet first so column pruning is observable in ReadSchema.
    val dir = java.nio.file.Files.createTempDirectory("plan_langid").toString
    pipeline.Synth.pages(spark, 50L).write.parquet(s"$dir/pages.parquet")
    val scored = pipeline.CorpusPipeline.score(
      spark.read.parquet(s"$dir/pages.parquet"))
    val plan = planOf(scored)
    Seq("DeserializeToObject", "SerializeFromObject", "MapPartitions")
      .foreach { op =>
        assert(!plan.contains(op), s"scoring stage severs codegen via $op:\n$plan")
      }
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("html"),
      s"html binary not pruned from the scoring scan: $readSchema")
  }

  test("minhash signatures are narrow; dedup flow shuffles only on bands") {
    // adequately-partitioned input (the 100-TB shape: thousands of input
    // splits): the signature pass must stay shuffle-free
    val par = spark.sparkContext.defaultParallelism
    val pages = SparkEntry.pagesFromDocs(spark, sfDir).repartition(par)
    val sigs = dedup.MinHash.signatures(pages, "url", "text")
    val sigPlan = planOf(sigs)
    // the input's own repartition is visible; signatures must add NO
    // exchange of its own on top
    val sigEx = "Exchange".r.findAllIn(sigPlan).size
    assert(sigEx <= 1, s"signatures shuffled beyond the input:\n$sigPlan")
    val edges = dedup.MinHash.candidateEdges(sigs)
    // banding groupBy + candidate join + distinct are the only exchanges
    val nEx = "Exchange".r.findAllIn(planOf(edges)).size
    assert(nEx <= 7, s"too many shuffles ($nEx):\n${planOf(edges)}")
    // single-split input (small-file artifact, optimization guide §2.5):
    // signatures repairs the starved scan with ONE round-robin
    // repartition so the per-doc hash pass parallelizes
    val one = SparkEntry.pagesFromDocs(spark, sfDir).coalesce(1)
    val onePlan = planOf(dedup.MinHash.signatures(one, "url", "text"))
    assert("RoundRobinPartitioning".r.findAllIn(onePlan).size == 1,
      s"single-split input not re-parallelized exactly once:\n$onePlan")
  }

  test("near-pairs bucket shuffle carries ids only, never vectors") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val key = "spark.sql.adaptive.enabled"
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val bPrev = spark.conf.get(bKey)
    spark.conf.set(key, "false") // concrete plan so Exchange nodes are visible
    spark.conf.set(bKey, "-1")   // force the shuffle join this test audits
    try {
      val df = spark.range(50).selectExpr("id AS vec_id",
        "array_repeat(cast(id as float), 64) AS embedding")
      val pairs = analytics.Similarity.nearPairs(df, "vec_id", "embedding",
        minSim = 0.5, bands = 2, bitsPerBand = 4)
      // the bucket self-join runs eagerly inside nearPairs and lands in a
      // localCheckpoint (GC-released, unlike the r2 persist); the
      // returned plan must read an ID-ONLY materialized relation
      // (vectors never entered the bucket stage) and fetch vectors per
      // candidate pair via id-keyed joins
      val plan = pairs.queryExecution.executedPlan
      val rddScans = plan.collect {
        case s: org.apache.spark.sql.execution.RDDScanExec => s
      }
      assert(rddScans.nonEmpty, s"no checkpointed candidate scan found:\n$plan")
      rddScans.foreach { s =>
        val cols = s.output.map(_.name.toLowerCase)
        assert(cols.toSet == Set("id_a", "id_b"),
          s"candidate scan is not id-only: $cols")
      }
      // the verify stage's exchanges are keyed on the pair ids
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.forall(e =>
        e.outputPartitioning.toString.contains("id_") ||
          e.outputPartitioning.toString.contains("_vid")),
        s"unexpected exchange keys:\n$plan")
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(bKey, bPrev)
    }
  }

  test("span dedup exchanges never carry span text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val key = "spark.sql.adaptive.enabled"
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val (prev, bPrev) = (spark.conf.get(key), spark.conf.get(bKey))
    spark.conf.set(key, "false")
    spark.conf.set(bKey, "-1") // worst case: every join a shuffle join
    try {
      val df = spark.range(200).selectExpr("id AS doc_id",
        "concat('w', cast(id % 37 as string), ' x y z a b c') AS text")
      val out = dedup.SpanDedup.removeDuplicateWordSpans(
        df, "doc_id", "text", 3)
      val exchanges = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      // the dedup decision rides (id, pos, hash) narrow rows; exploded
      // span text must never cross an exchange (only the final join-back
      // moves whole docs, and that broadcasts under AQE in practice)
      exchanges.foreach { e =>
        val cols = e.output.map(_.name)
        assert(!cols.contains("_sd_span"),
          s"span text crossed an exchange: $cols")
      }
    } finally {
      spark.conf.set(key, prev); spark.conf.set(bKey, bPrev)
    }
  }

  test("dsir scoring is a narrow zero-shuffle pass") {
    val df = spark.range(100).selectExpr("id",
      "concat('alpha beta word', cast(id % 9 as string)) AS text")
    val model = analytics.Dsir.fit(df.limit(20), df, "text", buckets = 64)
    val scored = analytics.Dsir.score(df, "text", model)
    assert(!planOf(scored).contains("Exchange"),
      s"dsir score shuffled:\n${planOf(scored)}")
  }

  test("exact dedup window partitions by the dedup key (no global sort)") {
    val pages = SparkEntry.pagesFromDocs(spark, sfDir)
    val marked = dedup.ExactDedup.mark(pages, Seq("text"), Seq("warc_ts", "url"))
    val plan = planOf(marked)
    assert(plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("rangepartitioning"),
      s"global sort in dedup:\n$plan")
  }

  test("boilerplate top-K plans as TakeOrderedAndProject, never a " +
    "global sort materialization") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (approx <- Seq(false, true)) {
      val rep = analytics.TextAnalysis.boilerplateShingles(
        docs, "doc_id", "text", n = 3, minOccurrences = 2L, topK = 10,
        approxDocFreq = approx)
      val plan = planOf(rep)
      assert(plan.contains("TakeOrderedAndProject"),
        s"approx=$approx top-K not TakeOrdered:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"approx=$approx global sort crept in:\n$plan")
      // the approx path must be a SINGLE aggregation (one exchange pair
      // fewer than exact's two-level form)
      if (approx) {
        val nAgg = "HashAggregate".r.findAllIn(plan).size
        assert(nAgg <= 3, s"approx path over-aggregates ($nAgg):\n$plan")
      }
    }
  }
}
