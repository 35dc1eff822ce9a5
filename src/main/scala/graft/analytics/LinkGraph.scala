package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring: domain-level PageRank over crawl
  * hyperlinks, the standard web-corpus quality prior (Common Crawl
  * publishes exactly this ranking; pipelines use it to weight or gate
  * low-authority domains before expensive per-document scoring).
  *
  * The rank arithmetic is INTEGER-EXACT fixed point (parts-per-billion
  * longs), the same idiom as `Sampling.temperatureSample`'s
  * integer-exact targets: long sums are associative and order-
  * independent, so the result is bit-identical on any partitioning and
  * any shuffle order — and a SQL oracle can replay the iterations
  * exactly, where a floating-point PageRank would hash-mismatch on
  * summation order alone. Floor division loses ≤ outdeg−1 ppb of a
  * node's mass per iteration (documented, deterministic); the damping
  * split `x div d · n + (x mod d) · n div d` never overflows — the
  * intermediate stays under `max(x, dampDen·dampNum)` — so corpora up
  * to ~9e9 nodes fit in long range at Scale = 1e9.
  *
  * Scale shape per iteration (everything corpus-sized carries ids only):
  *   - contributions: one hash join of the edge table against the rank
  *     table on `src` + one `groupBy(dst).sum` — both partial-aggregated
  *     map-side; the edge table is materialized ONCE (joined to outdeg)
  *     and its blocks are reused every round.
  *   - dangling mass: an O(1)-row agg over the ranks of sink nodes
  *     (precomputed anti-join, also materialized once).
  *   - the new rank frame is lineage-truncated via
  *     [[graft.SparkUtil.materialize]] each round, the MinHash-CC loop
  *     discipline — without it the plan doubles per iteration.
  * Iterations are a fixed, loud-bounded count (authority ranking wants
  * 5-20 rounds, not convergence detection: the fixed-point integer
  * ranks stabilize to ±1 ppb and a convergence probe would cost an
  * extra corpus pass per round for nothing).
  */
object LinkGraph {

  /** Fixed-point scale: initial rank per node, in parts per billion. */
  val Scale = 1000000000L

  /** Hard iteration bound — each round is a full edge-table join. */
  val MaxIterations = 100

  /** PageRank over a directed edge list. Input columns are cast to
    * long; null endpoints are dropped and duplicate edges collapse to
    * one (a page linking twice votes once, the convention of the
    * published domain rankings). Self-loops are honored if present —
    * filter them upstream if unwanted. Dangling (sink) mass is
    * redistributed uniformly, the classic formulation.
    *
    * Returns `(node: long, rank_ppb: long)` for every node that
    * appears as source or destination, after exactly `iterations`
    * rounds of
    * `r'(v) = base + damp · (Σ_{u→v} r(u) div outdeg(u) + dsum div N)`
    * with `base = Scale·(dampDen−dampNum) div dampDen` and
    * `damp·x = x div dampDen · dampNum + (x mod dampDen)·dampNum div dampDen`.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1 && iterations <= MaxIterations,
      s"pagerank: iterations=$iterations outside [1, $MaxIterations]")
    require(dampNum > 0 && dampNum < dampDen && dampDen <= 1000,
      s"pagerank: damping $dampNum/$dampDen must satisfy 0 < num < den <= 1000")

    val e = graft.SparkUtil.materialize(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge table pre-joined with outdeg, reused every round
    val eDeg = graft.SparkUtil.materialize(
      e.join(deg, "src").select(col("src"), col("dst"), col("deg")))
    val nodes = graft.SparkUtil.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    // sinks: nodes with no outgoing edge — their mass redistributes
    val sinks = graft.SparkUtil.materialize(
      nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"))
    val n = nodes.count()
    require(n > 0, "pagerank: empty graph")

    val base = Scale * (dampDen - dampNum) / dampDen
    // damp·x over column "_x", in overflow-safe integer split form
    val damped: Column =
      lit(base) +
        expr(s"_x div ${dampDen}L") * lit(dampNum) +
        expr(s"((_x % ${dampDen}L) * ${dampNum}L) div ${dampDen}L")

    var ranks = graft.SparkUtil.materialize(
      nodes.withColumn("rank_ppb", lit(Scale)))
    for (_ <- 1 to iterations) {
      val dsum = ranks.join(sinks, "node")
        .agg(coalesce(sum("rank_ppb"), lit(0L))).head().getLong(0)
      val dShare = dsum / n
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(eDeg("dst").as("node"),
          expr("rank_ppb div deg").as("share"))
        .groupBy("node").agg(sum("share").as("inc"))
      ranks = graft.SparkUtil.materialize(
        nodes.join(contribs, Seq("node"), "left")
          .withColumn("_x", coalesce(col("inc"), lit(0L)) + lit(dShare))
          .select(col("node"), damped.as("rank_ppb")))
    }
    ranks
  }

  /** Href extraction for building the edge list from raw pages: every
    * `<a href="...">` target in `htmlCol`, as one exploded row per
    * link. Pure codegen'd SQL functions (regexp_extract_all), no UDF.
    * Relative links (no scheme/host) are dropped — domain-level edges
    * can't use them. */
  def extractHrefs(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(coalesce(col(htmlCol), lit("")),
          lit("""(?i)<a[^>]*\shref\s*=\s*["']([^"'>]+)["']"""),
          lit(1))).as("href"))
      .filter(col("href").rlike("(?i)^https?://"))

  /** Domain-level edge list: source-page domain → linked domain, via
    * the full-PSL registrable-domain mapping (graft.text.DomainOf).
    * Self-edges (intra-domain navigation) are dropped — they carry no
    * authority signal and dominate raw link counts. */
  def domainEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val regUdf = udf((u: String) => graft.text.DomainOf.registrable(u))
    extractHrefs(df.select(col(urlCol), col(htmlCol)), urlCol, htmlCol)
      .select(regUdf(col(urlCol)).as("src_domain"),
        regUdf(col("href")).as("dst_domain"))
      .filter(col("src_domain") =!= col("dst_domain"))
      .filter(length(col("src_domain")) > 0 && length(col("dst_domain")) > 0)
  }
}
