package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Link-graph PageRank benchmark main: integer-exact PageRank
  * (analytics.LinkGraph) over a deterministic, heavily in-degree-skewed
  * synthetic domain graph at the million-node scale, printing ONE JSON
  * line. Complements LinkGraphSpec's small-graph bit-parity pins with a
  * record at a scale where the per-iteration join/agg economics and the
  * skew behavior actually show (BENCH.md "PageRank at 1M domains").
  *
  * Graph synthesis is pure column arithmetic (xxhash64 + modulo — no
  * JVM PRNG state, reproducible anywhere): src uniform, dst drawn as
  * `h1 mod (h2 mod N + 1)`, i.e. uniform in [0, m) for a uniform m —
  * giving P(dst = d) ≈ ln(N/d)/N, a log-skewed in-degree with node 0
  * the hottest hub, the shape real domain graphs have (a few hubs
  * absorb most links).
  *
  * Args (optional): nNodes nEdges iterations
  * Defaults: 1,000,000 nodes, 10,000,000 edge draws, 5 iterations.
  */
object GraphBench {

  def main(args: Array[String]): Unit = {
    val nNodes = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val nEdges = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val iters = args.lift(2).map(_.toInt).getOrElse(5)

    val spark = SparkSession.builder()
      .appName("graft-graph-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def wall[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val (buildSec, edges) = wall {
      val e = spark.range(nEdges)
        .select(
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
          pmod(xxhash64(col("id"), lit(2)),
            pmod(xxhash64(col("id"), lit(3)), lit(nNodes)) + lit(1L))
            .as("dst"))
      val m = graft.SparkUtil.materialize(e)
      m.count()
      m
    }
    val nDistinct = edges.distinct().count()

    val (prSec, ranks) = wall {
      val r = graft.analytics.LinkGraph.pagerank(
        edges, "src", "dst", iterations = iters)
      r.count()
      r
    }

    // hub concentration + mass ledger: evidence the skew was real and
    // the integer recurrence conserved mass up to floor loss
    val total = ranks.agg(sum("rank_ppb")).head().getLong(0)
    val top = ranks.orderBy(col("rank_ppb").desc).limit(1).head()
    val n = ranks.count()
    val massRetained = total.toDouble / (n * graft.analytics.LinkGraph.Scale)

    println(
      f"""{"metric":"pagerank_1m","n_nodes":$n,"n_edge_draws":$nEdges,"n_edges_distinct":$nDistinct,"iterations":$iters,"edge_build_sec":$buildSec%.3f,"pagerank_sec":$prSec%.3f,"sec_per_iteration":${prSec / iters}%.3f,"top_node":${top.getLong(0)},"top_rank_ppb":${top.getLong(1)},"top_share":${top.getLong(1).toDouble / total}%.6f,"mass_retained":$massRetained%.6f}""")
    spark.stop()
  }
}
