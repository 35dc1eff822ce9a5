package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integer-exact PageRank (analytics.LinkGraph): parity against a
  * driver-side reference implementation of the same fixed-point
  * recurrence, known-graph structure pins, mass accounting, dangling
  * redistribution, partitioning bit-identity, href/domain edge
  * extraction, and the loud guards. Full-table expression parity is
  * the q_pagerank DuckDB oracle's job.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** driver-side reference: same integer recurrence, scala Maps */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, o) => s -> o.size.toLong }
    val n = nodes.size.toLong
    val base = LinkGraph.Scale * (den - num) / den
    def damp(x: Long) = base + x / den * num + x % den * num / den
    var r = nodes.map(_ -> LinkGraph.Scale).toMap
    for (_ <- 1 to iters) {
      val dsum = nodes.filterNot(deg.contains).map(r).sum
      val dShare = dsum / n
      val inc = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v => v -> damp(inc.getOrElse(v, 0L) + dShare)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 4): Map[Long, Long] =
    LinkGraph.pagerank(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the driver reference bit-for-bit on a mixed graph") {
    // hub-and-spoke + chain + a dangling sink + a duplicate edge
    val edges = Seq(1L -> 2L, 3L -> 2L, 4L -> 2L, 2L -> 5L, 5L -> 6L,
      1L -> 5L, 3L -> 2L)
    for (iters <- Seq(1, 3, 10))
      assert(run(edges, iters) == naive(edges, iters),
        s"mismatch at $iters iterations")
  }

  test("structure: the all-cited hub outranks spokes; symmetric cycle ties") {
    val star = Seq(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L)
    val r = run(star, 5)
    assert(r(9L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
    val cycle = run(Seq(1L -> 2L, 2L -> 1L), 7)
    assert(cycle(1L) == cycle(2L))
    // a 2-cycle conserves mass exactly (deg 1, no floor loss):
    assert(cycle(1L) == LinkGraph.Scale)
  }

  test("mass accounting: total rank stays within floor-loss of N·Scale") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 4L -> 1L)
    val r = run(edges, 10)
    val total = r.values.sum
    val n = r.size
    // every division may drop < its divisor in ppb; 10 rounds, small graph
    assert(total <= n * LinkGraph.Scale)
    assert(total > n * LinkGraph.Scale - 10L * n * 100)
  }

  test("dangling mass redistributes: sink feeds disconnected nodes") {
    // 2 -> sink 3; node 1 has no in-edges except the dangling share
    val edges = Seq(1L -> 3L, 2L -> 3L)
    val r = run(edges, 3)
    val base = LinkGraph.Scale * 15 / 100
    // without redistribution nodes 1,2 would pin at base; with it they
    // sit strictly above
    assert(r(1L) > base && r(2L) > base)
    assert(r(1L) == r(2L))
  }

  test("bit-identical across partitionings") {
    val edges = (1L to 40L).map(i => i -> (i * 7 % 41))
    assert(run(edges, 6, parts = 1) == run(edges, 6, parts = 13))
  }

  test("loud guards: iteration bounds, damping sanity, empty graph") {
    val df = Seq(1L -> 2L).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      LinkGraph.pagerank(df, "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pagerank(df, "src", "dst",
        iterations = LinkGraph.MaxIterations + 1)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pagerank(df, "src", "dst", dampNum = 100, dampDen = 100)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pagerank(df.limit(0), "src", "dst")
    }
  }

  test("extractHrefs + domainEdges: absolute links only, PSL domains, no self-edges") {
    val pages = Seq(
      ("https://news.example.co.uk/a",
        """<p>x</p><a href="https://blog.other.com/p">t</a>
          |<A HREF='http://news.example.co.uk/b'>self</A>
          |<a href="/relative">rel</a>
          |<a class="x" href="https://sub.other.com/q">t2</a>""".stripMargin),
      ("https://solo.org/", "<div>no links</div>"),
      ("https://nul.org/", null.asInstanceOf[String]))
      .toDF("url", "html")
    val hrefs = LinkGraph.extractHrefs(pages, "url", "html")
      .collect().map(_.getString(1)).sorted
    assert(hrefs.toSeq == Seq("http://news.example.co.uk/b",
      "https://blog.other.com/p", "https://sub.other.com/q"))
    val edges = LinkGraph.domainEdges(pages, "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // self-edge (news.example.co.uk -> example.co.uk? no: both map to
    // example.co.uk under the PSL and are dropped); subdomains collapse
    assert(edges == Set("example.co.uk" -> "other.com"))
  }
}
