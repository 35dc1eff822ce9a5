package graft.analytics

import org.apache.spark.sql.functions._

class PerceptualHashSpec extends graft.SparkSpec {
  import spark.implicits._

  test("areaResize: exact box averages on integer ratios") {
    // 4x2 -> 2x1: each output cell averages a 2x2 block
    val g = Array[Double](1, 2, 3, 4,
                          5, 6, 7, 8)
    val out = PerceptualHash.areaResize(g, 4, 2, 2, 1)
    assert(out.toSeq == Seq((1 + 2 + 5 + 6) / 4.0, (3 + 4 + 7 + 8) / 4.0))
  }

  test("areaResize: fractional source rectangles weight by overlap") {
    // 3x1 -> 2x1: out(0) covers [0, 1.5) = cell0 + half cell1
    val out = PerceptualHash.areaResize(Array[Double](0, 6, 12), 3, 1, 2, 1)
    assert(math.abs(out(0) - (0 * 1.0 + 6 * 0.5) / 1.5) < 1e-12)
    assert(math.abs(out(1) - (6 * 0.5 + 12 * 1.0) / 1.5) < 1e-12)
  }

  test("areaResize: identity when dims match; average preserved") {
    val rnd = new scala.util.Random(7)
    val g = Array.fill(16 * 16)(rnd.nextDouble())
    assert(PerceptualHash.areaResize(g, 16, 16, 16, 16).toSeq == g.toSeq)
    // total area-weighted mean is invariant under box reduction
    val down = PerceptualHash.areaResize(g, 16, 16, 8, 8)
    assert(math.abs(down.sum / 64 - g.sum / 256) < 1e-9)
  }

  test("dhash64: bit semantics on a hand-built grid") {
    // each row strictly increasing: bits 0..6 of each row set (g(c) <
    // g(c+1)), bit 7 clear (last cell >= first, cyclic) -> 0x7f per row
    val inc = Array.tabulate(64)(i => (i % 8).toDouble)
    assert(PerceptualHash.dhash64(inc) == 0x7f7f7f7f7f7f7f7fL)
    // flat grid: strict '<' never fires
    assert(PerceptualHash.dhash64(Array.fill(64)(0.5)) == 0L)
    // bit 63 reachable: row 7 cell 7 < row 7 cell 0
    val g = Array.fill(64)(1.0); g(63) = 0.0
    assert((PerceptualHash.dhash64(g) & (1L << 63)) != 0L)
  }

  test("dhashColumn == dhash64 on random grids (incl. float input)") {
    val rnd = new scala.util.Random(42)
    val grids = Seq.fill(50)(Array.fill(64)(rnd.nextFloat()))
    val viaCol = grids.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "vec")
      .select(col("id"), PerceptualHash.dhashColumn(col("vec")).as("sig"))
      .as[(Long, Long)].collect().toMap
    grids.zipWithIndex.foreach { case (g, i) =>
      assert(viaCol(i.toLong) ==
        PerceptualHash.dhash64(g.map(_.toDouble)),
        s"Column/JVM kernel drift at grid $i")
    }
  }

  test("decodeGrayStub: deterministic, locality-preserving, total") {
    val rnd = new scala.util.Random(11)
    val bytes = Array.fill(256)(rnd.nextInt().toByte)
    val a = PerceptualHash.decodeGrayStub(bytes)
    assert(a.toSeq == PerceptualHash.decodeGrayStub(bytes).toSeq)
    assert(PerceptualHash.decodeGrayStub(null).forall(_ == 0.0))
    assert(PerceptualHash.decodeGrayStub(Array.emptyByteArray).length == 32 * 32)
    // a single flipped byte feeds 4 of 1024 grid cells -> at most 2 of
    // the 64 resized cells move -> at most 4 hash bits can differ
    val mutated = bytes.clone(); mutated(100) = (mutated(100) ^ 0x7f).toByte
    val h1 = PerceptualHash.dhashOfGray(a, 32, 32)
    val h2 = PerceptualHash.dhashOfGray(
      PerceptualHash.decodeGrayStub(mutated), 32, 32)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4)
  }

  test("decodeGrayStub: payloads past the Int-multiply overflow point") {
    // 3 MB payload: i * b.length overflows Int at i ~ 716 — the index
    // went negative and threw AIOOBE before the long-arithmetic fix
    val big = new Array[Byte](3 * 1024 * 1024)
    java.util.Arrays.fill(big, 0x2A.toByte)
    val g = PerceptualHash.decodeGrayStub(big)
    assert(g.length == 32 * 32 && g.forall(_ == (0x2A & 0xFF) / 255.0))
  }

  test("imageDhash stamps the stub+kernel hash; identical bytes agree") {
    val rnd = new scala.util.Random(3)
    val payload = Array.fill(512)(rnd.nextInt().toByte)
    val df = Seq((1L, payload), (2L, payload.clone()),
      (3L, Array.fill(512)(rnd.nextInt().toByte))).toDF("id", "img")
    val hs = PerceptualHash.imageDhash(df, "img")
      .select("id", "dhash").as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(3L))
  }

  test("nearDups: planted near-pairs found (pigeonhole), strangers absent") {
    val rnd = new scala.util.Random(123)
    val base = Seq.fill(30)(Array.fill(64)(rnd.nextDouble()))
    // each planted twin flips EXACTLY one comparison: raise cell 0 of a
    // doc whose cells 0,1,7 order is known
    val rows = base.zipWithIndex.flatMap { case (g, i) =>
      val twin = g.clone()
      // drop cell 9 below every other value: only the two comparisons
      // reading it (bits 8 and 9) can flip -> hamming <= 2 by
      // construction, inside the pigeonhole-guaranteed radius
      twin(9) = -1.0
      Seq((i.toLong, g.map(_.toFloat)),
        ((i + 1000).toLong, twin.map(_.toFloat)))
    }
    val pairs = PerceptualHash.nearDups(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // every planted twin pair must surface (hamming <= 3 is pigeonhole-
    // guaranteed by the 4x16 banding)
    (0 until 30).foreach { i =>
      assert(pairSet.contains((i.toLong, (i + 1000).toLong)),
        s"planted twin $i missing")
    }
    // independent random grids essentially never land within hamming 3
    // (64 random bits; seeded rng makes this deterministic)
    assert(pairs.forall(p => p._2 - p._1 == 1000L),
      s"stranger pair leaked: ${pairs.filter(p => p._2 - p._1 != 1000L).toSeq}")
  }

  test("markAgainst: planted reference leaks flagged, strangers clean") {
    val rnd = new scala.util.Random(77)
    val corpus = Seq.fill(40)(Array.fill(64)(rnd.nextDouble()))
    // reference = twins of corpus grids 0..9 (one comparison nudged,
    // hamming <= 2) + 20 unrelated grids
    val refGrids = corpus.take(10).map { g =>
      val t = g.clone(); t(9) = -1.0; t
    } ++ Seq.fill(20)(Array.fill(64)(rnd.nextDouble()))
    val corpusDf = corpus.zipWithIndex
      .map { case (g, i) => (i.toLong, g.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val refSigs = PerceptualHash.dhashSigs(
      refGrids.zipWithIndex
        .map { case (g, i) => ((i + 5000).toLong, g.map(_.toFloat)) }
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val out = PerceptualHash.markAgainst(
      corpusDf, "vec_id", "embedding", refSigs, maxHamming = 3)
      .select("vec_id", "is_phash_dup", "phash_hamming")
      .as[(Long, Boolean, Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 40, "every corpus row keeps exactly one verdict")
    (0 until 10).foreach { i =>
      assert(out(i.toLong)._1 && out(i.toLong)._2.exists(_ <= 3),
        s"planted leak $i not flagged: ${out(i.toLong)}")
    }
    (10 until 40).foreach { i =>
      assert(!out(i.toLong)._1 && out(i.toLong)._2.isEmpty,
        s"stranger $i wrongly flagged")
    }
  }

  test("nearDups: fully-salted run emits the identical pair set") {
    val rnd = new scala.util.Random(9)
    val df = Seq.fill(80)(Array.fill(64)(rnd.nextFloat()))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("vec_id", "embedding")
    def run(salt: Int, hot: Long) = PerceptualHash.nearDups(
      df, "vec_id", "embedding", maxHamming = 30,
      saltBuckets = salt, hotKeyThreshold = hot)
      .as[(Long, Long, Int)].collect().toSet
    assert(run(1, Long.MaxValue) == run(8, 0L))
  }
}
