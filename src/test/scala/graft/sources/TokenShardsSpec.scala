package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Binary token-shard sink (sources.TokenShards): round-trip equality
  * for both dtypes, byte-level determinism across runs and
  * partitionings, manifest accounting, loud range/dtype/null guards,
  * and empty-input/empty-dir behavior.
  */
class TokenShardsSpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("tokshards").toString

  private val seqs: Seq[(Long, Seq[Int])] =
    (1L to 97L).map(i => i -> (0 until (i % 7).toInt + 1)
      .map(j => ((i * 31 + j * 17) % 5000).toInt))

  test("u16 round-trip: every sequence and token survives byte-exactly") {
    val out = dir()
    val stats = TokenShards.write(seqs.toDF("seq_id", "tokens")
      .repartition(5), "seq_id", "tokens", out, "u16", numShards = 8)
    assert(stats.map(_.sequences).sum == 97L)
    assert(stats.map(_.tokens).sum == seqs.map(_._2.size).sum.toLong)
    val back = TokenShards.read(spark, out).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(back == seqs.toMap)
  }

  test("u32 round-trip carries tokens beyond the u16 range") {
    val out = dir()
    val big = Seq(1L -> Seq(70000, 0, 2147483647), 2L -> Seq.empty[Int])
    TokenShards.write(big.toDF("seq_id", "tokens"),
      "seq_id", "tokens", out, "u32", numShards = 2)
    val back = TokenShards.read(spark, out).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(back == big.toMap)
  }

  test("byte-identical shards across runs and input partitionings") {
    val (a, b) = (dir(), dir())
    TokenShards.write(seqs.toDF("seq_id", "tokens").repartition(3),
      "seq_id", "tokens", a, "u16", numShards = 4)
    TokenShards.write(seqs.toDF("seq_id", "tokens").repartition(11),
      "seq_id", "tokens", b, "u16", numShards = 4)
    val fa = Files.list(Paths.get(a)).toArray.map(_.toString).sorted
    val fb = Files.list(Paths.get(b)).toArray.map(_.toString).sorted
    assert(fa.map(f => f.split('/').last).sameElements(
      fb.map(f => f.split('/').last)))
    fa.zip(fb).foreach { case (pa, pb) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(pa)), Files.readAllBytes(Paths.get(pb))),
        s"shard bytes differ: $pa")
    }
  }

  test("manifest accounts for the corpus; shard files are content-keyed") {
    val out = dir()
    val stats = TokenShards.write(seqs.toDF("seq_id", "tokens"),
      "seq_id", "tokens", out, "u16", numShards = 4)
    val man = new String(
      Files.readAllBytes(Paths.get(s"$out/_manifest.json")), "UTF-8")
    assert(man.contains(""""dtype":"u16"""") &&
      man.contains(""""sequences":97""") &&
      man.contains(s""""tokens":${seqs.map(_._2.size).sum}"""))
    // shard ids in stats match the files on disk
    val onDisk = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".bin"))
      .map(f => f.split('/').last.stripPrefix("part-").stripSuffix(".bin").toLong)
      .sorted.toSeq
    assert(stats.map(_.shard) == onDisk)
  }

  test("loud guards: u16 overflow, negative token, null array, bad dtype/shards") {
    val out = dir()
    val df = Seq(1L -> Seq(70000)).toDF("seq_id", "tokens")
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.write(df, "seq_id", "tokens", out, "u16", 2)
    }
    assert(e.getMessage.contains("exceeds u16 range") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds u16 range")))
    intercept[org.apache.spark.SparkException] {
      TokenShards.write(Seq(1L -> Seq(-1)).toDF("seq_id", "tokens"),
        "seq_id", "tokens", dir(), "u32", 2)
    }
    intercept[org.apache.spark.SparkException] {
      TokenShards.write(
        Seq((1L, null.asInstanceOf[Seq[Int]])).toDF("seq_id", "tokens"),
        "seq_id", "tokens", dir(), "u16", 2)
    }
    intercept[IllegalArgumentException] {
      TokenShards.write(df, "seq_id", "tokens", dir(), "u8", 2)
    }
    intercept[IllegalArgumentException] {
      TokenShards.write(df, "seq_id", "tokens", dir(), "u16", 0)
    }
  }

  test("ordered mode: streaming shards in file order replays the exact " +
      "position permutation") {
    val out = dir()
    // token payload = the position itself, so the bin bytes ARE the order
    val n = 100L
    val rows = (1L to n).map(i => (i * 7919 % 65521, Seq(i.toInt), i))
    val stats = TokenShards.write(
      rows.toDF("seq_id", "tokens", "pos").repartition(9),
      "seq_id", "tokens", out, "u16", numShards = 7,
      orderCol = Some("pos"))
    // ±1-balanced: exact integer ranges over a gapless permutation
    assert(stats.map(_.sequences).sum == n)
    assert(stats.map(_.sequences).max - stats.map(_.sequences).min <= 1)
    // parse every .bin little-endian in shard order: the concatenated
    // u16 stream must be exactly 1..n — training order with no
    // trainer-side sort
    val played = stats.map(_.shard).sorted.flatMap { s =>
      val bytes = Files.readAllBytes(Paths.get(s"$out/part-$s.bin"))
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until bytes.length / 2).map(_ => bb.getShort.toInt & 0xffff)
    }
    assert(played == (1L to n).map(_.toInt))
    val man = new String(
      Files.readAllBytes(Paths.get(s"$out/_manifest.json")), "UTF-8")
    assert(man.contains(""""ordered":true"""))
    // byte-identical across runs and input partitionings, like the
    // hash mode (boundaries are integer arithmetic, never sampled)
    val out2 = dir()
    TokenShards.write(rows.toDF("seq_id", "tokens", "pos").repartition(3),
      "seq_id", "tokens", out2, "u16", numShards = 7,
      orderCol = Some("pos"))
    stats.map(_.shard).foreach { s =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$out/part-$s.bin")),
        Files.readAllBytes(Paths.get(s"$out2/part-$s.bin"))))
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$out/part-$s.idx")),
        Files.readAllBytes(Paths.get(s"$out2/part-$s.idx"))))
    }
    // a gapped position column dies loudly before any file is cut
    val e = intercept[IllegalArgumentException] {
      TokenShards.write(
        Seq((1L, Seq(1), 1L), (2L, Seq(2), 3L)).toDF("seq_id", "tokens", "pos"),
        "seq_id", "tokens", dir(), "u16", 2, orderCol = Some("pos"))
    }
    assert(e.getMessage.contains("gapless"))
  }

  test("empty input writes an empty manifest; reading an empty dir is empty") {
    val out = dir()
    val stats = TokenShards.write(
      Seq.empty[(Long, Seq[Int])].toDF("seq_id", "tokens"),
      "seq_id", "tokens", out, "u16", 4)
    assert(stats.isEmpty)
    assert(TokenShards.read(spark, out).count() == 0L)
    assert(TokenShards.read(spark, dir()).count() == 0L)
  }
}
