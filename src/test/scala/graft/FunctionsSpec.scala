package graft

import graft.functions.RollingMinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import TestSession._

  test("RollingMinHash.minHash is deterministic and content-sensitive") {
    val a = RollingMinHash.minHash("hello world, this is a doc".getBytes, 16)
    val b = RollingMinHash.minHash("hello world, this is a doc".getBytes, 16)
    val c = RollingMinHash.minHash("completely different content here".getBytes, 16)
    assert(a == b)
    assert(a != c)
  }

  test("short strings hash their full contents") {
    assert(RollingMinHash.minHash("ab".getBytes, 16) ==
      RollingMinHash.minHash("ab".getBytes, 16))
    assert(RollingMinHash.minHash(Array.empty[Byte], 16) == 0L)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs", "").toDF("s")
    val viaExpr = df.select(graft.functions.functions.rolling_min_hash(col("s"), 16))
      .collect().map(_.getLong(0))
    val direct = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs", "")
      .map(s => RollingMinHash.minHash(s.getBytes("UTF-8"), 16))
    assert(viaExpr.toSeq == direct)
  }

  test("dot_product is bit-identical to the HOF fold and stays codegen'd") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40)((Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.functions.dot_product(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    // the interpreted HOF twin: identical i-ascending left fold
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).collect()
      .map(_.getDouble(0))
    assert(got.toSeq == hof.toSeq, "codegen'd dot diverged from HOF fold")
    // unequal lengths fold over the common prefix; null array -> null
    val edge = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0)))
      .toDF("a", "b")
      .select(graft.functions.functions.dot_product(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(edge == 50.0)
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(graft.functions.functions.dot_product(col("a"), col("b")))
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("JpegDims walks variable-length segment chains; rejects non-JPEG") {
    import graft.functions.JpegDims
    // minimal JPEG: SOI, APP0 (len 16), SOF0 h=7 w=9, EOI
    def jpeg(extraCom: Int): Array[Byte] = {
      val com = if (extraCom > 0)
        Array(0xff, 0xfe, 0, 2 + extraCom).map(_.toByte) ++
          Array.fill(extraCom)('x'.toByte)
      else Array.empty[Byte]
      Array(0xff, 0xd8, 0xff, 0xe0, 0, 16).map(_.toByte) ++
        Array.fill(14)(0.toByte) ++ com ++
        Array(0xff, 0xc0, 0, 11, 8, 0, 7, 0, 9, 1, 1, 0x11, 0).map(_.toByte) ++
        Array(0xff, 0xd9).map(_.toByte)
    }
    for (pad <- Seq(0, 1, 5, 200)) {
      val d = JpegDims.dims(jpeg(pad))
      assert((d >> 32) == 9L && (d & 0xffffffffL) == 7L,
        s"pad=$pad gave ${d >> 32}x${d & 0xffffffffL}")
    }
    assert(JpegDims.dims("not a jpeg".getBytes) == -1L)
    assert(JpegDims.dims(Array[Byte]()) == -1L)
    // EOI before any SOF
    assert(JpegDims.dims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == -1L)
    // truncated mid-segment: must not throw
    assert(JpegDims.dims(Array(0xff, 0xd8, 0xff, 0xe0, 0, 16, 0).map(_.toByte)) == -1L)
  }

  test("JpegDims codegen and interpreted paths agree") {
    import spark.implicits._
    val blobs = Seq(1L, 2L, 3L).map(i =>
      Array(0xff, 0xd8, 0xff, 0xc0, 0, 11, 8, 0, i.toInt, 0, i.toInt + 1,
        1, 1, 0x11, 0, 0xff, 0xd9).map(_.toByte))
    val viaExpr = blobs.toDF("b")
      .select(graft.functions.functions.jpeg_dims(col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == blobs.map(graft.functions.JpegDims.dims))
  }

  test("Mp4Meta walks nested boxes; handles largesize/to-EOF; rejects malformed") {
    import graft.functions.Mp4Meta
    import java.nio.ByteBuffer

    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def mvhd(ts: Int, dur: Long, v1: Boolean): Array[Byte] = {
      val b = ByteBuffer.allocate(if (v1) 112 else 100)
      if (v1) b.putInt(0x01000000).putLong(0L).putLong(0L).putInt(ts).putLong(dur)
      else b.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur.toInt)
      // tail (rate/volume/reserved/matrix/...) left zeroed
      b.array()
    }
    val ftyp = box("ftyp", "isomAAAA".getBytes("US-ASCII"))
    def cat(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray

    // nominal v0 and v1, mvhd behind a filler child, moov behind mdat
    for (v1 <- Seq(false, true)) {
      val f = cat(ftyp, box("mdat", Array.fill[Byte](13)(7)),
        box("moov", cat(box("udta", Array.fill[Byte](5)(1)),
          box("mvhd", mvhd(1000, 777L, v1)))))
      assert(Mp4Meta.meta(f) == (1000L << 32 | 777L), s"v1=$v1")
    }
    // size==1 largesize form on the mdat hop
    val large = {
      val payload = Array.fill[Byte](9)(3)
      val b = ByteBuffer.allocate(16 + payload.length)
      b.putInt(1).put("mdat".getBytes("US-ASCII"))
        .putLong(16L + payload.length).put(payload)
      cat(ftyp, b.array(),
        box("moov", box("mvhd", mvhd(600, 42L, v1 = false))))
    }
    assert(Mp4Meta.meta(large) == (600L << 32 | 42L))
    // size==0 (to-EOF) moov as the LAST box
    val toEof = {
      val inner = box("mvhd", mvhd(90000, 5L, v1 = false))
      val b = ByteBuffer.allocate(8 + inner.length)
      b.putInt(0).put("moov".getBytes("US-ASCII")).put(inner)
      cat(ftyp, b.array())
    }
    assert(Mp4Meta.meta(toEof) == (90000L << 32 | 5L))
    // rejections: non-MP4, empty, no moov, no mvhd, zero timescale,
    // box size overrunning the buffer, truncated mvhd
    assert(Mp4Meta.meta("RIFFxxxxWAVE".getBytes) == -1L)
    assert(Mp4Meta.meta(Array[Byte]()) == -1L)
    assert(Mp4Meta.meta(cat(ftyp, box("mdat", Array[Byte](1, 2)))) == -1L)
    assert(Mp4Meta.meta(cat(ftyp, box("moov", box("udta", Array[Byte]())))) == -1L)
    assert(Mp4Meta.meta(cat(ftyp,
      box("moov", box("mvhd", mvhd(0, 7L, v1 = false))))) == -1L)
    val overrun = cat(ftyp, Array[Byte](0, 0, 1, 0) ++ "mdat".getBytes)
    assert(Mp4Meta.meta(overrun) == -1L)
    assert(Mp4Meta.meta(cat(ftyp,
      box("moov", box("mvhd", Array.fill[Byte](10)(0))))) == -1L)
  }

  test("Mp4Meta codegen and interpreted paths agree") {
    import spark.implicits._
    import java.nio.ByteBuffer
    def mk(ts: Int, dur: Int): Array[Byte] = {
      val mv = ByteBuffer.allocate(108)
      mv.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      val ftyp = ByteBuffer.allocate(16)
      ftyp.putInt(16).put("ftyp".getBytes("US-ASCII")).putInt(0).putInt(0)
      val moov = ByteBuffer.allocate(8 + 108)
      moov.putInt(8 + 108).put("moov".getBytes("US-ASCII")).put(mv.array())
      ftyp.array() ++ moov.array()
    }
    val blobs = Seq(mk(600, 60), mk(1000, 123), "junk".getBytes)
    val viaExpr = blobs.toDF("b")
      .select(graft.functions.functions.mp4_meta(col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == blobs.map(graft.functions.Mp4Meta.meta))
  }

  test("word winnowing guarantee: a shared 13-word run co-selects a fingerprint") {
    import graft.functions.Winnowing
    val G = Winnowing.WordGram + Winnowing.WordBlock - 1 // 13
    val rnd = new scala.util.Random(7)
    def vocabWord() = "w" + rnd.nextInt(5000)
    // 50 trials: plant one G-word run inside two otherwise-unrelated texts
    for (trial <- 0 until 50) {
      val span = Array.fill(G)(vocabWord())
      val a = Array.fill(rnd.nextInt(80) + 20)(vocabWord()) ++ span ++
        Array.fill(rnd.nextInt(80) + 20)(vocabWord())
      val b = Array.fill(rnd.nextInt(80) + 20)(vocabWord()) ++ span ++
        Array.fill(rnd.nextInt(80) + 20)(vocabWord())
      val fa = Winnowing.wordFingerprints(a).map(_._1).toSet
      val fb = Winnowing.wordFingerprints(b).map(_._1).toSet
      assert((fa & fb).nonEmpty, s"trial $trial: planted $G-word run missed")
    }
  }

  test("word winnowing selection positions are invariant under per-word salting") {
    // the 100×-corpus scale property: salting every word (a bijection
    // on the word alphabet) must not move which POSITIONS are selected
    // beyond hash relabeling — so dup-pair structure scales exactly
    // linearly when a corpus is replicated with per-copy word salts.
    // Positions can differ only when the salt permutes window-min
    // ARGMINS; assert the per-copy PAIR structure instead: two docs
    // sharing a planted run still co-select after salting.
    import graft.functions.Winnowing
    val G = Winnowing.WordGram + Winnowing.WordBlock - 1
    val rnd = new scala.util.Random(11)
    def vocabWord() = "w" + rnd.nextInt(5000)
    val span = Array.fill(G)(vocabWord())
    val a = Array.fill(40)(vocabWord()) ++ span ++ Array.fill(40)(vocabWord())
    val b = Array.fill(40)(vocabWord()) ++ span ++ Array.fill(40)(vocabWord())
    for (salt <- 1 to 20) {
      val sa = a.map(_ + "⁅" + salt + "⁆")
      val sb = b.map(_ + "⁅" + salt + "⁆")
      val fa = Winnowing.wordFingerprints(sa).map(_._1).toSet
      val fb = Winnowing.wordFingerprints(sb).map(_._1).toSet
      assert((fa & fb).nonEmpty, s"salt $salt: shared run lost under salting")
      // cross-copy grams must be fully disjoint (different salt)
      val fa2 = Winnowing.wordFingerprints(a.map(_ + "⁅0⁆")).map(_._1).toSet
      assert((fa & fa2).isEmpty, s"salt $salt: cross-salt fingerprints collide")
    }
  }

  test("shared k-grams give shared min-hash for near-identical docs") {
    val base = "word " * 200
    val fp1 = RollingMinHash.minHash((base + "tail one").getBytes, 16)
    val fp2 = RollingMinHash.minHash((base + "tail two").getBytes, 16)
    // the minimum window almost surely falls in the long shared prefix
    assert(fp1 == fp2)
  }

  test("MisraGriesAgg: every item above n/k survives any merge order") {
    val k = 8
    // skewed stream: item "h0" 500×, "h1" 250×, ... long tail of
    // singletons; n = 500+250+125+62 + 1000 = 1937, n/k ≈ 242 →
    // h0 and h1 MUST survive every partitioning
    val heavy = Seq("h0" -> 500, "h1" -> 250, "h2" -> 125, "h3" -> 62)
    val stream = heavy.flatMap { case (t, c) => Seq.fill(c)(t) } ++
      (0 until 1000).map(i => s"tail$i")
    val n = stream.length
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val shuffled = rnd.shuffle(stream)
      val nParts = 1 + trial * 3
      val agg = new graft.functions.MisraGriesAgg(k)
      val partials = shuffled.grouped(math.max(1, n / nParts)).map(part =>
        part.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = partials.reduce(agg.merge)
      assert(merged.size <= k)
      val thr = n / k
      for ((t, c) <- heavy if c > thr)
        assert(merged.contains(t), s"$t (count $c > n/k=$thr) evicted, trial $trial")
      // undercount bound: estimate within n/k of truth for present items
      for ((t, c) <- heavy if merged.contains(t))
        assert(merged(t) <= c && merged(t) >= c - thr)
    }
  }
}
