package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The non-oracle multimodal op (byte entropy) is validated by
  * independent driver-side recomputation over the raw blobs. */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("byte entropy matches an independent recomputation") {
    val got = MultimodalOps.byteEntropy(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val raw = Engine.table(spark, sf, "documents")
      .selectExpr("doc_id", "cast(text as binary)").limit(50)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(raw.nonEmpty)
    raw.foreach { case (id, blob) =>
      val counts = blob.groupBy(_ & 0xff).view.mapValues(_.length.toDouble)
      val n = blob.length.toDouble
      val h = -counts.values.map(c => (c / n) * math.log(c / n)).sum / math.log(2)
      val (len, ent) = got(id)
      assert(len == blob.length)
      assert(math.abs(ent - h) < 1e-9, s"doc $id entropy $ent vs $h")
    }
  }

  test("type sniffing classifies the corpus (plain text → unknown)") {
    val sniffed = MultimodalOps.sniffType(spark, sf).collect()
    assert(sniffed.nonEmpty)
    assert(sniffed.forall(_.getString(1) == "unknown"))
  }

  test("FLAC parse splits the 36-bit sample count across the 32-bit boundary") {
    val rows = MultimodalOps.flacMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "flac", s"doc $id fmt")
      assert(r.getLong(3) == 1 + id % 8, s"doc $id channels")
      assert(r.getLong(4) == 16 + 8 * (id % 2), s"doc $id bits")
      assert(r.getLong(5) == 1000L + (id * 10000019L) % (1L << 34),
        s"doc $id n_samples")
    }
    // the high nibble (bits 35-32) must actually be nonzero somewhere,
    // or the cross-word split was never exercised
    assert(rows.exists(_.getLong(5) > (1L << 32)),
      "corpus planted no sample count above 2^32")
  }

  test("MP3 parse decodes multi-byte syncsafe tag sizes") {
    val rows = MultimodalOps.mp3Meta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "mp3", s"doc $id fmt (sync not found)")
      assert(r.getLong(2) == (id * 97) % 20000, s"doc $id tag_size")
    }
    // a straight be32 read agrees with syncsafe only below 128 — the
    // corpus must plant sizes that cross the 7- and 14-bit boundaries
    assert(rows.exists(_.getLong(2) >= 128), "no 2-byte syncsafe size")
    assert(rows.exists(_.getLong(2) >= 16384), "no 3-byte syncsafe size")
  }

  test("header parse recovers the dims each container encodes") {
    val rows = MultimodalOps.imageDims(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expFmt = (id % 3) match {
        case 0 => "png"; case 1 => "gif"; case _ => "bmp"
      }
      assert(r.getString(1) == expFmt, s"doc $id fmt")
      assert(r.getInt(2) == 16 + (id % 1009).toInt, s"doc $id width")
      assert(r.getInt(3) == 16 + ((id * 7) % 1013).toInt, s"doc $id height")
    }
    // all three container families must actually occur
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq == Seq("bmp", "gif", "png"))
  }
}
