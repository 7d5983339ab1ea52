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
