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
}
