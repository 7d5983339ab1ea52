package graft

import graft.operators.{ChunkOps, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the chunking / repetition / embedding-analysis ops
  * beyond the DuckDB oracle — chiefly the 100 TB plan-shape pins:
  * the row-local ops must compile to shuffle-free plans. */
class ChunkSpec extends AnyFunSuite {
  import TestSession._

  test("chunkSliding and repetitionStats plans are shuffle-free") {
    // Row-local ops: one map pass, no Exchange anywhere in the plan.
    for (df <- Seq(ChunkOps.chunkSliding(spark, sf),
                   ChunkOps.repetitionStats(spark, sf))) {
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected shuffle-free plan, got:\n$physical")
    }
  }

  test("chunks cover each document exactly with the declared overlap") {
    val chunks = ChunkOps.chunkSliding(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val docs = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet)
    for ((id, cs) <- chunks) {
      val text = docs(id)
      // chunk starts advance by exactly Stride and stay inside the doc
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i * ChunkOps.Stride)
        assert(r.getLong(2) < math.max(text.length, 1))
        assert(r.getString(3) ==
          text.substring(r.getLong(2).toInt,
            math.min(text.length, (r.getLong(2) + ChunkOps.Chunk).toInt)))
      }
      // full coverage: last chunk reaches the end of the document
      val last = cs.last
      assert(last.getLong(2) + last.getLong(4) == text.length,
        s"doc $id: coverage ends before the document does")
    }
  }

  test("repetition fractions are in range and consistent") {
    val rows = ChunkOps.repetitionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(1); val nDistinct = r.getLong(2)
      val topN = r.getLong(3)
      assert(nDistinct >= 1 && nDistinct <= nWords)
      assert(topN >= 1 && topN <= nWords)
      // the most frequent word can't be rarer than the average word
      assert(topN.toDouble >= nWords.toDouble / nDistinct - 1e-9)
      for (i <- 6 to 8) {
        val f = r.getDouble(i)
        assert(f >= 0.0 && f <= 1.0, s"fraction $i out of range: $f")
      }
    }
  }

  test("knn classification votes sum within k and tie-break is minimal label") {
    val rows = SimilarityOps.knnClassify(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 10)
    }
    // deterministic: a second run yields the identical result
    val again = SimilarityOps.knnClassify(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("per-label centroids have full dimensionality and label counts") {
    val rows = SimilarityOps.centroidPerLabel(spark, sf).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    byLabel.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(0L until 64L))
      // n is constant across dims of one label
      assert(rs.map(_.getLong(2)).distinct.length == 1)
    }
  }
}
