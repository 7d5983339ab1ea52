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

  test("shared k-grams give shared min-hash for near-identical docs") {
    val base = "word " * 200
    val fp1 = RollingMinHash.minHash((base + "tail one").getBytes, 16)
    val fp2 = RollingMinHash.minHash((base + "tail two").getBytes, 16)
    // the minimum window almost surely falls in the long shared prefix
    assert(fp1 == fp2)
  }
}
