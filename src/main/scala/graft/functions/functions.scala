package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum 64-bit polynomial
  * rolling hash over all character k-grams of the input string
  * (Karp-Rabin rolling hash; Schleimer et al., SIGMOD 2002 winnowing).
  * Strings shorter than k hash their full contents. Deterministic,
  * partition-local, O(n) per row; codegen via doGenCode so it stays
  * inside WholeStageCodegen.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash expects STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Long.valueOf(RollingMinHash.minHash(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.minHash($c.getBytes(), $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  final val B = 1000000007L // polynomial base

  /** Min rolling hash over k-byte windows (full-string hash if shorter). */
  def minHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // precompute B^(kk-1) for the rolling subtract
    var pow: Long = 1L
    var i = 1
    while (i < kk) { pow *= B; i += 1 }
    var h: Long = 0L
    i = 0
    while (i < kk) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = kk
    while (i < n) {
      h = (h - (bytes(i - kk) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** Column-level entry points for graft's custom expressions. */
object functions {
  private def toCol(e: Expression): Column = GraftShim.column(e)
  private def expr(c: Column): Expression = GraftShim.expression(c)

  /** Winnowing-style min rolling-hash fingerprint over char k-grams. */
  def rolling_min_hash(c: Column, k: Int): Column =
    toCol(RollingMinHash(expr(c), k))
}
