package graft.analyzer

import org.apache.spark.sql.types._

/** mutable's type system re-expressed for Spark (ref /root/reference/
  * include/mutable/catalog/Type.hpp; result-type rules in
  * doc/semantics.md:60-72 via `arithmetic_join` Type.hpp:484).
  *
  * Spark's own coercion is laxer (e.g. it will compare bool<int via
  * casts); the analyzer uses these types to enforce the *stricter*
  * mutable rules before any Column is built. */
sealed trait MType {
  def isNumeric: Boolean = this.isInstanceOf[MInt] ||
    this.isInstanceOf[MFloat] || this.isInstanceOf[MDecimal]
  def isString: Boolean = this.isInstanceOf[MStr]
}
case object MBool extends MType
final case class MInt(bytes: Int) extends MType          // 1,2,4,8
final case class MFloat(bits: Int) extends MType         // 32,64
final case class MDecimal(p: Int, s: Int) extends MType  // p ≤ 19
final case class MStr(len: Int, varying: Boolean) extends MType
case object MDate extends MType
case object MDateTime extends MType
case object MNull extends MType                          // type of NULL

/** One positioned diagnostic, rendered in the reference's format
  * (`-:line:col: error: message`, ref Diagnostic.hpp/diag.e). Position
  * (0,0) means "unknown" and renders without the location prefix. */
final case class Diag(line: Int, col: Int, msg: String) {
  def render: String =
    if (line > 0) s"-:$line:$col: error: $msg" else s"error: $msg"
}

/** Sema failure carrying one or more positioned diagnostics — the
  * reference's Sema recovers and keeps checking, so a single statement
  * can produce several errors (corpus num_err counts pin this). */
final class SemaError(val diags: Seq[Diag])
    extends RuntimeException(diags.map(_.render).mkString("\n")) {
  def this(msg: String) = this(Seq(Diag(0, 0, msg)))
}

object SemaError {
  /** Positioned single-diagnostic error anchored at an AST node. */
  def at(p: graft.parser.Ast.Positioned, msg: String): SemaError =
    new SemaError(Seq(Diag(p.line, p.col, msg)))
}

object MTypes {

  /** Result type of binary arithmetic (ref Type.hpp:484 arithmetic_join,
    * semantics.md:60-72): wider int wins; any float ⇒ float (double if
    * the other side is high-precision); any decimal ⇒ decimal with
    * max precision/scale. */
  def arithmeticJoin(a: MType, b: MType): MType = (a, b) match {
    case (MInt(x), MInt(y)) => MInt(math.max(x, y))
    case (MFloat(x), MFloat(y)) => MFloat(math.max(x, y))
    case (MFloat(32), MInt(y)) if y >= 4 => MFloat(64)
    case (MFloat(x), MInt(_)) => MFloat(x)
    case (MInt(_), f: MFloat) => arithmeticJoin(f, a)
    case (MFloat(32), MDecimal(p, _)) if p > 6 => MFloat(64)
    case (MFloat(x), MDecimal(_, _)) => MFloat(x)
    case (d: MDecimal, f: MFloat) => arithmeticJoin(f, d)
    case (MDecimal(p1, s1), MDecimal(p2, s2)) =>
      MDecimal(math.min(19, math.max(p1, p2)), math.max(s1, s2))
    case (MDecimal(p, s), MInt(_)) => MDecimal(p, s)
    case (MInt(_), MDecimal(p, s)) => MDecimal(p, s)
    case (MNull, other) => other
    case (other, MNull) => other
    case _ =>
      throw new SemaError(s"invalid operands to arithmetic: $a, $b")
  }

  /** Strict comparability (ref Type.hpp:547-554 is_comparable):
    * numeric↔numeric, string↔string, date↔date, datetime↔datetime;
    * bool↔bool only for = and !=. */
  def comparable(a: MType, b: MType, equality: Boolean): Boolean = (a, b) match {
    case (MNull, _) | (_, MNull) => true
    case _ if a.isNumeric && b.isNumeric => true
    case _ if a.isString && b.isString => true
    case (MDate, MDate) => true
    case (MDateTime, MDateTime) => true
    case (MBool, MBool) => equality
    case _ => false
  }

  /** Spark runtime type for an MType. */
  def toSpark(t: MType): DataType = t match {
    case MBool => BooleanType
    case MInt(1) => ByteType
    case MInt(2) => ShortType
    case MInt(4) => IntegerType
    case MInt(_) => LongType
    case MFloat(32) => FloatType
    case MFloat(_) => DoubleType
    case MDecimal(p, s) => DecimalType(p, s)
    case MStr(_, _) => StringType
    case MDate => DateType
    case MDateTime => TimestampType
    case MNull => NullType
  }

  /** MType view of an external Spark schema field. */
  def fromSpark(dt: DataType): MType = dt match {
    case BooleanType => MBool
    case ByteType => MInt(1)
    case ShortType => MInt(2)
    case IntegerType => MInt(4)
    case LongType => MInt(8)
    case FloatType => MFloat(32)
    case DoubleType => MFloat(64)
    case d: DecimalType => MDecimal(d.precision, d.scale)
    case StringType => MStr(Int.MaxValue, varying = true)
    case DateType => MDate
    case TimestampType | TimestampNTZType => MDateTime
    case NullType => MNull
    case other =>
      // columns outside the dialect's type system (arrays, binary…)
      // are visible but not usable in dialect expressions
      MStr(Int.MaxValue, varying = true)
  }
}
