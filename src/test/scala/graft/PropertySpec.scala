package graft

import graft.analyzer.{MBool, MDecimal, MFloat, MInt, MType, MTypes}
import graft.parser.Ast._
import graft.parser.Parser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring the reference's unit coverage of the type
  * lattice (arithmetic_join, Type.cpp) and a printer/parser round-trip
  * over the expression grammar. ScalaCheck generators driven by a
  * seeded sampling loop (no scalatest-plus bridge in the offline
  * dependency cache). */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  // ------------------------------------------------ arithmetic lattice

  private val genNumeric: Gen[MType] = Gen.oneOf(
    Gen.oneOf(1, 2, 4, 8).map(MInt(_)),
    Gen.oneOf(32, 64).map(MFloat(_)),
    for { p <- Gen.choose(1, 19); s <- Gen.choose(0, 6) } yield MDecimal(p, math.min(p, s)))

  test("binary walkers never throw and terminate on arbitrary bytes") {
    // the media parsers run inside codegen over UNTRUSTED blobs: any
    // byte sequence must produce a verdict (-1 on garbage), never an
    // exception or a hang — fuzz random buffers plus adversarial
    // prefixes (valid magics with garbage tails, zero/huge size
    // fields) through every walker
    val genBytes: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 512)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    val magics = Seq(
      Array[Byte](0xff.toByte, 0xd8.toByte),                   // JPEG SOI
      "ftyp".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 0) ++ "ftyp".getBytes("US-ASCII"),  // size-0 ftyp
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII"),  // largesize, no payload
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    forAll(Gen.zip(genBytes, Gen.oneOf(magics), Gen.oneOf(true, false))) {
      case (tail, magic, prefixed) =>
        val blob = if (prefixed) magic ++ tail else tail
        // each call must return (any value) without throwing
        graft.functions.JpegDims.dims(blob)
        graft.functions.Mp4Meta.meta(blob)
    }
  }

  test("arithmetic_join is commutative over numerics") {
    forAll(genNumeric, genNumeric) { (a: graft.analyzer.MType, b: graft.analyzer.MType) =>
      assert(MTypes.arithmeticJoin(a, b) == MTypes.arithmeticJoin(b, a))
    }
  }

  test("arithmetic_join is idempotent and closed over numerics") {
    forAll(genNumeric) { (a: graft.analyzer.MType) =>
      assert(MTypes.arithmeticJoin(a, a) == a)
    }
    forAll(genNumeric, genNumeric) { (a: graft.analyzer.MType, b: graft.analyzer.MType) =>
      assert(MTypes.arithmeticJoin(a, b).isNumeric)
    }
  }

  test("comparability is symmetric and rejects cross-category") {
    forAll(genNumeric) { (a: graft.analyzer.MType) =>
      assert(MTypes.comparable(a, MBool, equality = true) ==
        MTypes.comparable(MBool, a, equality = true))
      assert(!MTypes.comparable(a, MBool, equality = false))
    }
  }

  // ------------------------------------------------ parser round-trip

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth == 0) Gen.oneOf(
      genIdent.map(Id(None, _)),
      Gen.zip(genIdent, genIdent).map { case (t, n) => Id(Some(t), n) },
      Gen.choose(0L, 1000000L).map(IntLit(_)),
      Gen.choose(0.001, 1e6).map(FloatLit(_)),
      Gen.asciiPrintableStr.map(s => StrLit(s.take(12))),
      Gen.oneOf(BoolLit(true), BoolLit(false), NullLit),
      Gen.const(DateLit("1996-07-04")),
      Gen.const(DateTimeLit("1996-07-04 12:30:00")))
    else Gen.frequency(
      3 -> genExpr(0),
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%", "=", "!=", "<", "<=",
          ">", ">=", "AND", "OR", "..")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Binary(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("+", "-", "~", "NOT")
        x <- genExpr(depth - 1)
      } yield Unary(op, x)),
      1 -> (for {
        l <- genExpr(depth - 1); p <- genExpr(depth - 1)
      } yield Like(l, p, negated = false)),
      1 -> (for {
        n <- Gen.oneOf("sum", "avg", "min", "max", "foo")
        a <- genExpr(depth - 1)
      } yield FnCall(n, Seq(a))),
      1 -> Gen.const(FnCall("count", Nil, star = true)))

  /** Print an expression in dialect syntax (fully parenthesized). */
  private def print(e: Expr): String = e match {
    case Id(None, n) => n
    case Id(Some(t), n) => s"$t.$n"
    case IntLit(v) => v.toString
    case FloatLit(v, _) => v.toString
    case StrLit(v) =>
      "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c => c.toString
      } + "\""
    case BoolLit(v) => if (v) "TRUE" else "FALSE"
    case NullLit => "NULL"
    case DateLit(i) => s"d'$i'"
    case DateTimeLit(i) => s"d'$i'"
    case Unary(op, x) =>
      if (op == "NOT") s"(NOT ${print(x)})" else s"($op${print(x)})"
    case Binary(op, l, r) => s"(${print(l)} $op ${print(r)})"
    case Like(l, p, _) => s"(${print(l)} LIKE ${print(p)})"
    case FnCall(n, _, true) => s"$n(*)"
    case FnCall(n, args, _) => s"$n(${args.map(print).mkString(", ")})"
    case other => fail(s"unprintable $other")
  }

  private def parseExpr(text: String): Expr = {
    Parser.parseOne(s"SELECT $text;") match {
      case s: SelectStmt => s.items.head.expr
      case other => fail(s"unexpected $other")
    }
  }

  /** Drop the raw source spelling FloatLit carries for golden
    * pretty-printing — structural round-trip compares values. */
  private def stripRaw(e: Expr): Expr = e match {
    case FloatLit(v, _) => FloatLit(v)
    case Unary(op, x) => Unary(op, stripRaw(x))
    case Binary(op, l, r) => Binary(op, stripRaw(l), stripRaw(r))
    case Like(l, p, n) => Like(stripRaw(l), stripRaw(p), n)
    case FnCall(n, args, s) => FnCall(n, args.map(stripRaw), s)
    case other => other
  }

  test("print → parse round-trips the expression grammar") {
    forAll(genExpr(3), 300) { (e: Expr) =>
      assert(stripRaw(parseExpr(print(e))) == stripRaw(e))
    }
  }

  test("operator precedence matches the reference's table") {
    // unary > mult > add > .. > cmp > NOT > AND > OR (Parser.cpp:20-50)
    assert(parseExpr("1 + 2 * 3") ==
      Binary("+", IntLit(1), Binary("*", IntLit(2), IntLit(3))))
    assert(parseExpr("a .. b = c") ==
      Binary("=", Binary("..", Id(None, "a"), Id(None, "b")), Id(None, "c")))
    assert(parseExpr("NOT a = b") ==
      Unary("NOT", Binary("=", Id(None, "a"), Id(None, "b"))))
    assert(parseExpr("a OR b AND c") ==
      Binary("OR", Id(None, "a"), Binary("AND", Id(None, "b"), Id(None, "c"))))
    assert(parseExpr("1 + 2 .. x") ==
      Binary("..", Binary("+", IntLit(1), IntLit(2)), Id(None, "x")))
    assert(parseExpr("-a * b") ==
      Binary("*", Unary("-", Id(None, "a")), Id(None, "b")))
  }

  test("q6dec fast path equals the BigDecimal DECIMAL(18,6) cast") {
    // the covariance sufficient-stats loop relies on the floor-based
    // fast path agreeing with BigDecimal.valueOf(v).setScale(6,
    // HALF_UP) — the semantics of Spark's double→DECIMAL(18,6) cast —
    // on EVERY double, including exact .5 midpoints, negatives, and
    // float-noise neighbors of midpoints
    def slow(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1234565, -0.1234565, 2.5e-6, -2.5e-6,
      0.9999995, -0.9999995, 1.0000005, 123.4567895, -123.4567895,
      1e-7, -1e-7, 4.9e-7, 5.1e-7, 0.5e-6, 1.5e-6,
      987654.3210985, -987654.3210985, 1e9 + 0.5e-6, 3.14159265358979)
    adversarial.foreach { v =>
      assert(operators.Exact.q6dec(v) == slow(v), s"q6dec($v)")
    }
    forAll(Gen.chooseNum(-1e9, 1e9), 2000) { v =>
      assert(operators.Exact.q6dec(v) == slow(v), s"q6dec($v)")
    }
    // products of small embedding-like coordinates (the actual domain)
    forAll(Gen.zip(Gen.chooseNum(-4.0, 4.0), Gen.chooseNum(-4.0, 4.0)), 2000) { t =>
      val v = t._1 * t._2
      assert(operators.Exact.q6dec(v) == slow(v), s"q6dec($v)")
    }
    // magnitudes straddling the 1e15 fast-path guard: just below it
    // (fast path allowed — the capped 0.499 band must still be safe
    // against the ~0.19 representation error there), just above it
    // (always the BigDecimal slow path), and far above where v·10⁶
    // representation error exceeds whole units
    forAll(Gen.zip(Gen.chooseNum(0.5e9, 4.0e9), Gen.oneOf(1.0, -1.0)), 2000) { t =>
      val v = t._1 * t._2
      assert(operators.Exact.q6dec(v) == slow(v), s"q6dec($v)")
    }
    Seq(0.999999999e9, 1.000000001e9, 2.5e9, 3.999e9, 1e10, 1e12,
      9.007199254740992e9, -9.007199254740992e9).foreach { v =>
      assert(operators.Exact.q6dec(v) == slow(v), s"q6dec($v)")
    }
    // round-trip of the unscaled sum back to double equals the
    // decimal→double cast for magnitudes past 2^53 where plain /1e6
    // double division would mis-round
    assert(operators.Exact.q6decToDouble(9007199254740993L * 3L) ==
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(9007199254740993L * 3L), 6).doubleValue())
  }
}
