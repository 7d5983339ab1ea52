package graft.parser

import Ast._

final class ParseError(msg: String, val pos: Int) extends RuntimeException(msg)

/** Recursive-descent / precedence-climbing parser for the mutable SQL
  * dialect (ref /root/reference/src/parse/Parser.cpp; precedence table
  * Parser.cpp:20-50: unary > mult > add > `..` > comparison/LIKE >
  * NOT > AND > OR; grammar doc/syntax-grammar.md). */
final class Parser(tokens: Vector[Token]) {
  import TokenType._

  private var pos = 0
  private def cur: Token = tokens(pos)
  private def advance(): Token = { val t = cur; pos += 1; t }
  private def fail(msg: String): Nothing =
    throw new ParseError(s"$msg (at '${cur.text}')", cur.pos)

  private def accept(kw: String): Boolean =
    if (cur.is(kw)) { pos += 1; true } else false
  private def expect(kw: String): Unit =
    if (!accept(kw)) fail(s"expected '$kw'")
  private def expectIdent(): String = {
    if (cur.tpe != IDENT) fail("expected identifier")
    advance().text
  }
  private def expectInt(): Long = {
    if (cur.tpe != INT_LIT) fail("expected integer")
    advance().text.toLong
  }
  private def expectStr(): String = {
    if (cur.tpe != STR_LIT) fail("expected string literal")
    advance().text
  }

  // ------------------------------------------------------------ statements

  def parseStatements(): Seq[Stmt] = {
    val stmts = Seq.newBuilder[Stmt]
    while (cur.tpe != EOF) {
      stmts += parseStmt()
      while (accept(";")) ()
    }
    stmts.result()
  }

  def parseStmt(): Stmt = {
    if (cur.is("CREATE")) {
      advance()
      if (accept("DATABASE")) CreateDatabase(expectIdent())
      else if (accept("TABLE")) parseCreateTable()
      else if (cur.is("UNIQUE") || cur.is("INDEX")) parseCreateIndex()
      else fail("expected DATABASE, TABLE or INDEX after CREATE")
    } else if (cur.is("DROP")) {
      advance()
      if (accept("DATABASE")) {
        val ifEx = parseIfExists()
        DropDatabase(expectIdent(), ifEx)
      } else if (accept("TABLE")) {
        val ifEx = parseIfExists()
        DropTable(parseIdentList(), ifEx)
      } else if (accept("INDEX")) {
        val ifEx = parseIfExists()
        DropIndex(parseIdentList(), ifEx)
      } else fail("expected DATABASE, TABLE or INDEX after DROP")
    } else if (accept("USE")) UseDatabase(expectIdent())
    else if (cur.is("SELECT")) parseSelect()
    else if (accept("INSERT")) parseInsert()
    else if (accept("UPDATE")) {
      val t = expectIdent()
      expect("SET")
      val sets = Seq.newBuilder[(String, Expr)]
      def parseSet(): Unit = {
        val c = expectIdent(); expect("="); sets += ((c, parseExpr()))
      }
      parseSet()
      while (accept(",")) parseSet()
      val where = if (accept("WHERE")) Some(parseExpr()) else None
      UpdateStmt(t, sets.result(), where)
    }
    else if (accept("DELETE")) {
      expect("FROM"); val t = expectIdent()
      val where = if (accept("WHERE")) Some(parseExpr()) else None
      DeleteStmt(t, where)
    }
    else if (accept("IMPORT")) parseImport()
    else if (accept("\\")) {
      val name = expectIdent()
      val args = Seq.newBuilder[String]
      while (cur.tpe != EOF && !cur.is(";")) args += advance().text
      InstructionStmt(name, args.result())
    }
    else fail("expected statement")
  }

  private def parseIfExists(): Boolean =
    if (cur.is("IF")) { advance(); expect("EXISTS"); true } else false

  private def parseIdentList(): Seq[String] = {
    val names = Seq.newBuilder[String]
    names += expectIdent()
    while (accept(",")) names += expectIdent()
    names.result()
  }

  // ------------------------------------------------------------------ DDL

  private def parseCreateTable(): CreateTable = {
    val name = expectIdent()
    expect("(")
    val cols = Seq.newBuilder[ColumnDef]
    var first = true
    while (!cur.is(")")) {
      if (!first) expect(",")
      first = false
      val colName = expectIdent()
      val tpe = parseTypeName()
      val cs = Seq.newBuilder[Constraint]
      var more = true
      while (more) {
        if (accept("PRIMARY")) { expect("KEY"); cs += PrimaryKey }
        else if (accept("NOT")) { expect("NULL"); cs += NotNull }
        else if (accept("UNIQUE")) cs += Unique
        else if (accept("CHECK")) {
          expect("("); cs += Check(parseExpr()); expect(")")
        } else if (accept("REFERENCES")) {
          val t = expectIdent(); expect("("); val c = expectIdent(); expect(")")
          cs += References(t, c)
        } else more = false
      }
      cols += ColumnDef(colName, tpe, cs.result())
    }
    expect(")")
    CreateTable(name, cols.result())
  }

  private def parseTypeName(): TypeName = {
    val name = advance().text.toUpperCase
    name match {
      case "BOOL" | "DATE" | "DATETIME" | "FLOAT" | "DOUBLE" => TypeName(name, Nil)
      case "INT" | "BIGINT" | "CHAR" | "VARCHAR" =>
        if (accept("(")) {
          val n = expectInt().toInt; expect(")"); TypeName(name, Seq(n))
        } else if (name == "BIGINT") TypeName("INT", Seq(8))
        else fail(s"$name requires a length argument")
      case "DECIMAL" =>
        expect("(")
        val p = expectInt().toInt
        val s = if (accept(",")) expectInt().toInt else 0
        expect(")")
        TypeName("DECIMAL", Seq(p, s))
      case other => fail(s"unknown type '$other'")
    }
  }

  private def parseCreateIndex(): CreateIndex = {
    val unique = accept("UNIQUE")
    expect("INDEX")
    val ifNot = if (cur.is("IF")) {
      advance(); expect("NOT"); expect("EXISTS"); true
    } else false
    // ref grammar: IF NOT EXISTS requires a name (test/ddl parse-san)
    val name = if (ifNot) Some(expectIdent())
      else if (cur.tpe == IDENT && !cur.is("ON")) Some(expectIdent()) else None
    expect("ON")
    val table = expectIdent()
    // method may be an identifier or the DEFAULT keyword (ref ddl
    // fixtures: CREATE INDEX … USING DEFAULT (a))
    val method = if (accept("USING")) {
      if (accept("DEFAULT")) Some("DEFAULT") else Some(expectIdent())
    } else None
    expect("(")
    // ref grammar: a key is a plain designator or a parenthesized
    // expression — `(a+b)` is fine, bare `a+b` is a parse error
    def parseKey(): Expr =
      if (cur.tpe == IDENT) {
        val first = advance().text
        if (accept(".")) Id(Some(first), expectIdent()) else Id(None, first)
      } else if (accept("(")) {
        val e = parseExpr(); expect(")"); e
      } else fail("expected identifier or parenthesized expression")
    val exprs = Seq.newBuilder[Expr]
    exprs += parseKey()
    while (accept(",")) exprs += parseKey()
    expect(")")
    CreateIndex(unique, ifNot, name, table, method, exprs.result())
  }

  private def parseInsert(): InsertStmt = {
    expect("INTO")
    val table = expectIdent()
    expect("VALUES")
    val rows = Seq.newBuilder[Seq[Expr]]
    def parseRow(): Seq[Expr] = {
      expect("(")
      val vals = Seq.newBuilder[Expr]
      var first = true
      while (!cur.is(")")) {
        if (!first) expect(",")
        first = false
        if (accept("DEFAULT")) vals += DefaultLit
        else vals += parseExpr()
      }
      expect(")")
      vals.result()
    }
    rows += parseRow()
    while (accept(",")) rows += parseRow()
    InsertStmt(table, rows.result())
  }

  private def parseImport(): ImportDsv = {
    expect("INTO")
    val table = expectIdent()
    expect("DSV")
    val path = expectStr()
    var rows: Option[Long] = None
    var delim: Option[String] = None
    var esc: Option[String] = None
    var quote: Option[String] = None
    var hasHeader = false
    var skipHeader = false
    var more = true
    while (more) {
      if (accept("ROWS")) rows = Some(expectInt())
      else if (accept("DELIMITER")) delim = Some(expectStr())
      else if (accept("ESCAPE")) esc = Some(expectStr())
      else if (accept("QUOTE")) quote = Some(expectStr())
      else if (accept("HAS")) { expect("HEADER"); hasHeader = true }
      else if (accept("SKIP")) { expect("HEADER"); skipHeader = true }
      else more = false
    }
    ImportDsv(table, path, rows, delim, esc, quote, hasHeader, skipHeader)
  }

  // --------------------------------------------------------------- SELECT

  def parseSelect(): SelectStmt = {
    expect("SELECT")
    val items = Seq.newBuilder[SelectItem]
    def parseItem(): SelectItem =
      if (cur.is("*")) SelectItem(Star().at(advance()), None)
      else {
        val e = parseExpr()
        val alias = if (accept("AS")) Some(expectIdent()) else None
        SelectItem(e, alias)
      }
    items += parseItem()
    while (accept(",")) items += parseItem()

    val from = Seq.newBuilder[FromItem]
    if (accept("FROM")) {
      def parseFromItem(): FromItem =
        if (accept("(")) {
          val q = parseSelect()
          expect(")")
          expect("AS")
          FromQuery(q, expectIdent())
        } else {
          val name = expectIdent()
          val alias = if (accept("AS")) Some(expectIdent()) else None
          FromTable(name, alias)
        }
      from += parseFromItem()
      while (accept(",")) from += parseFromItem()
    }

    val where = if (accept("WHERE")) Some(parseExpr()) else None

    val groupBy = Seq.newBuilder[GroupKey]
    var groupTok: Token = null
    if (cur.is("GROUP")) {
      groupTok = advance()
      expect("BY")
      def parseKey(): GroupKey = {
        val e = parseExpr()
        val alias = if (accept("AS")) Some(expectIdent()) else None
        GroupKey(e, alias)
      }
      groupBy += parseKey()
      while (accept(",")) groupBy += parseKey()
    }

    val having = if (accept("HAVING")) Some(parseExpr()) else None

    val orderBy = Seq.newBuilder[OrderItem]
    if (accept("ORDER")) {
      expect("BY")
      def parseOrder(): OrderItem = {
        val e = parseExpr()
        val asc = if (accept("DESC")) false else { accept("ASC"); true }
        OrderItem(e, asc)
      }
      orderBy += parseOrder()
      while (accept(",")) orderBy += parseOrder()
    }

    var limit: Option[Long] = None
    var offset: Option[Long] = None
    if (accept("LIMIT")) {
      limit = Some(expectInt())
      if (accept("OFFSET")) offset = Some(expectInt())
    }

    val st = SelectStmt(items.result(), from.result(), where, groupBy.result(),
      having, orderBy.result(), limit, offset)
    if (groupTok != null) { st.groupLine = groupTok.line; st.groupCol = groupTok.col }
    st
  }

  // ---------------------------------------------------------- expressions
  // precedence: 0=OR 1=AND 2=NOT 3=cmp/LIKE 4=.. 5=add 6=mult 7=unary

  private def binPrec(t: Token): Int =
    if (t.is("OR")) 0
    else if (t.is("AND")) 1
    else if (t.is("=") || t.is("!=") || t.is("<") || t.is("<=") ||
      t.is(">") || t.is(">=") || t.is("LIKE")) 3
    else if (t.is("..")) 4
    else if (t.is("+") || t.is("-")) 5
    else if (t.is("*") || t.is("/") || t.is("%")) 6
    else -1

  def parseExpr(minPrec: Int = 0): Expr = {
    var lhs: Expr = parsePrefix(minPrec)
    var loop = true
    while (loop) {
      val p = binPrec(cur)
      if (p < 0 || p < minPrec) loop = false
      else {
        val opTok = advance()
        val op = opTok.text.toUpperCase
        if (op == "LIKE") {
          val rhs = parseExpr(p + 1)
          lhs = Like(lhs, rhs, negated = false).at(opTok)
        } else {
          val rhs = parseExpr(p + 1)
          lhs = Binary(op, lhs, rhs).at(opTok)
        }
      }
    }
    lhs
  }

  private def parsePrefix(minPrec: Int): Expr = {
    if (cur.is("NOT")) { val tk = advance(); Unary("NOT", parseExpr(2)).at(tk) }
    else if (cur.is("+") || cur.is("-") || cur.is("~")) {
      val tk = advance()
      Unary(tk.text, parseExpr(7)).at(tk)
    } else parsePostfix()
  }

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    // function call: designator '(' [* | args] ')' — a qualified
    // designator (`t.fn(x)`) parses as a call too and is rejected by
    // Sema as an unknown function (ref sema-san deligator_as_function)
    while (cur.is("(") && e.isInstanceOf[Id]) {
      advance()
      val id = e.asInstanceOf[Id]
      val name = id.table.map(_ + ".").getOrElse("") + id.name
      if (accept("*")) { expect(")"); e = FnCall(name, Nil, star = true).at(id) }
      else if (accept(")")) e = FnCall(name, Nil).at(id)
      else {
        val args = Seq.newBuilder[Expr]
        args += parseExpr()
        while (accept(",")) args += parseExpr()
        expect(")")
        e = FnCall(name, args.result()).at(id)
      }
    }
    e
  }

  private def parsePrimary(): Expr = cur.tpe match {
    case IDENT =>
      val first = advance()
      if (cur.is(".")) {
        val dot = advance()
        if (cur.tpe != IDENT) fail("expected identifier")
        val attr = advance()
        // qualified designator: node position = the dot token (ref
        // AST Designator tok — golden diagnostics anchor there),
        // attribute position = the attribute-name token
        Id(Some(first.text), attr.text).at(dot).atAttr(attr)
      } else Id(None, first.text).at(first).atAttr(first)
    case INT_LIT =>
      val tk = advance()
      val t = tk.text
      IntLit(
        if (t.startsWith("0x") || t.startsWith("0X"))
          java.lang.Long.parseLong(t.drop(2), 16)
        else if (t.length > 1 && t.head == '0') // C-style octal
          java.lang.Long.parseLong(t, 8)
        else t.toLong).at(tk)
    case FLOAT_LIT =>
      val tk = advance()
      FloatLit(tk.text.toDouble, tk.text).at(tk)
    case STR_LIT => val tk = advance(); StrLit(tk.text).at(tk)
    case DATE_LIT => val tk = advance(); DateLit(tk.text).at(tk)
    case DATETIME_LIT => val tk = advance(); DateTimeLit(tk.text).at(tk)
    case KEYWORD if cur.is("TRUE") => BoolLit(true).at(advance())
    case KEYWORD if cur.is("FALSE") => BoolLit(false).at(advance())
    case KEYWORD if cur.is("NULL") => advance(); NullLit // singleton: no position
    // ISNULL / INT are keywords but also callable functions
    case KEYWORD if cur.is("ISNULL") || cur.is("INT") =>
      val tk = advance()
      expect("(")
      val arg = parseExpr()
      expect(")")
      FnCall(tk.text, Seq(arg)).at(tk)
    case OP if cur.is("(") =>
      val tk = advance()
      val e = if (cur.is("SELECT")) QueryExpr(parseSelect()).at(tk) else parseExpr()
      expect(")")
      e
    case _ => fail("expected expression")
  }
}

object Parser {
  def parse(sql: String): Seq[Stmt] =
    new Parser(Lexer.tokenize(sql)).parseStatements()
  def parseOne(sql: String): Stmt = {
    val stmts = parse(sql)
    if (stmts.size != 1)
      throw new ParseError(s"expected one statement, got ${stmts.size}", 0)
    stmts.head
  }
}
