package graft.parser

import Ast._

/** Pretty-printer reproducing the reference's AST dump format exactly
  * (ref parser-stage `out:` golden blocks in test/{ours,ddl,tpc-h};
  * printing logic in the reference's AST operator<< — compound
  * expressions fully parenthesized, clauses on their own lines,
  * ORDER BY directions always explicit, CREATE TABLE/INDEX bodies on
  * indented lines). */
object AstPrinter {

  private def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    }

  def expr(e: Expr): String = e match {
    case Id(Some(t), n) => s"$t.$n"
    case Id(None, n) => n
    case IntLit(v) => v.toString
    case FloatLit(v, raw) => if (raw != null) raw else v.toString
    case StrLit(v) => "\"" + escape(v) + "\""
    case BoolLit(v) => if (v) "TRUE" else "FALSE"
    case NullLit => "NULL"
    case DefaultLit => "DEFAULT"
    case DateLit(iso) => s"d'$iso'"
    case DateTimeLit(iso) => s"d'$iso'"
    case FnCall(name, args, star) =>
      val inner = if (star) "*" else args.map(expr).mkString(", ")
      s"$name($inner)"
    case Unary("NOT", x) => s"(NOT ${expr(x)})"
    case Unary(op, x) => s"($op${expr(x)})"
    case Binary(op, l, r) => s"(${expr(l)} $op ${expr(r)})"
    case Like(l, p, neg) =>
      if (neg) s"(${expr(l)} NOT LIKE ${expr(p)})"
      else s"(${expr(l)} LIKE ${expr(p)})"
    case QueryExpr(q) => s"(${selectBody(q)})"
    case _: Star => "*"
  }

  private def typeName(t: TypeName): String = t.name match {
    case "DECIMAL" => s"DECIMAL(${t.args.head}, ${t.args(1)})"
    case n if t.args.nonEmpty => s"$n(${t.args.mkString(", ")})"
    case n => n
  }

  private def constraint(c: Constraint): String = c match {
    case PrimaryKey => "PRIMARY KEY"
    case NotNull => "NOT NULL"
    case Unique => "UNIQUE"
    case Check(e) => s"CHECK (${expr(e)})"
    case References(t, col) => s"REFERENCES $t($col)"
  }

  /** SELECT statement without the trailing `;` (reused inline for
    * FROM-subqueries and scalar subqueries). */
  private def selectBody(s: SelectStmt): String = {
    val sb = new StringBuilder
    sb ++= "SELECT "
    sb ++= s.items.map {
      case SelectItem(e, Some(a)) => s"${expr(e)} AS $a"
      case SelectItem(e, None) => expr(e)
    }.mkString(", ")
    if (s.from.nonEmpty) {
      sb ++= "\nFROM "
      sb ++= s.from.map {
        case FromTable(n, Some(a)) => s"$n AS $a"
        case FromTable(n, None) => n
        case fq: FromQuery => s"(${selectBody(fq.q)}) AS ${fq.aliasName}"
      }.mkString(", ")
    }
    s.where.foreach(w => sb ++= s"\nWHERE ${expr(w)}")
    if (s.groupBy.nonEmpty) {
      sb ++= "\nGROUP BY "
      sb ++= s.groupBy.map {
        case GroupKey(e, Some(a)) => s"${expr(e)} AS $a"
        case GroupKey(e, None) => expr(e)
      }.mkString(", ")
    }
    s.having.foreach(h => sb ++= s"\nHAVING ${expr(h)}")
    if (s.orderBy.nonEmpty) {
      sb ++= "\nORDER BY "
      sb ++= s.orderBy.map(o =>
        s"${expr(o.expr)} ${if (o.ascending) "ASC" else "DESC"}").mkString(", ")
    }
    s.limit.foreach { l =>
      sb ++= s"\nLIMIT $l"
      s.offset.foreach(o => sb ++= s" OFFSET $o")
    }
    sb.toString
  }

  def stmt(st: Stmt): String = st match {
    case s: SelectStmt => selectBody(s) + ";"
    case CreateDatabase(n) => s"CREATE DATABASE $n;"
    case DropDatabase(n, ifEx) =>
      s"DROP DATABASE ${if (ifEx) "IF EXISTS " else ""}$n;"
    case UseDatabase(n) => s"USE $n;"
    case CreateTable(name, cols) =>
      val body = cols.map { c =>
        val cons = c.constraints.map(constraint)
        ("    " + c.name + " " + typeName(c.tpe) +
          (if (cons.nonEmpty) " " + cons.mkString(" ") else ""))
      }.mkString(",\n")
      s"CREATE TABLE $name\n(\n$body\n);"
    case DropTable(ns, ifEx) =>
      s"DROP TABLE ${if (ifEx) "IF EXISTS " else ""}${ns.mkString(", ")};"
    case CreateIndex(unique, ifNot, name, table, method, keys) =>
      val head = "CREATE " + (if (unique) "UNIQUE " else "") + "INDEX " +
        (if (ifNot) "IF NOT EXISTS " else "") +
        name.map(_ + " ").getOrElse("") + "ON " + table +
        method.map(m => s" USING $m").getOrElse("")
      val body = keys.map {
        case Id(None, n) => s"    $n"
        case Id(Some(t), n) => s"    $t.$n"
        case e => s"    ${expr(e)}"
      }.mkString(",\n")
      s"$head\n(\n$body\n);"
    case DropIndex(ns, ifEx) =>
      s"DROP INDEX ${if (ifEx) "IF EXISTS " else ""}${ns.mkString(", ")};"
    case InsertStmt(table, rows) =>
      val body = rows.map(r =>
        "    (" + r.map(expr).mkString(", ") + ")").mkString(",\n")
      s"INSERT INTO $table\nVALUES\n$body;"
    case UpdateStmt(t, sets, where) =>
      s"UPDATE $t\nSET " +
        sets.map { case (c, e) => s"$c = ${expr(e)}" }.mkString(", ") +
        where.map(w => s"\nWHERE ${expr(w)}").getOrElse("") + ";"
    case DeleteStmt(t, where) =>
      s"DELETE FROM $t" +
        where.map(w => s"\nWHERE ${expr(w)}").getOrElse("") + ";"
    case ImportDsv(table, path, rows, delim, esc, quote, has, skip) =>
      val opts = rows.map(r => s" ROWS $r").getOrElse("") +
        delim.map(d => s" DELIMITER \"${escape(d)}\"").getOrElse("") +
        esc.map(e => s" ESCAPE \"${escape(e)}\"").getOrElse("") +
        quote.map(q => s" QUOTE \"${escape(q)}\"").getOrElse("") +
        (if (has) " HAS HEADER" else "") + (if (skip) " SKIP HEADER" else "")
      s"""IMPORT INTO $table DSV "${escape(path)}"$opts;"""
    case InstructionStmt(name, args) =>
      "\\" + name + args.map(" " + _).mkString + ";"
  }

  /** Print a whole script the way the reference's parser stage echoes
    * it: one pretty-printed statement per `;`, newline-joined. */
  def script(sql: String): String =
    Parser.parse(sql).map(stmt).mkString("\n")
}
