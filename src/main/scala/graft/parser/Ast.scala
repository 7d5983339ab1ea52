package graft.parser

/** AST for the mutable SQL dialect (ref /root/reference/include/
  * mutable/parse/AST.hpp; grammar in doc/syntax-grammar.md). */
object Ast {

  /** Source position (1-based line:col) carried outside the case-class
    * fields so equality/pattern matches are unaffected. Diagnostics
    * print `-:line:col:` like the reference (ref diag.e(tok.pos)). */
  sealed trait Positioned {
    var line: Int = 0
    var col: Int = 0
    def at(l: Int, c: Int): this.type = { line = l; col = c; this }
    def at(t: Token): this.type = at(t.line, t.col)
    def at(p: Positioned): this.type = at(p.line, p.col)
  }

  // ----------------------------------------------------------- expressions
  sealed trait Expr extends Positioned
  /** Designator. For a qualified `t.name` the node position is the DOT
    * token (ref AST.hpp Designator tok) and (attrLine, attrCol) is the
    * attribute-name token — attribute-level errors anchor there (ref
    * Sema diag.e(e.attr_name.pos)). Bare ids: both are the identifier. */
  final case class Id(table: Option[String], name: String) extends Expr {
    var attrLine: Int = 0
    var attrCol: Int = 0
    def atAttr(t: Token): this.type = { attrLine = t.line; attrCol = t.col; this }
  }
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double, raw: String = null) extends Expr
  /** INSERT DEFAULT marker (prints as DEFAULT; evaluates like NULL). */
  case object DefaultLit extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class DateLit(iso: String) extends Expr
  final case class DateTimeLit(iso: String) extends Expr
  /** function call: aggregates, ISNULL, INT; `COUNT(*)` → star=true */
  final case class FnCall(name: String, args: Seq[Expr], star: Boolean = false) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr          // + - ~ NOT
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr // arith/cmp/logic/..
  final case class Like(e: Expr, pattern: Expr, negated: Boolean) extends Expr
  /** scalar subquery in an expression position */
  final case class QueryExpr(q: SelectStmt) extends Expr
  /** SELECT * — positioned at the `*` token (star-expansion errors
    * anchor there, ref Sema select_all.pos). */
  final case class Star() extends Expr

  // ------------------------------------------------------------ statements
  sealed trait Stmt extends Positioned

  final case class SelectItem(expr: Expr, alias: Option[String])
  sealed trait FromItem { def alias: Option[String] }
  final case class FromTable(name: String, alias: Option[String]) extends FromItem
  final case class FromQuery(q: SelectStmt, aliasName: String) extends FromItem {
    def alias: Option[String] = Some(aliasName)
  }
  final case class GroupKey(expr: Expr, alias: Option[String])
  final case class OrderItem(expr: Expr, ascending: Boolean)

  final case class SelectStmt(
      items: Seq[SelectItem],           // Star() as single item for SELECT *
      from: Seq[FromItem],
      where: Option[Expr],
      groupBy: Seq[GroupKey],
      having: Option[Expr],
      orderBy: Seq[OrderItem],
      limit: Option[Long],
      offset: Option[Long]) extends Stmt {
    /** Position of the GROUP keyword (clause-level grouping errors
      * anchor there, ref Sema diag.e(c.tok.pos)). */
    var groupLine: Int = 0
    var groupCol: Int = 0
  }

  final case class CreateDatabase(name: String) extends Stmt
  final case class DropDatabase(name: String, ifExists: Boolean) extends Stmt
  final case class UseDatabase(name: String) extends Stmt

  /** column type as written: BOOL, INT(n), FLOAT, DOUBLE, DECIMAL(p,s),
    * CHAR(n), VARCHAR(n), DATE, DATETIME */
  final case class TypeName(name: String, args: Seq[Int])
  sealed trait Constraint
  case object PrimaryKey extends Constraint
  case object NotNull extends Constraint
  case object Unique extends Constraint
  final case class Check(expr: Expr) extends Constraint
  final case class References(table: String, col: String) extends Constraint
  final case class ColumnDef(name: String, tpe: TypeName, constraints: Seq[Constraint])

  final case class CreateTable(name: String, cols: Seq[ColumnDef]) extends Stmt
  final case class DropTable(names: Seq[String], ifExists: Boolean) extends Stmt
  final case class CreateIndex(unique: Boolean, ifNotExists: Boolean,
      name: Option[String], table: String, method: Option[String],
      exprs: Seq[Expr]) extends Stmt
  final case class DropIndex(names: Seq[String], ifExists: Boolean) extends Stmt

  final case class InsertStmt(table: String, rows: Seq[Seq[Expr]]) extends Stmt
  /** Fully parsed (SET assignments + WHERE, ref grammar:103-111) but
    * rejected at exec like the reference (DatabaseCommand.cpp:189-197). */
  final case class UpdateStmt(table: String,
      sets: Seq[(String, Expr)] = Nil, where: Option[Expr] = None) extends Stmt
  final case class DeleteStmt(table: String,
      where: Option[Expr] = None) extends Stmt

  final case class ImportDsv(table: String, path: String, rows: Option[Long],
      delimiter: Option[String], escape: Option[String], quote: Option[String],
      hasHeader: Boolean, skipHeader: Boolean) extends Stmt

  /** `\name arg…;` meta-command (ref DatabaseCommand.cpp:23-48
    * instruction registry; only `learn_spns` is built in). */
  final case class InstructionStmt(name: String, args: Seq[String]) extends Stmt
}
