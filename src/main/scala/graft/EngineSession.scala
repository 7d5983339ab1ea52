package graft

import graft.analyzer._
import graft.parser.{Ast, Parser}
import graft.parser.Ast._
import graft.planner.{CatalogTable, Planner}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Execution result of one dialect statement. */
sealed trait ExecResult
final case class QueryResult(df: DataFrame) extends ExecResult
final case class CommandOk(message: String) extends ExecResult

/** Session + catalog for the mutable dialect: databases → tables
  * (ref include/mutable/catalog/Catalog.hpp / Schema.hpp §1.1 of
  * SURVEY.md). Tables live as DataFrames — created empty by DDL,
  * populated by INSERT VALUES / IMPORT DSV, or registered externally
  * (parquet-backed) for scale. One database is "in use" at a time
  * (`USE db`), like the reference. */
final class EngineSession(val spark: SparkSession) {

  final case class TableDef(
      name: String,
      fields: Seq[(String, MType)],
      constraints: Map[String, Seq[Ast.Constraint]],
      var df: DataFrame)

  private val databases = mutable.Map[String, mutable.Map[String, TableDef]]()
  private var currentDb: Option[String] = None

  private def db(): mutable.Map[String, TableDef] = currentDb match {
    case Some(n) => databases(n)
    case None => throw new SemaError("no database in use (USE <db>)")
  }

  /** Register an externally-backed table (e.g. driver parquet) into
    * the current database. */
  def registerExternal(name: String, df: DataFrame): Unit = {
    val fields = df.schema.fields.toSeq.map(f =>
      f.name -> MTypes.fromSpark(f.dataType))
    db().put(name.toLowerCase, TableDef(name, fields, Map.empty, df))
  }

  private def lookup(name: String): Option[CatalogTable] =
    db().get(name.toLowerCase).map(t => CatalogTable(t.df, t.fields))

  private def planner = new Planner(spark, lookup)

  /** Execute one or more dialect statements; returns the result of the
    * last one. */
  def execute(sql: String): ExecResult = {
    val stmts = Parser.parse(sql)
    if (stmts.isEmpty) throw new SemaError("empty input")
    stmts.map(executeStmt).last
  }

  /** Convenience: execute a single SELECT and return its DataFrame. */
  def query(sql: String): DataFrame = execute(sql) match {
    case QueryResult(df) => df
    case CommandOk(m) => throw new SemaError(s"not a query: $m")
  }

  def executeStmt(stmt: Stmt): ExecResult = stmt match {
    case s: SelectStmt => QueryResult(planner.plan(s))

    case CreateDatabase(name) =>
      if (databases.contains(name.toLowerCase))
        throw new SemaError(s"database '$name' already exists")
      databases(name.toLowerCase) = mutable.Map.empty
      CommandOk(s"created database $name")

    case DropDatabase(name, ifExists) =>
      if (databases.remove(name.toLowerCase).isEmpty && !ifExists)
        throw new SemaError(s"no database '$name'")
      if (currentDb.contains(name.toLowerCase)) currentDb = None
      CommandOk(s"dropped database $name")

    case UseDatabase(name) =>
      if (!databases.contains(name.toLowerCase))
        throw new SemaError(s"no database '$name'")
      currentDb = Some(name.toLowerCase)
      CommandOk(s"using $name")

    case CreateTable(name, cols) =>
      if (db().contains(name.toLowerCase))
        throw new SemaError(s"table '$name' already exists")
      val fields = cols.map(c => c.name -> typeOf(c.tpe))
      val schema = StructType(fields.map { case (n, t) =>
        StructField(n, MTypes.toSpark(t))
      })
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      db().put(name.toLowerCase, TableDef(name, fields,
        cols.map(c => c.name -> c.constraints).toMap, empty))
      CommandOk(s"created table $name")

    case DropTable(names, ifExists) =>
      names.foreach { n =>
        if (db().remove(n.toLowerCase).isEmpty && !ifExists)
          throw new SemaError(s"no table '$n'")
      }
      CommandOk(s"dropped ${names.mkString(", ")}")

    // Indexes: accepted, recorded nowhere — physical access paths are
    // Spark's concern (ref SURVEY §1.1: ArrayIndex/RMI ≈ research
    // surface with no Spark equivalent; parity = accept the DDL).
    case CreateIndex(_, _, name, table, _, _) =>
      if (!db().contains(table.toLowerCase))
        throw new SemaError(s"no table '$table'")
      CommandOk(s"created index ${name.getOrElse("(anonymous)")} on $table (no-op)")
    case DropIndex(names, _) => CommandOk(s"dropped index ${names.mkString(", ")}")

    case InsertStmt(table, rows) =>
      val t = db().getOrElse(table.toLowerCase,
        throw new SemaError(s"no table '$table'"))
      val schema = StructType(t.fields.map { case (n, tp) =>
        StructField(n, MTypes.toSpark(tp))
      })
      val data = rows.map { r =>
        if (r.length != t.fields.length)
          throw new SemaError(
            s"INSERT arity ${r.length} != table arity ${t.fields.length}")
        Row.fromSeq(r.zip(t.fields).map { case (e, (_, tp)) =>
          literalValue(e, tp)
        })
      }
      val newDf = spark.createDataFrame(
        spark.sparkContext.parallelize(data), schema)
      t.df = t.df.unionByName(newDf)
      CommandOk(s"inserted ${rows.length} rows into $table")

    // parity with ref DatabaseCommand.cpp:189-197 (parsed, unreachable)
    case UpdateStmt(_) =>
      throw new UnsupportedOperationException("UPDATE not yet implemented")
    case DeleteStmt(_) =>
      throw new UnsupportedOperationException("DELETE not yet implemented")

    case ImportDsv(table, path, rows, delim, esc, quote, hasHeader, skipHeader) =>
      val t = db().getOrElse(table.toLowerCase,
        throw new SemaError(s"no table '$table'"))
      val schema = StructType(t.fields.map { case (n, tp) =>
        StructField(n, MTypes.toSpark(tp))
      })
      var reader = spark.read
        .schema(schema)
        .option("delimiter", delim.getOrElse(","))
        .option("quote", quote.getOrElse("\""))
        .option("escape", esc.getOrElse("\\"))
        .option("header", (hasHeader || skipHeader).toString)
      var df = reader.csv(path)
      rows.foreach(n => df = df.limit(n.toInt))
      t.df = t.df.unionByName(df)
      CommandOk(s"imported $path into $table")
  }

  private def typeOf(t: TypeName): MType = t.name match {
    case "BOOL" => MBool
    case "INT" => MInt(t.args.head)
    case "FLOAT" => MFloat(32)
    case "DOUBLE" => MFloat(64)
    case "DECIMAL" =>
      val p = t.args.head
      if (p > 19) throw new SemaError("DECIMAL precision is capped at 19")
      MDecimal(p, t.args.lift(1).getOrElse(0))
    case "CHAR" => MStr(t.args.head, varying = false)
    case "VARCHAR" => MStr(t.args.head, varying = true)
    case "DATE" => MDate
    case "DATETIME" => MDateTime
    case other => throw new SemaError(s"unknown type $other")
  }

  /** Evaluate an INSERT literal to a JVM value of the target type. */
  private def literalValue(e: Expr, target: MType): Any = e match {
    case NullLit => null
    case IntLit(v) => target match {
      case MInt(1) => v.toByte
      case MInt(2) => v.toShort
      case MInt(4) => v.toInt
      case MInt(_) => v
      case MFloat(32) => v.toFloat
      case MFloat(_) => v.toDouble
      case MDecimal(p, s) => new java.math.BigDecimal(v).setScale(s)
      case other => throw new SemaError(s"cannot insert integer into $other")
    }
    case FloatLit(v) => target match {
      case MFloat(32) => v.toFloat
      case MFloat(_) => v
      case MDecimal(p, s) =>
        new java.math.BigDecimal(v).setScale(s, java.math.RoundingMode.HALF_UP)
      case other => throw new SemaError(s"cannot insert float into $other")
    }
    case StrLit(v) => target match {
      case MStr(n, varying) =>
        if (v.length > n)
          throw new SemaError(s"string too long for ${if (varying) "VARCHAR" else "CHAR"}($n)")
        v
      case other => throw new SemaError(s"cannot insert string into $other")
    }
    case BoolLit(v) => target match {
      case MBool => v
      case other => throw new SemaError(s"cannot insert bool into $other")
    }
    case DateLit(iso) => target match {
      case MDate =>
        val p = iso.trim
        val (sign, rest) = if (p.startsWith("-")) (-1, p.drop(1)) else (1, p)
        val Array(y, m, d) = rest.split("-").map(_.toInt)
        java.sql.Date.valueOf(java.time.LocalDate.of(sign * y, m, d))
      case other => throw new SemaError(s"cannot insert date into $other")
    }
    case DateTimeLit(iso) => target match {
      case MDateTime =>
        val parts = iso.trim.split("[ ]+")
        val dp = parts(0)
        val (sign, rest) = if (dp.startsWith("-")) (-1, dp.drop(1)) else (1, dp)
        val Array(y, m, d) = rest.split("-").map(_.toInt)
        val Array(hh, mi, ss) = parts(1).split(":").map(_.toInt)
        java.sql.Timestamp.from(java.time.LocalDateTime
          .of(sign * y, m, d, hh, mi, ss).toInstant(java.time.ZoneOffset.UTC))
      case other => throw new SemaError(s"cannot insert datetime into $other")
    }
    case Unary("-", x) => literalValue(x, target) match {
      case v: Byte => (-v).toByte
      case v: Short => (-v).toShort
      case v: Int => -v
      case v: Long => -v
      case v: Float => -v
      case v: Double => -v
      case v: java.math.BigDecimal => v.negate()
      case other => throw new SemaError(s"cannot negate $other")
    }
    case other =>
      throw new SemaError(s"INSERT values must be literals, got $other")
  }
}

object EngineSession {
  /** Session preloaded with the driver testdata as external tables in
    * database `testdata`. */
  def withTestdata(spark: SparkSession, dir: String): EngineSession = {
    val s = new EngineSession(spark)
    s.execute("CREATE DATABASE testdata; USE testdata;")
    Engine.tableNames.foreach(n => s.registerExternal(n, Engine.table(spark, dir, n)))
    s
  }
}
