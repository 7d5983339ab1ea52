package graft.exec

import org.apache.spark.sql.DataFrame

/** Golden-output printer matching the reference's PrintOperator format
  * (ref test/ours YAML end2end `out:` blocks): comma-separated values,
  * strings double-quoted, NULL for nulls, booleans as TRUE/FALSE. */
object ResultPrinter {

  def format(row: org.apache.spark.sql.Row): String =
    (0 until row.length).map { i =>
      if (row.isNullAt(i)) "NULL"
      else row.get(i) match {
        case s: String => "\"" + s + "\""
        case b: Boolean => if (b) "TRUE" else "FALSE"
        case d: java.sql.Date => d.toString
        case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
        case other => other.toString
      }
    }.mkString(",")

  /** Print (driver-side) — only for the REPL/debug path, never inside
    * a distributed operator. */
  def print(df: DataFrame, out: java.io.PrintStream = System.out): Long = {
    var n = 0L
    df.toLocalIterator().forEachRemaining { r => out.println(format(r)); n += 1 }
    n
  }
}

/** Minimal REPL over EngineSession — the E1 entry point shape of the
  * reference (ref src/shell.cpp). Reads ;-terminated statements from
  * stdin, prints results in golden format. */
object Shell {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-shell")
    val session = new graft.EngineSession(spark)
    val in = scala.io.Source.stdin
    val buf = new StringBuilder
    for (line <- in.getLines()) {
      buf.append(line).append('\n')
      if (line.trim.endsWith(";")) {
        val sql = buf.toString; buf.clear()
        try session.execute(sql) match {
          case graft.QueryResult(df) => ResultPrinter.print(df)
          case graft.CommandOk(msg) => System.err.println(msg)
        } catch {
          case e: Exception => System.err.println(s"error: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
