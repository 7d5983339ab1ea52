package graft.tools

import graft.EngineSession
import graft.optimizer.{CardinalityGen, JoinReorderRule}
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}

/** CLI mirror of the reference's `cardinality_gen` binary
  * (ref src/cardinality_gen.cpp:87): load a dialect schema script,
  * read one SELECT (file or stdin), and print fake-but-consistent
  * cardinalities for every connected subproblem of its join graph as
  * injection JSON.
  *
  * Usage: CardinalityGenTool <SCHEMA.sql> [<QUERY.sql>]
  *          [--seed N] [--min N] [--max N] [--alpha A] [--uncorrelated]
  */
object CardinalityGenTool extends PredicateHelper {

  /** Flatten the *analyzed* dialect plan (shape:
    * Project(aliases) → Filter(CNF) → left-deep Join Cross tree over
    * SubqueryAlias leaves — the reference QueryGraph's comma-join
    * form). More tolerant than the optimizer rule's `flatten`, which
    * targets post-optimization Inner joins. */
  private def collectGraph(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    p match {
      case Project(_, child) => collectGraph(child)
      case f: Filter =>
        val (l, c) = collectGraph(f.child)
        (l, c ++ splitConjunctivePredicates(f.condition))
      case Join(l, r, _: InnerLike, cond, _) =>
        val (ll, lc) = collectGraph(l)
        val (rl, rc) = collectGraph(r)
        (ll ++ rl, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case other => (Seq(other), Nil)
    }

  def main(args: Array[String]): Unit = {
    val valueFlags = Set("--seed", "--min", "--max", "--alpha")
    val positional = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < args.length) {
        if (valueFlags(args(i))) i += 2
        else { if (!args(i).startsWith("--")) out += args(i); i += 1 }
      }
      out.result()
    }
    if (positional.isEmpty || positional.length > 2) {
      System.err.println("usage: CardinalityGenTool <SCHEMA.sql> [<QUERY.sql>] " +
        "[--seed N] [--min N] [--max N] [--alpha A] [--uncorrelated]")
      sys.exit(1)
    }
    def flag(name: String, default: Long): Long = {
      val i = args.indexOf(name)
      if (i >= 0 && i + 1 < args.length) args(i + 1).toLong else default
    }
    val cfg = CardinalityGen.Config(
      seed = flag("--seed", 42L),
      minCard = flag("--min", 10L),
      maxCard = flag("--max", 10000L),
      alpha = {
        // ref semantics: alpha ∈ ℤ; 0 → 1, negative → 1/-alpha
        val a = flag("--alpha", 3L)
        if (a == 0) 1.0 else if (a > 0) a.toDouble else 1.0 / -a
      },
      correlated = !args.contains("--uncorrelated"))

    val spark = graft.Engine.session("graft-cardinality-gen")
    try {
      val session = new EngineSession(spark)
      val schema = scala.io.Source.fromFile(positional.head).mkString
      session.execute(schema)
      val querySql =
        if (positional.length == 2)
          scala.io.Source.fromFile(positional(1)).mkString
        else scala.io.Source.stdin.mkString

      val select = graft.parser.Parser.parse(querySql).collectFirst {
        case s: graft.parser.Ast.SelectStmt => s
      }.getOrElse {
        System.err.println("Expected a SELECT statement."); sys.exit(1)
      }
      val plan = session.planOnly(select).queryExecution.analyzed
      val (leaves, allConds) = collectGraph(plan)
      // FROM-item names: our planner aliases every scan, so each leaf
      // subtree carries its dialect name as the outermost SubqueryAlias
      val names = leaves.map { l =>
        l.collectFirst { case sa: SubqueryAlias => sa.alias.toString }
          .getOrElse(l.nodeName.toLowerCase)
      }.toIndexedSeq
      val conds = {
        val rels = leaves.zipWithIndex.map { case (p, i) =>
          graft.optimizer.JoinReorder.Rel(p, 1.0, i)
        }.toVector
        JoinReorderRule.splitConds(rels, allConds)._1
      }
      val edges = conds.map { case (a, b, _) => (a, b) }.distinct
      val table = CardinalityGen.generate(names.length, edges, cfg)
      val db = session.currentDatabase.getOrElse("db")
      print(CardinalityGen.emitJson(db, names, table))
    } finally spark.stop()
  }
}
