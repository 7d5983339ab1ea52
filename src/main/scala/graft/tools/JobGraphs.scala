package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Join Order Benchmark graphs from the reference's own benchmark
  * suite (ref `benchmark/job` — 34 query-family yml files over IMDB —
  * and `benchmark/job-light`): the workload the SIGMOD'23
  * heuristic-search paper (and the reference's enumerator experiments)
  * actually grade on, with realistic IRREGULAR join graphs — snowflakes
  * with multiple hubs — that the synthetic chain/star/cycle/clique
  * grid cannot produce.
  *
  * Only the join GRAPH is taken from the YAML (alias list + equi-join
  * predicates); IMDB itself is not present, so per-subproblem
  * cardinalities are rolled with [[graft.optimizer.CardinalityGen]] —
  * exactly the reference's own `cardinality_gen` + injection-estimator
  * experiment setup (ref src/cardinality_gen.cpp, used when grading
  * enumerators without trusting an estimator). Correlated mode keeps
  * selectivities consistent along join paths; above
  * [[CorrelatedMaxRels]] relations its 3^n split scan is too slow and
  * the uncorrelated per-edge-selectivity mode is used (both are ref
  * modes).
  */
object JobGraphs {

  final case class JobQuery(id: String, aliases: IndexedSeq[String],
      edges: Seq[(Int, Int)])

  val CorrelatedMaxRels = 14

  /** Parse one YAML file's `cases:` block into (caseKey, sqlText)
    * pairs. The corpus files are formulaic: a case line is
    * `    <key>: |` (multi-line, body indented deeper) or
    * `    <key>: <sql>` (single-line, job-light). */
  private def cases(path: Path): Seq[(String, String)] = {
    val lines = Files.readAllLines(path).asScala.toSeq
    val start = lines.indexWhere(_.trim == "cases:")
    if (start < 0) return Nil
    val out = Seq.newBuilder[(String, String)]
    var key: String = null
    val body = new StringBuilder
    def flush(): Unit = if (key != null) { out += ((key, body.toString)); body.clear() }
    val CaseLine = """^    (\w+):\s*(.*)$""".r
    for (l <- lines.drop(start + 1)) l match {
      case CaseLine(k, rest) =>
        flush(); key = k
        if (rest.trim != "|") body ++= rest + "\n"
      case other if other.startsWith("        ") || other.trim.isEmpty =>
        if (key != null) body ++= other + "\n"
      case _ => flush(); key = null
    }
    flush()
    out.result()
  }

  private val AliasedRel = """(?i)([A-Za-z_]\w*)(?:\s+AS)?\s+([A-Za-z_]\w*)""".r
  private val BareRel = """([A-Za-z_]\w*)""".r
  private val JoinPred =
    """([A-Za-z_]\w*)\.(\w+)\s*=\s*([A-Za-z_]\w*)\.(\w+)""".r

  /** Extract (aliases, equi-join edges) from one JOB-dialect SQL
    * text. The FROM list gives the relations; WHERE conjuncts of shape
    * `a.col = b.col` between two DIFFERENT aliases give the edges
    * (filter predicates have a literal side and never match). */
  def graphOf(sql: String): (IndexedSeq[String], Seq[(Int, Int)]) = {
    val fromIdx = "(?i)\\bFROM\\b".r.findFirstMatchIn(sql)
      .map(_.start).getOrElse(return (Vector.empty, Nil))
    val whereIdx = "(?i)\\bWHERE\\b".r.findFirstMatchIn(sql)
      .map(_.start).getOrElse(sql.length)
    val fromList = sql.substring(fromIdx + 4, whereIdx)
    val aliases = fromList.split(",").toIndexedSeq.flatMap { item =>
      item.trim match {
        case AliasedRel(_, a) => Some(a)
        case BareRel(t) => Some(t)
        case _ => None
      }
    }.distinct.sorted
    val idx = aliases.zipWithIndex.toMap
    val where = sql.substring(math.min(whereIdx, sql.length))
    val edges = JoinPred.findAllMatchIn(where).flatMap { m =>
      for {
        i <- idx.get(m.group(1)); j <- idx.get(m.group(3)) if i != j
      } yield if (i < j) (i, j) else (j, i)
    }.toSeq.distinct
    (aliases, edges)
  }

  /** All JOB query families (first case per family — variants share
    * the join graph) plus every job-light query, from the reference
    * checkout; empty if the reference tree is absent. */
  def load(refRoot: String = "/root/reference/benchmark"): Seq[JobQuery] = {
    def ymls(dir: String): Seq[Path] = {
      val p = Paths.get(refRoot, dir)
      if (!Files.isDirectory(p)) Nil
      else Files.list(p).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".yml")).sortBy(_.toString)
    }
    val job = ymls("job").flatMap { p =>
      val name = p.getFileName.toString.stripSuffix(".yml")
      cases(p).headOption.flatMap { case (_, sql) =>
        val (as, es) = graphOf(sql)
        if (as.size >= 2 && es.nonEmpty)
          Some(JobQuery(s"job/$name", as, es)) else None
      }
    }
    val light = ymls("job-light").flatMap { p =>
      val base = p.getFileName.toString.stripSuffix(".yml")
      cases(p).flatMap { case (k, sql) =>
        val (as, es) = graphOf(sql)
        if (as.size >= 2 && es.nonEmpty)
          Some(JobQuery(s"job-light/${base}_c$k", as, es)) else None
      }
    }
    // job-light varies FILTERS over a handful of join graphs — keep
    // one representative per distinct graph (the planning problem is
    // the graph; 70 copies of a 2-relation chain grade nothing new)
    val lightDeduped = light.groupBy(q => (q.aliases, q.edges)).values
      .map(_.minBy(_.id)).toSeq.sortBy(_.id)
    job ++ lightDeduped
  }

  /** Inspection: print every extracted graph (id, n, edges). */
  def main(args: Array[String]): Unit =
    load().foreach { q =>
      println(s"${q.id}  n=${q.aliases.size} edges=${q.edges.size}  " +
        q.aliases.mkString(",") + "  " +
        q.edges.map { case (a, b) => s"${q.aliases(a)}-${q.aliases(b)}" }
          .mkString(" "))
    }
}
