package graft.tools

import graft.optimizer.JoinReorder
import graft.optimizer.JoinReorder.{JoinGraph, PlanEnumerator, Rel}

/** Planning-time benchmark over synthetic join graphs — the role of
  * the reference's `benchmark/plan-enumerators` suite: time every
  * registered enumerator plus representative heuristic-search
  * strategies on chain/cycle/star/clique topologies at
  * n = 10/15/20 relations.
  *
  * Exponential enumerators run under a wall-clock budget; a timeout is
  * recorded — and the enumerator skipped at larger sizes / denser
  * topologies — rather than waited out: "DP cannot finish within
  * budget at n = 20 on star/clique while heuristic search returns in
  * milliseconds" IS the SIGMOD'23 headline this artifact demonstrates
  * (ref HeuristicSearchPlanEnumerator.hpp preamble). Timed-out worker
  * threads are daemons abandoned until JVM exit, which is why this is
  * a standalone main and not a ScalaTest.
  *
  * Usage: `runMain graft.tools.EnumBench [budgetMs] [outPath]` —
  * defaults 3000 ms, ENUMBENCH.json. No Spark session needed: graph
  * enumeration is pure driver-side planning. */
object EnumBench {

  private def graph(n: Int, seed: Int, shape: String): JoinGraph = {
    val rnd = new scala.util.Random(seed)
    val rels = (0 until n).map(i =>
      Rel(null, math.pow(10, 2 + rnd.nextInt(4)) * (1 + rnd.nextDouble()), i)).toVector
    val e = null: org.apache.spark.sql.catalyst.expressions.Expression
    val edges = shape match {
      case "chain" => (0 until n - 1).map(i => (i, i + 1, e))
      case "cycle" => (0 until n - 1).map(i => (i, i + 1, e)) :+ ((n - 1, 0, e))
      case "star" => (1 until n).map(i => (0, i, e))
      case "clique" => for (i <- 0 until n; j <- i + 1 until n) yield (i, j, e)
    }
    JoinGraph(rels, edges.toSeq, Nil)
  }

  final case class Res(name: String, shape: String, n: Int,
      ms: Double, timeout: Boolean, cost: Double)

  /** Run `enum.enumerate(g)` on a daemon thread with a budget; on
    * timeout the thread is abandoned (dies with the JVM). */
  private def timedRun(en: PlanEnumerator, g: JoinGraph,
      budgetMs: Long): (Double, Boolean, Double) = {
    val done = new java.util.concurrent.CompletableFuture[(Double, Double)]()
    val t = new Thread(() => {
      try {
        val t0 = System.nanoTime
        val tree = en.enumerate(g)
        done.complete(((System.nanoTime - t0) / 1e6, tree.cost))
      } catch { case e: Throwable => done.completeExceptionally(e) }
    })
    t.setDaemon(true)
    t.start()
    try {
      val (ms, cost) = done.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      (ms, false, cost)
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        (budgetMs.toDouble, true, Double.NaN)
    }
  }

  def main(args: Array[String]): Unit = {
    val budgetMs = args.lift(0).map(_.toLong).getOrElse(3000L)
    val outPath = args.lift(1).getOrElse("ENUMBENCH.json")
    val shapes = Seq("chain", "cycle", "star", "clique") // by density
    val density = shapes.zipWithIndex.toMap
    val sizes = Seq(10, 15, 20)
    val Reps = 3

    val hsStrategies = Seq(
      "HeuristicSearch_goo_AStar" -> JoinReorder.resolve("HeuristicSearch"),
      "HeuristicSearch_goo_beam2" ->
        JoinReorder.resolve("HeuristicSearch", hsSearch = "beam_search"),
      "HeuristicSearch_goo_dynamic_beam" ->
        JoinReorder.resolve("HeuristicSearch", hsSearch = "dynamic_beam_search"),
      "HeuristicSearch_goo_anytimeAStar" ->
        JoinReorder.resolve("HeuristicSearch", hsSearch = "anytimeastar"))
    val candidates: Seq[(String, PlanEnumerator)] =
      hsStrategies ++ JoinReorder.enumerators.values.toSeq.sortBy(_.name)
        .map(en => en.name -> en)

    val results = Seq.newBuilder[Res]
    for ((name, en) <- candidates) {
      // JIT warm-up on a small graph before any timed run
      en.enumerate(graph(8, 1, "chain"))
      // first timeout at (shape, n) skips same-or-denser shapes at ≥ n
      var timeouts = List.empty[(String, Int)]
      for (n <- sizes; shape <- shapes) {
        val skip = timeouts.exists { case (s, tn) =>
          density(s) <= density(shape) && n >= tn
        }
        if (!skip) {
          val g = graph(n, 7, shape)
          val (ms0, to0, cost0) = timedRun(en, g, budgetMs)
          if (to0) {
            timeouts ::= (shape, n)
            results += Res(name, shape, n, ms0, timeout = true, cost0)
            System.err.println(f"[enumbench] $name%-34s $shape%-6s n=$n%-3d TIMEOUT (> $budgetMs ms)")
          } else {
            val times = ms0 +: (2 to Reps).map(_ => timedRun(en, g, budgetMs)._1)
            val med = times.sorted.apply(times.length / 2)
            results += Res(name, shape, n, med, timeout = false, cost0)
            System.err.println(f"[enumbench] $name%-34s $shape%-6s n=$n%-3d $med%10.2f ms")
          }
        } else {
          results += Res(name, shape, n, budgetMs.toDouble, timeout = true, Double.NaN)
        }
      }
    }
    val all = results.result()

    // headline: at n=20 on star and clique, best heuristic-search time
    // vs best DP-family time (timeout counts as the budget)
    val dpFamily = Set("peall", "dpsize", "dpsizeopt", "dpsizesub",
      "dpsub", "dpsubopt", "dpccp", "tdbasic", "tdmincutagat")
    def best(shape: String, n: Int, pred: String => Boolean): Double =
      all.filter(r => r.shape == shape && r.n == n && pred(r.name)).map(_.ms).min
    val headline = for (shape <- Seq("star", "clique")) yield {
      val hs = best(shape, 20, _.toLowerCase.startsWith("heuristicsearch"))
      val dp = best(shape, 20, n => dpFamily(n.toLowerCase))
      (shape, hs, dp, hs < dp)
    }

    def fmt(d: Double) = if (d.isNaN) "null" else f"$d%.3f"
    val json = new StringBuilder
    json ++= s"""{"budget_ms":$budgetMs,"headline":["""
    json ++= headline.map { case (s, hs, dp, wins) =>
      s"""{"shape":"$s","n":20,"best_hs_ms":${fmt(hs)},"best_dp_ms":${fmt(dp)},"hs_beats_dp":$wins}"""
    }.mkString(",")
    json ++= """],"results":["""
    json ++= all.map(r =>
      s"""{"name":"${r.name}","shape":"${r.shape}","n":${r.n},"ms":${fmt(r.ms)},"timeout":${r.timeout},"cost":${fmt(r.cost)}}""")
      .mkString(",")
    json ++= "]}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json.toString)
    println(json.toString)
  }
}
