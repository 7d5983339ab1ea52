package graft

/** Committed idle-host recording of the TrainedCost microbench plus
  * the sf0.1 two-order join measurement — the deterministic ground
  * truth TrainedCostSpec ranks against (the live-wall-clock variant
  * canceled via load-guard `assume` three rounds running; it is now
  * opt-in under GRAFT_LIVE_COST=1 and the default suite uses this
  * fixture, so a default `sbt test` has zero canceled tests at any
  * host load).
  *
  * Re-record with `runMain graft.tools.CostFixtureRecorder` on a
  * near-idle host and paste its stdout block here.
  *
  * Note on msA/msB: the two sf0.1 join orders measure within ~5% of
  * each other even as forced shuffle joins — at 600k rows the extra
  * intermediate the worse order carries costs ~25 ms against ~540 ms
  * of fixed stage overhead on 32 cores, so NO ranking can be read off
  * this pair at this scale (the root cause of the three rounds of
  * cancels). They are kept for provenance and for the opt-in live
  * test; the deterministic ranking check instead scores the models
  * against the microbench grid's own recorded timings, where 1.5×+
  * separations are real. */
object TrainedCostFixture {
  // recorded by graft.tools.CostFixtureRecorder (1-min load 1.82 at start), local[32]
  val scanSamples: Seq[(Double, Double)] = Seq(
    (100000.0, 118.679),
    (4000000.0, 71.771),
    (1.6e7, 104.800),
    (3.2e7, 97.165))
  val joinSamples: Seq[((Double, Double, Double), Double)] = Seq(
    ((100000.0, 100000.0, 100000.0), 213.449),
    ((100000.0, 100000.0, 400000.0), 206.716),
    ((400000.0, 100000.0, 100000.0), 216.558),
    ((100000.0, 400000.0, 400000.0), 207.123),
    ((400000.0, 400000.0, 400000.0), 312.100),
    ((400000.0, 400000.0, 800000.0), 248.758),
    ((1000000.0, 100000.0, 100000.0), 172.883),
    ((1000000.0, 1000000.0, 1000000.0), 681.872))
  val nLi = 600000.0; val nOrd = 150000.0; val nCust = 15000.0
  val msA = 565.172; val msB = 540.601
}
