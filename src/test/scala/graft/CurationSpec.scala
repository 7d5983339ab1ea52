package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation ops beyond the DuckDB oracle: packing
  * must be a lossless layout (every token lands exactly once, bins
  * fill contiguously), decontamination must never flag eval docs. */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  test("perplexity bucketing scores hand-computable surprisal and routes the outlier to tail") {
    import graft.operators.TextOps
    import TestSession.spark.implicits._
    // Corpus: a=8 occurrences, z/q/j/x singletons → N = 12.
    // nll(docs 1,2) = ln12 − ln8 = ln(3/2); nll(doc 3) = ln12 (every
    // token is a singleton: the maximally surprising doc). With
    // mu ≈ 1.0986, sd ≈ 0.9803: doc 3 > mu+sd → tail; docs 1,2 sit
    // inside the band → middle.
    val docs = Seq((1L, "a a a a"), (2L, "a a a a"), (3L, "z q j x"))
      .toDF("doc_id", "text")
    val out = TextOps.perplexityBucketFrom(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    val (n1, nll1, b1) = out(1L)
    val (_, nll2, b2) = out(2L)
    val (n3, nll3, b3) = out(3L)
    assert(n1 == 4 && n3 == 4)
    assert(math.abs(nll1 - math.log(12.0 / 8.0)) < 2e-6, s"nll1 $nll1")
    assert(nll2 == nll1)
    assert(math.abs(nll3 - math.log(12.0)) < 2e-6, s"nll3 $nll3")
    assert(b1 == "middle" && b2 == "middle" && b3 == "tail",
      s"buckets: $b1 $b2 $b3")
  }

  test("perplexity bucketing over-cap path drops the broadcast hint and scores identically") {
    import graft.operators.TextOps
    import TestSession.spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "a a a a"), (3L, "z q j x"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1).toSeq
    // Disable size-based auto-broadcast so the ONLY thing that can put a
    // broadcast in the plan is a forced hint — the hint is the 100-TB OOM
    // hazard (it ignores size); the threshold path self-limits. Inspect
    // the pre-AQE sparkPlan (AQE may re-broadcast the tiny fixture join).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val under = TextOps.perplexityBucketFrom(spark, docs) // vocab 5 ≤ cap
      val underRows = rows(under)
      // drop the under-cap run's cached per-doc frame before building
      // the over-cap variant: cache lookup canonicalizes hints away,
      // so without this the over-cap plan would silently reuse the
      // broadcast run's cached join and the probe below would see no
      // join at all
      spark.sharedState.cacheManager.clearCache()
      val over = TextOps.perplexityBucketFrom(spark, docs, vocabCap = 1L)
      assert(rows(over) == underRows, "over-cap path diverged from broadcast path")
      // the per-doc frame is cached (round 13), so the token⋈surprisal
      // join lives inside an InMemoryRelation — recurse through cached
      // plans or the probe sees only the post-cache slice
      def shuffledJoins(df: org.apache.spark.sql.DataFrame) = {
        def planStr(p: org.apache.spark.sql.execution.SparkPlan): String =
          p.toString + p.collect {
            case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              planStr(s.relation.cachedPlan)
          }.mkString
        val p = planStr(df.queryExecution.sparkPlan)
        Seq("SortMergeJoin", "ShuffledHashJoin").count(p.contains)
      }
      assert(shuffledJoins(under) == 0, "under-cap plan shuffled the hinted token join")
      assert(shuffledJoins(over) > 0, "over-cap plan still broadcasts the surprisal join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("boilerplate strip is consistent with the detector and conserves paragraphs") {
    import graft.operators.TextOps
    val det = TextOps.boilerplate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_boilerplate (distinct)
    val strip = TextOps.boilerplateStrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(strip.map(_._1).toSet == det.keySet)
    strip.foreach { case (id, clean, kept, removed) =>
      // a doc loses occurrences iff the detector flagged boilerplate
      // in it (occurrence count >= distinct count; zero iff zero)
      assert((removed > 0) == (det(id) > 0), s"doc $id: removed=$removed det=${det(id)}")
      assert(removed >= det(id), s"doc $id: occurrences $removed < distinct ${det(id)}")
      // cleaned text word count matches the surviving paragraphs
      if (kept == 0) assert(clean.isEmpty)
      else assert(clean.split(" ").length <= kept * TextOps.ParaWords)
    }
  }

  test("mixture sampling respects weights, never oversamples, and is a corpus subset") {
    import graft.Engine
    val docs = Engine.table(spark, sf, "documents")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = CurationOps.mixSources(spark, sf).collect()
    val outIds = out.map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds.subsetOf(allIds))
    // the binding class (min n/w) keeps ~all of its docs; every class's
    // take is within the hash-thresholding tolerance of its target w·B
    val weights = CurationOps.MixWeights.toMap
    val budget = weights.map { case (l, w) => byLang(l) * 1000L / w }.min
    val outByLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    for ((l, w) <- weights) {
      val target = w * budget / 1000L
      val got = outByLang.getOrElse(l, 0).toLong
      assert(got <= byLang(l), s"$l oversampled: $got > ${byLang(l)}")
      // hash thresholding is Bernoulli around the target fraction:
      // allow 4·sqrt tolerance plus a small-count floor
      val tol = math.max(6L, 4 * math.round(math.sqrt(target.toDouble)))
      assert(math.abs(got - target) <= tol,
        s"$l: got $got, target $target (n=${byLang(l)}, B=$budget)")
    }
    // deterministic: a second run is byte-identical
    val again = CurationOps.mixSources(spark, sf).collect().map(_.getLong(0)).toSet
    assert(again == outIds)
  }

  test("temperature mixing hits the sqrt targets and flattens source shares") {
    val rows = CurationOps.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val bySource = rows.groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
    // driver-side targets with the SAME ordered sqrt accumulation
    val ns = bySource.toSeq.sortBy(_._1).map { case (s, (n, _)) => (s, n) }
    val z = ns.map { case (_, n) => math.sqrt(n.toDouble) }.sum
    val nTotal = ns.map(_._2).sum
    for ((s, n) <- ns) {
      val k = math.floor(nTotal * math.sqrt(n.toDouble) / z).toLong
      val got = bySource(s)._2
      // hash slotting resolves the k mod n remainder approximately;
      // base copies are exact, so the error is bounded by the
      // remainder bucket's binomial noise
      val tol = math.max(5.0, 4 * math.sqrt(n.toDouble))
      assert(math.abs(got - k) <= tol, s"$s: epoch copies $got vs target $k")
      assert(got >= (k / n) * n - tol, s"$s: base copies undershot")
    }
    // the recipe's point: copies-per-doc must be (weakly) larger for
    // smaller sources
    val smallest = ns.minBy(_._2)._1
    val largest = ns.maxBy(_._2)._1
    val perDoc = bySource.map { case (s, (n, c)) => s -> c.toDouble / n }
    assert(perDoc(smallest) >= perDoc(largest),
      s"upsampling inverted: $perDoc")
  }

  test("mix thresholds survive >= 2^31 rows per class (DECIMAL(38,0) headroom)") {
    // the threshold products take·2^32 (mixSources/endToEnd) and
    // (k % n)·2^32 (mixTemperature) wrap signed 64-bit once a class
    // holds >= 2^31 kept rows — reachable at 100 TB. All three route
    // the product through DECIMAL(38,0); assert the SQL form matches
    // the BigInt floor (and that the int64 form really would wrap) at
    // counts straddling the 2^31 boundary.
    val mod = BigInt(CurationOps.MixHashMod)
    for (take <- Seq(1L << 31, 3L * (1L << 30), 1L << 40);
         n <- Seq(take, take * 3 / 2)) {
      val expected = (BigInt(take) * mod / BigInt(n)).toLong
      val got = spark.sql(
        s"SELECT cast($take as decimal(38,0)) * ${CurationOps.MixHashMod} " +
        s"div $n AS thr").collect()(0).getLong(0)
      assert(got == expected, s"take=$take n=$n: got $got, want $expected")
      assert(BigInt(take * CurationOps.MixHashMod) != BigInt(take) * mod,
        s"take=$take no longer overflows int64 — test premise broken")
    }
  }

  test("sequence packing conserves tokens and fills bins contiguously") {
    val packed = CurationOps.packSequences(spark, sf).cache()
    try {
      val rows = packed.orderBy("doc_id").collect()
      assert(rows.nonEmpty)
      // offsets are in-range, spans are consistent with offset+len
      rows.foreach { r =>
        val nt = r.getLong(1); val off = r.getLong(3); val span = r.getLong(4)
        assert(off >= 0 && off < CurationOps.SeqLen)
        val expectSpan = (off + nt - 1) / CurationOps.SeqLen + 1
        assert(span == expectSpan, s"doc ${r.getLong(0)}: span $span != $expectSpan")
      }
      // consecutive docs are layout-adjacent: next start = prev start + len
      rows.sliding(2).foreach {
        case Array(a, b) =>
          val aStart = a.getLong(2) * CurationOps.SeqLen + a.getLong(3)
          val bStart = b.getLong(2) * CurationOps.SeqLen + b.getLong(3)
          assert(bStart == aStart + a.getLong(1),
            s"gap between docs ${a.getLong(0)} and ${b.getLong(0)}")
        case _ =>
      }
      // total layout length = total tokens
      val total = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
      val last = rows.last
      assert(last.getLong(2) * CurationOps.SeqLen + last.getLong(3) + last.getLong(1) == total)
    } finally { packed.unpersist(); () }
  }

  test("decontamination never flags the eval source itself") {
    val flagged = CurationOps.decontaminate(spark, sf)
    val evalIds = Engine.table(spark, sf, "documents")
      .filter(col("source") === "src0").select("doc_id")
    assert(flagged.join(evalIds, "doc_id").count() == 0)
    // and flags are real: every flagged doc shares at least one gram
    assert(flagged.filter(col("n_shared") <= 0).count() == 0)
  }

  test("familiarity is bounded by corpus size and positive") {
    val nDocs = Engine.table(spark, sf, "documents").count()
    val fam = CurationOps.ngramFamiliarity(spark, sf)
    val bad = fam.filter(col("familiarity") < 1.0 ||
      col("familiarity") > nDocs.toDouble).count()
    assert(bad == 0)
  }

  test("weighted sampling is PPS-biased, ranked correctly, and deterministic") {
    import graft.Engine
    val docs = Engine.table(spark, sf, "documents")
    val out = CurationOps.weightedSample(spark, sf).collect()
    val k = CurationOps.WeightedSampleK
    // structural: ranks are 1..min(k, n_lang) dense per language and
    // priorities non-decreasing in rank
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to sorted.length).toSeq,
        s"$lang ranks not dense")
      assert(sorted.length <= k)
      val prios = sorted.map(_.getLong(3)).toSeq
      assert(prios == prios.sorted, s"$lang priorities out of rank order")
    }
    // the PPS property: selection prefers heavy documents — the mean
    // weight of the sample must exceed the language's corpus mean
    // (u/w priorities: P(selected) grows with w)
    val corpusMean = docs.groupBy("lang")
      .agg(avg(greatest(col("n_chars"), lit(1L))).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
      assert(sampleMean > corpusMean(lang),
        s"$lang: sample mean $sampleMean not above corpus ${corpusMean(lang)}")
    }
    // deterministic: a second run is identical
    val again = CurationOps.weightedSample(spark, sf).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }
}
