package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("olsFit recovers exact coefficients of a noiseless plane") {
    // y = 7 + 3*x1 - 2*x2 exactly (integer grid): residuals are zero,
    // so the solve must return the plane and r2 = 1 to double precision
    val rows = for { x1 <- 0 to 20; x2 <- 0 to 20 }
      yield (x1.toLong, x2.toLong, 7L + 3 * x1 - 2 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val mod = Stats.olsFit(df, Seq(col("x1"), col("x2")), col("y"))
    assert(mod.n == 441)
    assert(math.abs(mod.coefs(0) - 7.0) < 1e-9)
    assert(math.abs(mod.coefs(1) - 3.0) < 1e-9)
    assert(math.abs(mod.coefs(2) + 2.0) < 1e-9)
    assert(math.abs(mod.r2 - 1.0) < 1e-12)
  }

  test("olsFit agrees with q146's inline Cramer solve on real data") {
    val li = Tables(spark, sf("sf0.001"), "lineitem").select(
      $"l_quantity".cast("long").as("x1"),
      round($"l_discount" * 100).cast("long").as("x2"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    val mod = Stats.olsFit(li, Seq($"x1", $"x2"), $"y")
    val q = graft.queries.Registry.queries("q146_ols_normal_eq")(
      spark, sf("sf0.001")).head()
    // q146 reports dollars (cents/100) at 6 decimals; the model is cents
    assert(math.abs(mod.coefs(0) / 100.0 - q.getAs[Double]("intercept")) < 1e-5)
    assert(math.abs(mod.coefs(1) / 100.0 - q.getAs[Double]("coef_qty")) < 1e-5)
    assert(math.abs(mod.coefs(2) - q.getAs[Double]("coef_disc")) < 1e-5)
    assert(math.abs(mod.r2 - q.getAs[Double]("r2")) < 1e-5)
  }

  test("olsFit rejects a singular design loudly") {
    val df = Seq((1L, 2L, 3L), (2L, 4L, 5L), (3L, 6L, 9L))
      .toDF("x1", "x2", "y") // x2 = 2*x1: collinear
    val e = intercept[IllegalArgumentException] {
      Stats.olsFit(df, Seq($"x1", $"x2"), $"y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("wilsonLower is within (0, p) and monotone in n at fixed p") {
    val df = Seq((80L, 100L), (800L, 1000L), (8L, 10L))
      .toDF("succ", "n")
      .select($"succ", $"n",
        Stats.wilsonLower($"succ", $"n", 1.96).as("lb"))
    val rows = df.collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // all bounds below the raw proportion, above zero
    rows.values.foreach { lb => assert(lb > 0.0 && lb < 0.8) }
    // more evidence at the same p̂ → tighter (larger) lower bound
    assert(rows(10L) < rows(100L) && rows(100L) < rows(1000L))
  }

  test("rankCorr: perfect monotone curve → spearman 1, pearson < 1") {
    // y = x³ is strictly monotone but curved: rank correlation must be
    // exactly 1 while the linear one stays visibly below it
    val df = (1L to 30L).map(x => (x, x * x * x)).toDF("x", "y")
    val r = Stats.rankCorr(df, "x", "y").head()
    assert(math.abs(r.getAs[Double]("spearman") - 1.0) < 1e-12)
    assert(r.getAs[Double]("pearson") < 0.95)
    assert(r.getAs[Long]("n") == 30)
  }

  test("rankCorr averages tied ranks (textbook 3-point case)") {
    // x = (1,1,2) → tie-averaged x-ranks (1.5, 1.5, 3); y strictly
    // increasing → ranks (1,2,3); hand-computed ρ = 1.5/√3 ≈ 0.8660
    val df = Seq((1L, 5L), (1L, 7L), (2L, 9L)).toDF("x", "y")
    val r = Stats.rankCorr(df, "x", "y").head()
    assert(math.abs(r.getAs[Double]("spearman") - 1.5 / math.sqrt(3.0)) < 1e-12)
  }

  test("doubledAvgRanks two-pass prefix equals the single-window reference") {
    // 10k distinct values with skewed tie counts, forced through MANY
    // range partitions — the composed (offset + local cumsum) ranks must
    // match the naive global definition exactly
    val rnd = new scala.util.Random(11)
    val hist = (1 to 10000).map(v => (v.toLong * 3, 1L + rnd.nextInt(7)))
    val got = Stats.doubledAvgRanks(
        hist.toDF("v", "n").repartition(13), "v", "n")
      .select($"v", $"r2").as[(Long, Long)].collect().toMap
    var below = 0L
    hist.sortBy(_._1).foreach { case (v, n) =>
      val want = 2L * below + n + 1
      assert(got(v) == want, s"v=$v: got ${got(v)}, want $want")
      below += n
    }
  }

  test("ksTwoSample: hand-computed D and argmax with tiebreak") {
    // A = {1,1,2,3}, B = {2,3,3,4}: ECDF gaps peak at 0.5 twice
    // (v=1 and v=2) — the reported location must be the SMALLER value
    val df = (Seq(1L, 1L, 2L, 3L).map(("A", _)) ++
      Seq(2L, 3L, 3L, 4L).map(("B", _))).toDF("g", "v")
    val r = Stats.ksTwoSample(df, "v", col("g") === "A").head()
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
    assert(math.abs(r.getAs[Double]("ks_d") - 0.5) < 1e-12)
    assert(r.getAs[Long]("at_v") == 1L)
  }

  test("mannWhitney: textbook no-tie and tie-corrected cases") {
    // A = {1,2}, B = {3,4}: R_A = 3, U_A = 0, z = -2/sqrt(20/12),
    // r_rb = -1 (complete separation)
    val d1 = (Seq(1L, 2L).map(("A", _)) ++ Seq(3L, 4L).map(("B", _)))
      .toDF("g", "v")
    val r1 = Stats.mannWhitney(d1, "v", col("g") === "A").head()
    assert(r1.getAs[Double]("u_a") == 0.0)
    assert(math.abs(r1.getAs[Double]("z") - (-2.0 / math.sqrt(20.0 / 12.0))) < 1e-12)
    assert(r1.getAs[Double]("r_rb") == -1.0)
    // A = {1,1}, B = {1,2}: tie group t=3 at v=1 → avg rank 2, R_A = 4,
    // U_A = 1; tie term T = 24 → sigma² = (4/12)(5 - 24/12) = 1, z = -1
    val d2 = (Seq(1L, 1L).map(("A", _)) ++ Seq(1L, 2L).map(("B", _)))
      .toDF("g", "v")
    val r2 = Stats.mannWhitney(d2, "v", col("g") === "A").head()
    assert(r2.getAs[Double]("u_a") == 1.0)
    assert(math.abs(r2.getAs[Double]("z") - (-1.0)) < 1e-12)
  }

  test("ksTwoSample is zero on identical samples") {
    val df = (Seq(1L, 2L, 3L).map(("A", _)) ++ Seq(1L, 2L, 3L).map(("B", _)))
      .toDF("g", "v")
    val r = Stats.ksTwoSample(df, "v", col("g") === "A").head()
    assert(r.getAs[Double]("ks_d") == 0.0)
  }

  test("equi-depth buckets hold near-equal counts") {
    val out = graft.queries.Registry.queries("q149_equidepth_hist")(
      spark, sf("sf0.001")).collect()
    assert(out.length == 8)
    val counts = out.map(_.getAs[Long]("cnt"))
    val n = counts.sum
    // each bucket within 2% of n/8 (ties on the cent grid shift a few)
    counts.foreach { c =>
      assert(math.abs(c - n / 8.0) < 0.02 * n, counts.mkString(","))
    }
    // bucket ranges are ordered and non-overlapping
    val byBucket = out.sortBy(_.getAs[Int]("bucket"))
    byBucket.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
  }

  test("CUSUM prefix-sum identity equals Page's recursion, including the zero floor") {
    // the q202 shape: S_t = max(0, S_{t-1} + x_t) computed as
    // P_t - min(0, min_{j<=t} P_j). The min MUST include the virtual
    // P_0 = 0 - without it a positive first term zeroes S_1 (the
    // review-found bug both engines shared, invisible to the oracle).
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // first term positive (exercises the floor), deep negative run
    // (exercises the max-0 reset), then recovery
    val xs = Seq(5L, -3L, -10L, 4L, 8L, -2L, 20L)
    var s = 0L
    val want = xs.map { x => s = math.max(0L, s + x); s }
    val w = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("t", "x")
      .withColumn("p", sum($"x").over(w))
      .withColumn("s", $"p" - least(lit(0L), min($"p").over(w)))
      .orderBy($"t").select($"s").as[Long].collect().toSeq
    assert(got == want, s"identity diverged from the recursion: $got vs $want")
  }

  test("q201 Poisson thresholds equal the factorial series, and draws hit the pmf") {
    // Independent derivation of the five inverse-CDF cuts: the oracle
    // MIRRORS the query's hard-coded thresholds, so a shared misreading
    // would pass both sides — this recomputes ⌊CDF_Poisson(1)(k)·1e6⌋
    // from e⁻¹·Σ 1/i! and asserts the registered constant.
    var fact = 1.0
    var cdf = 0.0
    val want = (0 to 4).map { k =>
      if (k > 0) fact *= k
      cdf += math.exp(-1.0) / fact
      math.floor(cdf * 1e6).toLong
    }
    assert(graft.queries.PipelineQueries.Poisson1CdfMicro == want,
      s"thresholds diverge from the factorial series: want $want")
    // replicate-frequency sanity: the md5-slice draw (the q201
    // construction, reproduced here over java.security.MessageDigest —
    // no Spark in the loop) must land each weight near Poisson(1) pmf
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Long](7)
    val n = 40000
    for (id <- 0 until n / 4; g <- 0 to 0) {
      val hex = md.digest(s"spec:$g:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      for (s <- 0 to 3) {
        val u = java.lang.Long.parseLong(hex.substring(s * 7, s * 7 + 7), 16) % 1000000L
        val w = want.indexWhere(u < _) match { case -1 => 5; case k => k }
        counts(w) += 1
      }
    }
    val pmf = Seq(0.367879, 0.367879, 0.183940, 0.061313, 0.015328)
    pmf.zipWithIndex.foreach { case (p, k) =>
      val gotP = counts(k).toDouble / n
      assert(math.abs(gotP - p) < 0.01,
        s"weight $k frequency $gotP vs Poisson(1) pmf $p")
    }
  }

  test("kaplanMeier reproduces the published 6-MP trial survival values") {
    // Freireich et al. 1963, the 6-MP arm — THE textbook Kaplan-Meier
    // dataset (21 subjects, * = censored): the q207 oracle mirrors the
    // operator's construction, so this pins the estimator against
    // literature constants instead
    val times = Seq(
      (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
      (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
      (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0))
    val per = times.map { case (t, e) => (t, e.toLong) }.toDF("life", "ev")
    val got = Stats.kaplanMeier(per)
      .select($"t_days", $"n_events", $"at_risk", $"surv")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = Seq( // published S(t) at the seven event times
      (6L, 3L, 21L, 0.857143), (7L, 1L, 17L, 0.806723),
      (10L, 1L, 15L, 0.752941), (13L, 1L, 12L, 0.690196),
      (16L, 1L, 11L, 0.627451), (22L, 1L, 7L, 0.537815),
      (23L, 1L, 6L, 0.448179))
    assert(got == want, s"KM curve diverged from the published values:\n$got")
  }

  test("nelsonAalen: literal 6-MP hand fold; exp(-H) dominates the KM curve") {
    // same Freireich 6-MP arm as the KM pin. (1) definitional fold:
    // H(t) = Σ d/n accumulated by a plain loop over the published risk
    // table — (3/21, 1/17, 1/15, 1/12, 1/11, 1/7, 1/6). (2) the
    // Fleming-Harrington survival exp(−H) must dominate Kaplan-Meier
    // at every event time (exp(−x) ≥ 1−x factor-wise) — an ORDER
    // relation between two independently-computed curves, immune to a
    // shared construction slip.
    val times = Seq(
      (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
      (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
      (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0))
    val per = times.map { case (t, e) => (t, e.toLong) }.toDF("life", "ev")
    val got = Stats.nelsonAalen(per)
      .select($"t_days", $"n_events", $"at_risk", $"cum_haz", $"surv_fh")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val steps = Seq((6, 3, 21), (7, 1, 17), (10, 1, 15), (13, 1, 12),
      (16, 1, 11), (22, 1, 7), (23, 1, 6))
    var h = 0.0
    steps.zip(got).foreach { case ((t, d, n), (gt, gd, gn, gh, _)) =>
      h += d.toDouble / n
      assert(gt == t && gd == d && gn == n, s"risk table diverged: $got")
      assert(math.abs(gh - h) < 2e-6, s"t=$t: H $gh vs hand $h")
    }
    val km = Stats.kaplanMeier(per)
      .select($"t_days", $"surv").as[(Long, Double)].collect().toMap
    got.foreach { case (t, _, _, _, sfh) =>
      assert(sfh >= km(t) - 1e-9,
        s"t=$t: Fleming-Harrington $sfh must dominate KM ${km(t)}")
    }
  }

  test("isotonicFit pools violators and reproduces hand-computed PAVA fits") {
    // rates (0.4, 0.2, 0.3) with equal weights: PAVA pools all three to
    // 0.3; rates (0.1, 0.5, 0.3, 0.7): the middle pair pools to 0.4
    val v1 = Seq((1L, 10L, 4L), (2L, 10L, 2L), (3L, 10L, 3L))
      .toDF("ord", "n", "events")
    val got1 = Stats.isotonicFit(v1, "ord", "n", "events")
      .select($"ord", $"iso").as[(Long, Double)].collect().toSeq
    assert(got1 == Seq((1L, 0.3), (2L, 0.3), (3L, 0.3)),
      s"full pool diverged: $got1")
    val v2 = Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 3L), (4L, 10L, 7L))
      .toDF("ord", "n", "events")
    val got2 = Stats.isotonicFit(v2, "ord", "n", "events")
      .select($"ord", $"rate", $"iso").as[(Long, Double, Double)]
      .collect().toSeq
    assert(got2 == Seq((1L, 0.1, 0.1), (2L, 0.5, 0.4), (3L, 0.3, 0.4),
      (4L, 0.7, 0.7)), s"middle-pair pool diverged: $got2")
    // weighted merge: (w=1, r=1.0) then (w=3, r=0.0) pools to 0.25
    val v3 = Seq((1L, 1L, 1L), (2L, 3L, 0L)).toDF("ord", "n", "events")
    val got3 = Stats.isotonicFit(v3, "ord", "n", "events")
      .select($"iso").as[Double].collect().toSeq
    assert(got3 == Seq(0.25, 0.25), s"weighted pool diverged: $got3")
    // an already-monotone input is returned unchanged
    val v4 = Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 9L))
      .toDF("ord", "n", "events")
    val got4 = Stats.isotonicFit(v4, "ord", "n", "events")
      .select($"rate", $"iso").as[(Double, Double)].collect().toSeq
    assert(got4.forall(r => r._1 == r._2),
      s"monotone input must be a fixed point: $got4")
  }

  test("isotonicFit invariants: nondecreasing, mean-preserving, guards loud") {
    // pseudo-random but deterministic bin frame
    val rows = (1 to 40).map { i =>
      val w = 1L + (i * 7) % 13
      (i.toLong, w, (i * 31) % (w + 1))
    }
    val df = rows.toDF("ord", "n", "events")
    val iso = Stats.isotonicFit(df, "ord", "n", "events")
      .select($"ord", $"n", $"iso").as[(Long, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    iso.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3 + 1e-12, s"fit must be nondecreasing: $a -> $b")
    }
    // PAVA preserves the weighted mean (each pool keeps its own mass);
    // rounding at 1e-6 bounds the drift by 5e-7 per bin
    val mw = iso.map { case (_, w, v) => w * v }.sum / rows.map(_._2).sum
    val raw = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(math.abs(mw - raw) < 1e-5, s"weighted mean must be preserved: $mw vs $raw")
    // loud contracts: empty, oversized, and malformed bins
    intercept[IllegalArgumentException] {
      Stats.isotonicFit(Seq.empty[(Long, Long, Long)]
        .toDF("ord", "n", "events"), "ord", "n", "events")
    }
    intercept[IllegalArgumentException] {
      Stats.isotonicFit(Seq((1L, 0L, 0L)).toDF("ord", "n", "events"),
        "ord", "n", "events")
    }
  }

  test("gini matches hand-computed values, including the tie-block algebra") {
    // {1,2,3,4}: sample Gini 0.25; {0,0,0,10}: (n-1)/n = 0.75; all-equal: 0
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 0L), ("b", 0L), ("b", 0L), ("b", 10L),
      ("c", 7L), ("c", 7L), ("c", 7L)
    ).toDF("g", "cents")
    val got = Stats.gini(df, Seq("g"), "cents")
      .select($"g", $"n", $"sum_cents", $"gini")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("a", 4L, 10L, 0.25), ("b", 4L, 10L, 0.75),
      ("c", 3L, 21L, 0.0)), s"hand Gini diverged: $got")
    // block algebra == row_number algebra on a tied multiset: {2,2,2,5,5}
    // ranks sum per formula: 2*(1+2+3) + 5*(4+5) = 57; n=5, sx=16
    // G = 114/80 - 6/5 = 0.225
    val tied = Seq(("t", 2L), ("t", 2L), ("t", 2L), ("t", 5L), ("t", 5L))
      .toDF("g", "cents")
    val r = Stats.gini(tied, Seq("g"), "cents")
      .select($"gini").as[Double].head()
    assert(r == 0.225, s"tie-block rank sum diverged: $r")
  }

  test("gini contracts: all-zero group is NULL, negative cents raise") {
    val zeros = Seq(("z", 0L), ("z", 0L)).toDF("g", "cents")
    val rz = Stats.gini(zeros, Seq("g"), "cents").head()
    assert(rz.isNullAt(rz.fieldIndex("gini")),
      s"all-zero group must yield NULL gini: $rz")
    val neg = Seq(("n", 5L), ("n", -1L)).toDF("g", "cents")
    val ex = intercept[Exception] {
      Stats.gini(neg, Seq("g"), "cents").collect()
    }
    assert(ex.getMessage.contains("gini") ||
      Option(ex.getCause).exists(_.getMessage.contains("gini")),
      s"expected the negative-cents guard, got: ${ex.getMessage}")
  }

  test("logRank reproduces the published 6-MP vs placebo trial statistic") {
    // Freireich et al. 1963, BOTH arms this time: 6-MP (grp=1, the
    // kaplanMeier fixture above) against placebo (21 subjects, all
    // events). The published two-group log-rank is chi2 = 16.79 with
    // O1 = 9, E1 = 19.25 — a literature pin independent of the q220
    // oracle, which mirrors the operator's own construction
    val mp6 = Seq(
      (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
      (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
      (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0))
      .map { case (t, e) => (t.toLong, e.toLong, 1L) }
    val plac = Seq(1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8, 11, 11, 12,
      12, 15, 17, 22, 23).map(t => (t.toLong, 1L, 0L))
    val r = Stats.logRank((mp6 ++ plac).toDF("life", "ev", "grp")).head()
    assert(r.getAs[Long]("n0") == 21 && r.getAs[Long]("n1") == 21)
    assert(r.getAs[Long]("o1") == 9, s"6-MP arm observed events: $r")
    assert(r.getAs[Double]("e1") == 19.250501 &&
      r.getAs[Double]("v1") == 6.256961,
      s"nano-quantized hypergeometric folds diverged: $r")
    assert(math.abs(r.getAs[Double]("chi2") - 16.79) < 0.01,
      s"published 6-MP log-rank chi2 is 16.79: $r")
  }

  test("logRank emits NULL chi2 by contract on zero-variance cohorts") {
    // every subject in one group: n1_at == n_at at every event time, so
    // each variance term is 0 — the guard must yield NULL, not NaN/inf
    val oneGroup = Seq((5L, 1L, 1L), (6L, 1L, 1L), (7L, 0L, 1L))
      .toDF("life", "ev", "grp")
    val r = Stats.logRank(oneGroup).head()
    assert(r.getAs[Long]("n0") == 0 && r.getAs[Long]("n1") == 3)
    assert(r.isNullAt(r.fieldIndex("chi2")),
      s"degenerate cohort must yield NULL chi2: $r")
    // no events at all: the term sums themselves are NULL — same contract
    val noEv = Seq((5L, 0L, 1L), (6L, 0L, 0L)).toDF("life", "ev", "grp")
    val r2 = Stats.logRank(noEv).head()
    assert(r2.isNullAt(r2.fieldIndex("chi2")),
      s"event-free cohort must yield NULL chi2: $r2")
  }

  test("clusterAri matches the Hubert-Arabie hand example and its boundary cases") {
    // clusters {1,2,3},{4,5},{6} vs labels {1,2},{3,4,5},{6}:
    // sum C(n_ij,2) = 2, p_a = 4, p_b = 4, C(6,2) = 15
    // ARI = (2 - 16/15) / (4 - 16/15) = 0.318182
    val lab = Seq((1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
      (4, "b", "y"), (5, "b", "y"), (6, "c", "z"))
      .toDF("id", "cl", "lb")
    val r = Stats.clusterAri(lab, "cl", "lb")
      .select($"n", $"n_clusters", $"n_labels", $"p_ij", $"p_a", $"p_b", $"ari")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()(0)
    assert(r == ((6L, 3L, 3L, 2L, 4L, 4L, 0.318182)),
      s"hand-computed ARI diverged: $r")
    // identical partitions -> ARI exactly 1
    val same = Seq((1, "a"), (2, "a"), (3, "b"), (4, "b"))
      .toDF("id", "cl").withColumn("lb", $"cl")
    assert(Stats.clusterAri(same, "cl", "lb")
      .select($"ari").as[Double].collect()(0) == 1.0)
  }

  test("clusterAri survives marginal products past Long.MaxValue (decimal widening)") {
    import org.apache.spark.sql.functions._
    // 120k rows, ONE cluster, labels split 60k/60k:
    //   p_a = C(120000,2) = 7,199,940,000   p_b = 2*C(60000,2) = 3,599,940,000
    //   p_a * p_b ~ 2.6e19 > Long.MaxValue — the pre-widening LONG product
    //   wrapped to ~7.5e18, driving expct to ~1.04e9 and ARI to ~0.587.
    // With one cluster, expct = p_a*p_b/C(n,2) = p_b = p_ij exactly, so the
    //   true ARI is 0 — a wraparound anywhere shows up as a huge shift.
    val lab = spark.range(120000L)
      .select($"id", lit("a").as("cl"),
        when($"id" < 60000L, "x").otherwise("y").as("lb"))
    val r = Stats.clusterAri(lab, "cl", "lb")
      .select($"p_a", $"p_b", $"p_ij", $"ari")
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(r._1 == 7199940000L && r._2 == 3599940000L && r._3 == 3599940000L,
      s"pair counts diverged: $r")
    assert(r._4 == 0.0, s"one-cluster ARI must be exactly 0 (got ${r._4})")
  }

  test("msprtMonitor: injected shift rejects, symmetric A/A never does") {
    // synthetic 30-day two-arm stream in cents: arms identical except a
    // +20%-of-mean treatment shift in the effect case. Moments are exact
    // integers; tau2 matched to the effect scale.
    def daily(shift: Long) = (1 to 30).map { d =>
      val nt = 200L; val nc = 200L
      val mt = 10000L + shift; val mc = 10000L
      // per-arm sum and pooled sum-of-squares for a two-point spread
      // (half the arm at mean-1000, half at mean+1000): variance 1e6
      val st = nt * mt; val sc = nc * mc
      val ss = BigDecimal(nt / 2 * ((mt - 1000) * (mt - 1000) + (mt + 1000) * (mt + 1000)) +
        nc / 2 * ((mc - 1000) * (mc - 1000) + (mc + 1000) * (mc + 1000)))
      (d, nt, st, nc, sc, ss)
    }.toDF("day", "nt", "st", "nc", "sc", "ss")
      .withColumn("ss", $"ss".cast("decimal(38,0)"))
    val tau2 = 1e6
    val eff = Stats.msprtMonitor(daily(2000L), tau2)
      .select($"day", $"reject").as[(Int, Int)].collect()
    assert(eff.exists(_._2 == 1),
      s"a 20% mean shift must eventually reject: ${eff.takeRight(5).toSeq}")
    // once rejected, the always-valid p is monotone: rejection persists
    val firstRej = eff.indexWhere(_._2 == 1)
    assert(eff.drop(firstRej).forall(_._2 == 1), "rejection must persist")
    val aa = Stats.msprtMonitor(daily(0L), tau2)
      .select($"reject").as[Int].collect()
    assert(aa.forall(_ == 0), "the symmetric A/A stream must never reject")
  }

  test("q225 Theil-Sen/Mann-Kendall: a literal O(n²) loop reproduces the query") {
    // Independent-identity pin (the q202/q223 pattern): the DuckDB oracle
    // mirrors q225's construction, so a shared misreading of the MK
    // variance or the continuity correction would pass both engines.
    // This recomputes S, the tie-corrected variance, z, and the exact
    // median-of-slopes from DEFINITIONS — a plain pairwise loop over the
    // collected daily series — and asserts the query's outputs.
    val ser = Tables(spark, sf("sf0.001"), "orders")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .groupBy(datediff($"o_orderdate", lit("1996-01-01")).cast("long").as("day"))
      .agg(graft.operators.Relational.centsSum($"o_totalprice").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = ser.length
    assert(n > 100, s"fixture sanity: expected a dense 1996 calendar, got $n days")
    var sStat = 0L
    val slopes = Array.newBuilder[Double]
    for (i <- 0 until n; j <- (i + 1) until n) {
      val dc = ser(j)._2 - ser(i)._2
      sStat += java.lang.Long.signum(dc)
      slopes += dc.toDouble / (ser(j)._1 - ser(i)._1).toDouble
    }
    val sorted = slopes.result().sorted
    // Spark exact Percentile / DuckDB median: linear interpolation at
    // rank p·(m−1) — identical formula on both engines
    val pos = 0.5 * (sorted.length - 1)
    val lo = pos.toInt
    val sen = if (pos == lo) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    val tt = ser.groupBy(_._2).valuesIterator.map(_.length.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n.toLong - 1) * (2L * n + 5) - tt) / 18.0
    val z = if (sStat > 0) (sStat - 1) / math.sqrt(varS)
      else if (sStat < 0) (sStat + 1) / math.sqrt(varS) else 0.0
    val row = graft.queries.Registry.queries("q225_theil_sen")(
      spark, sf("sf0.001")).head()
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("s_stat") == sStat)
    assert(math.abs(row.getAs[Double]("var_s") - varS) < 1e-5)
    assert(math.abs(row.getAs[Double]("z_mk") - z) < 2e-6)
    assert(math.abs(row.getAs[Double]("sen_slope") - sen) < 2e-6)
  }

  test("q227: stratified ATE coincides with saturated-propensity IPW") {
    // Cochran/Rosenbaum-Rubin identity: with the SATURATED per-stratum
    // propensity e_s = n1s/ns, the Horvitz-Thompson IPW estimator
    // collapses algebraically to the stratum-size-weighted mean
    // difference. Pinned two ways: (1) literal Scala folds of both
    // estimators on synthetic strata (unequal sizes, a degenerate
    // no-control stratum that must be EXCLUDED by both paths) agree to
    // 1e-9 before any rounding; (2) the real query's two per-engine
    // float paths (5-term stratum fold vs per-row weighted sum) land on
    // the same rounded cents.
    val rows = Seq(
      ("A", 1, 10000L), ("A", 1, 14000L), ("A", 0, 9000L), ("A", 0, 11000L),
      ("B", 1, 30000L), ("B", 0, 25000L), ("B", 0, 27000L),
      ("C", 1, 5000L), ("C", 1, 7000L), ("C", 1, 6000L), ("C", 0, 4000L),
      ("D", 1, 99900L), ("D", 1, 88800L)) // no control arm → excluded
    val kept = rows.groupBy(_._1).filter { case (_, rs) =>
      rs.exists(_._2 == 1) && rs.exists(_._2 == 0) }
    assert(!kept.contains("D"))
    val nk = kept.valuesIterator.map(_.size).sum.toDouble
    val strat = kept.valuesIterator.map { rs =>
      val y1 = rs.filter(_._2 == 1).map(_._3)
      val y0 = rs.filter(_._2 == 0).map(_._3)
      rs.size * (y1.sum.toDouble / y1.size - y0.sum.toDouble / y0.size)
    }.sum / nk
    val ipw = kept.valuesIterator.flatMap { rs =>
      val ns = rs.size.toDouble
      val n1 = rs.count(_._2 == 1).toDouble
      rs.map { case (_, tr, y) =>
        if (tr == 1) y * (ns / n1) else -y * (ns / (ns - n1)) }
    }.sum / nk
    assert(math.abs(strat - ipw) < 1e-9, s"identity broke: $strat vs $ipw")
    val row = graft.queries.Registry.queries("q227_stratified_ipw")(
      spark, sf("sf0.001")).head()
    assert(row.getAs[Double]("ate_strat") == row.getAs[Double]("ate_ipw"),
      "the two float paths must land on the same rounded cents")
  }

  test("anovaF equals a literal deviation-loop computation; degenerate designs are NULL") {
    // Independent-identity pin: the operator computes SSB/SSW through
    // the moment algebra Σs_g²/n_g − S²/N; this recomputes them from
    // the DEFINITION — group means and squared deviations in plain
    // loops — so a misread decomposition cannot pass both paths.
    val data = Seq(("a", 6L), ("a", 8L), ("a", 4L), ("a", 5L), ("a", 3L), ("a", 4L),
      ("b", 8L), ("b", 12L), ("b", 9L), ("b", 11L), ("b", 6L), ("b", 8L),
      ("c", 13L), ("c", 9L), ("c", 11L), ("c", 8L), ("c", 7L), ("c", 12L))
    val row = Stats.anovaF(data.toDF("g", "y"), $"g", $"y").head()
    val grand = data.map(_._2).sum.toDouble / data.size
    val byG = data.groupBy(_._1).values
    val ssb = byG.map { rs =>
      val m = rs.map(_._2).sum.toDouble / rs.size
      rs.size * (m - grand) * (m - grand) }.sum
    val ssw = byG.flatMap { rs =>
      val m = rs.map(_._2).sum.toDouble / rs.size
      rs.map(r => (r._2 - m) * (r._2 - m)) }.sum
    val f = (ssb / (3 - 1)) / (ssw / (data.size - 3))
    assert(row.getAs[Long]("k") == 3 && row.getAs[Long]("n") == 18)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 2e-6,
      s"F diverged: ${row.getAs[Double]("f_stat")} vs $f")
    assert(math.abs(row.getAs[Double]("eta2") - ssb / (ssb + ssw)) < 2e-6)
    // degenerate contracts: one group → NULL F; zero within-variance → NULL F
    val one = Stats.anovaF(Seq(("a", 1L), ("a", 2L)).toDF("g", "y"),
      $"g", $"y").head()
    assert(one.isNullAt(one.fieldIndex("f_stat")))
    val flat = Stats.anovaF(Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .toDF("g", "y"), $"g", $"y").head()
    assert(flat.isNullAt(flat.fieldIndex("f_stat")))
  }

  test("signFlipTest hits its exact endpoints: min-p on a shift, p=1 antithetic") {
    // Deterministic endpoint pins — both are EXACT consequences of the
    // construction, no tolerance needed. (1) all differences +100:
    // |T_b| = 100·|#plus − #minus| < 36,500 = T_obs for every b unless
    // the md5 bits all agree (impossible over 365 keys), so
    // n_extreme = 0 and p = 1/257. (2) an exactly antithetic frame
    // (d and −d for every key pair): T_obs = 0, so every replicate
    // satisfies |T_b| ≥ 0 and p = 1.
    val shift = (1 to 365).map(d => (d.toLong, 100L)).toDF("k", "diff")
    val r1 = Stats.signFlipTest(shift, $"k", $"diff", b = 256, salt = "t").head()
    assert(r1.getAs[Long]("t_obs") == 36500L)
    assert(r1.getAs[Long]("n_extreme") == 0L,
      s"a uniform shift must be the most extreme statistic: $r1")
    assert(r1.getAs[Double]("p_value") == math.rint(1e6 / 257.0) / 1e6)
    val anti = (1 to 100).flatMap(d =>
      Seq((d.toLong, d * 7L), (1000L + d, -d * 7L))).toDF("k", "diff")
    val r2 = Stats.signFlipTest(anti, $"k", $"diff", b = 256, salt = "t").head()
    assert(r2.getAs[Long]("t_obs") == 0L)
    assert(r2.getAs[Long]("n_extreme") == 256L)
    assert(r2.getAs[Double]("p_value") == 1.0)
  }

  test("q240 weighted quartiles: literal walk replay; weights=1 degenerates to the lower median") {
    // (1) definitional replay on real data: sort the collected
    // (cents, qty) pairs, walk cumulative weights, pick
    // min{v : 4·F ≥ k·W} — plain loops vs the window construction.
    val rows = Tables(spark, sf("sf0.001"), "lineitem")
      .select(round($"l_extendedprice" * 100).cast("long").as("c"),
        $"l_quantity".cast("long").as("q"))
      .as[(Long, Long)].collect()
    val hist = rows.groupBy(_._1).map { case (c, rs) => (c, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val tw = hist.map(_._2).sum
    def pick(num: Long, den: Long): Long = {
      var cum = 0L
      hist.find { case (_, w) => cum += w; cum * den >= tw * num }.get._1
    }
    val row = graft.queries.Registry.queries("q240_weighted_quartiles")(
      spark, sf("sf0.001")).head()
    assert(row.getAs[Long]("total_w") == tw)
    assert(row.getAs[Long]("wp25_cents") == pick(1, 4))
    assert(row.getAs[Long]("wmed_cents") == pick(1, 2))
    assert(row.getAs[Long]("wp75_cents") == pick(3, 4))
    // (2) with unit weights the weighted median IS the lower median
    val vals = Seq(10L, 40L, 20L, 50L, 30L)
    var cum = 0L
    val med = vals.sorted.find { v => cum += 1; cum * 2 >= vals.size }.get
    assert(med == 30L, "odd-count lower median sanity")
  }

  test("q241 ABC: a literal sort-and-classify replay reproduces the classes") {
    val byPart = Tables(spark, sf("sf0.001"), "lineitem")
      .groupBy($"l_partkey")
      .agg(graft.operators.Relational.centsSum($"l_extendedprice").as("c"))
      .as[(Long, Long)].collect()
    val sorted = byPart.sortBy { case (k, c) => (-c, k) }
    val t = sorted.map(_._2).sum
    var cum = 0L
    val classed = sorted.map { case (_, c) =>
      cum += c
      val cl = if (cum * 100 <= t * 80) "A"
        else if (cum * 100 <= t * 95) "B" else "C"
      (cl, c)
    }
    val want = classed.groupBy(_._1).map { case (cl, rs) =>
      val sc = rs.map(_._2).sum
      (cl, rs.length.toLong, sc, math.rint(sc.toDouble / t * 1e6) / 1e6)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Registry.queries("q241_abc_analysis")(
      spark, sf("sf0.001")).as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want, s"ABC classes diverged:\n$got\n$want")
    // structural invariants (true for ANY revenue distribution — this
    // synthetic catalog is near-uniform, so no Pareto-skew assumption):
    // class A's cumulative share is capped at 80% by construction,
    // A+B at 95%, and the three shares partition the total
    val m = got.map(r => r._1 -> r).toMap
    assert(m("A")._4 <= 0.800001, s"A share must respect the 80% cutoff: $got")
    assert(m("A")._4 + m("B")._4 <= 0.950002, s"A+B must respect 95%: $got")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5, s"shares must partition: $got")
    assert(got.map(_._3).sum == t, "class cents must sum to the total exactly")
  }

  test("q242 elasticity: literal nano-quantized fold; planted log-log slope recovered") {
    // (1) replay on real data: java Math.log IS Spark's log, so the
    // nano quantization and the slope fold reproduce exactly
    val rows = Tables(spark, sf("sf0.001"), "lineitem")
      .join(broadcast(Tables(spark, sf("sf0.001"), "part")
        .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_extendedprice".cast("double"),
        $"l_quantity".cast("double"))
      .as[(String, Double, Double)].collect()
    val want = rows.groupBy(_._1).map { case (b, rs) =>
      val xy = rs.map { case (_, p, q) =>
        (math.round(math.log(p / q) * 1e9), math.round(math.log(q) * 1e9)) }
      val n = BigInt(xy.length)
      val sx = xy.map(v => BigInt(v._1)).sum
      val sy = xy.map(v => BigInt(v._2)).sum
      val sxx = xy.map(v => BigInt(v._1) * v._1).sum
      val sxy = xy.map(v => BigInt(v._1) * v._2).sum
      val den = n * sxx - sx * sx
      b -> (if (den > 0)
        Some(math.rint((n * sxy - sx * sy).toDouble / den.toDouble * 1e6) / 1e6)
      else None)
    }
    val got = graft.queries.Registry.queries("q242_price_elasticity")(
        spark, sf("sf0.001")).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    want.foreach { case (b, w) =>
      assert(got(b) == w, s"brand $b: ${got(b)} vs replay $w") }
    // (2) planted slope: qty chosen so ln(qty) = 3 − 2·ln(unit price)
    // EXACTLY on a price grid → elasticity −2 to quantization precision
    val planted = (1 to 50).map { i =>
      val lnQ = 3.0 - 2.0 * (i * 0.05)
      (math.exp(lnQ), i * 0.05) // (qty, ln unit price)
    }
    val pxy = planted.map { case (q, lup) =>
      (math.round(lup * 1e9), math.round(math.log(q) * 1e9)) }
    val n = BigInt(pxy.length)
    val sx = pxy.map(v => BigInt(v._1)).sum
    val sy = pxy.map(v => BigInt(v._2)).sum
    val sxx = pxy.map(v => BigInt(v._1) * v._1).sum
    val sxy = pxy.map(v => BigInt(v._1) * v._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.abs(slope + 2.0) < 1e-6, s"planted elasticity -2, got $slope")
  }

  test("q226 RFM: a literal sorted-rank quintile replay reproduces the segments") {
    // Definitional replay (the q225 pattern): the DuckDB oracle mirrors
    // the engine-side construction, so a shared slip — swapped
    // dimensions, the un-reversed R score, a misread quantile rank —
    // would pass both engines. This recomputes quantile_cont from its
    // sorted-array DEFINITION (rank p·(n−1), linear interpolation),
    // scores from the textbook convention (R reversed: most recent = 5),
    // rolls the segments up with plain Scala folds, and asserts the
    // query's rows EXACTLY. The cutpoint compare (strict >) and the
    // ×5 integerization are contract, shared deliberately.
    val rfm = Tables(spark, sf("sf0.001"), "orders")
      .groupBy($"o_custkey")
      .agg(datediff(lit("2001-08-02"), max($"o_orderdate")).cast("long").as("r"),
        count(lit(1)).as("f"),
        graft.operators.Relational.centsSum($"o_totalprice").as("m"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rfm.size > 50, s"fixture sanity: ${rfm.size} customers")
    def cuts5(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map { p =>
        val pos = p * (s.length - 1)
        val lo = pos.toInt
        val v = if (pos == lo) s(lo).toDouble
          else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
        math.round(v * 5)
      }
    }
    val (rc, fc, mc) = (cuts5(rfm.map(_._2)), cuts5(rfm.map(_._3)), cuts5(rfm.map(_._4)))
    def sc(x: Long, cuts: Seq[Long]): Int = cuts.count(c => x * 5 > c)
    val want = rfm.groupBy { case (_, r, f, m) =>
        (5 - sc(r, rc), 1 + sc(f, fc), 1 + sc(m, mc)) }
      .map { case ((r, f, m), rows) =>
        (r, f, m, rows.size.toLong, rows.map(_._4).sum / rows.size) }
      .toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = graft.queries.Registry.queries("q226_rfm_segments")(
        spark, sf("sf0.001"))
      .as[(Int, Int, Int, Long, Long)].collect().toSeq
    assert(got == want,
      s"segments diverged from the definitional replay (first: " +
        s"${got.take(3)} vs ${want.take(3)})")
  }

  test("bhStepUp matches the BH 1995 textbook example and rescues earlier ranks") {
    // Benjamini & Hochberg JRSS-B 1995 §4, the original 15-p-value
    // family at alpha = 0.05: the step-up rejects EXACTLY the four
    // smallest (p4 = .0095 <= 4/300 while p5 = .0201 > 5/300).
    val pn = Seq(1L, 4L, 19L, 95L, 201L, 278L, 298L, 344L, 459L,
      3240L, 4262L, 5719L, 6528L, 7590L, 10000L)
    val tests = pn.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "pn")
      .repartition(2) // block ConvertToLocalRelation (plan-shape realism)
    val r = Stats.bhStepUp(tests, $"pn", $"id", den = 10000L,
        alphaNum = 1L, alphaDen = 20L)
      .select($"p_rank", $"rejected").as[(Int, Int)].collect().toMap
    (1 to 15).foreach { k =>
      assert(r(k) == (if (k <= 4) 1 else 0),
        s"BH textbook example: rank $k got ${r(k)}")
    }
    // rank-rescue property: p = (.10, .30, .35, .90) at alpha = 1/2,
    // thresholds k/8 — rank 2 FAILS its own compare (.30 > .25) but
    // rank 3 passes (.35 <= .375), so the step-up must still reject
    // rank 2 (k* = 3); a naive per-row threshold would keep it
    val resc = Seq((1, 10L), (2, 30L), (3, 35L), (4, 90L))
      .toDF("id", "pn").repartition(2)
    val r2 = Stats.bhStepUp(resc, $"pn", $"id", den = 100L,
        alphaNum = 1L, alphaDen = 2L)
      .select($"p_rank", $"rejected").as[(Int, Int)].collect().toMap
    assert(r2 == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 0),
      s"step-up rescue broke: $r2")
  }

  test("bhStepUp refuses an over-cap family instead of single-threading it") {
    // the step-up's rank window is GLOBAL (every rank couples to m), so
    // the operator carries the house loud-cap: a family larger than
    // maxFamily must throw, not silently drag a data-proportional frame
    // through one partition. The probe collects at most cap+1 rows
    // (upstream plan work still runs once — see the operator's doc).
    val big = spark.range(10).toDF("id").withColumn("pn", $"id" + 1)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Stats.bhStepUp(big, $"pn", $"id", den = 100L,
        alphaNum = 1L, alphaDen = 20L, maxFamily = 9)
    }
    assert(e.getMessage.contains("single-partition"), e.getMessage)
    // at exactly the cap it proceeds (boundary is inclusive)
    val ok = graft.operators.Stats.bhStepUp(big, $"pn", $"id", den = 100L,
      alphaNum = 1L, alphaDen = 20L, maxFamily = 10)
    assert(ok.count() == 10)
  }

  test("q249 conformal: q-hat replays definitionally; coverage meets 1-alpha") {
    // Split-conformal with alpha = 0.1: q-hat must equal the
    // ceil(9(n+1)/10)-th smallest calibration residual from a literal
    // driver-side sort, and held-out coverage must meet the
    // finite-sample guarantee (>= 1-alpha in expectation; 0.88 allows
    // one-sided sampling slack on the 30k-point test half).
    val dir = sf("sf0.01")
    val row = graft.queries.Registry.queries("q249_conformal")(spark, dir)
      .head()
    val rate = row.getAs[Long]("rate_cents_per_unit")
    val nCal = row.getAs[Long]("n_calib")
    val qhat = row.getAs[Long]("qhat_cents")
    val cov = row.getAs[Double]("coverage")
    // definitional replay: same split coin, same rate, literal sort
    val li = Tables(spark, dir, "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        $"l_quantity".cast("long").as("qty"),
        (conv(substring(md5(concat(lit("q249:"),
          $"l_orderkey".cast("string"), lit(":"),
          $"l_linenumber".cast("string"))), 1, 15), 16, 10)
          .cast("long") % 2).as("calib"))
    val calRes = li.filter($"calib" === 1)
      .select(abs($"cents" - $"qty" * rate)).as[Long].collect().sorted
    assert(calRes.length == nCal, s"${calRes.length} vs $nCal")
    val k = math.ceil(9.0 * (nCal + 1) / 10.0).toLong
    assert(calRes(k.toInt - 1) == qhat,
      s"q-hat ${calRes(k.toInt - 1)} (rank $k of $nCal) vs engine $qhat")
    assert(cov >= 0.88, s"coverage $cov below the 1-alpha guarantee band")
    // exchangeability sanity: not vacuously 1.0 (intervals must bind)
    assert(cov < 1.0, s"coverage $cov is vacuous — q-hat not binding")
  }
}
