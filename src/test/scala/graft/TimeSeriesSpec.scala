package graft

import java.sql.Timestamp

import graft.operators.{Quality, TimeSeries}
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample densifies gaps with n=0 and forward-fills the value") {
    val df = Seq(
      ("a", ts("2024-05-01 10:05:00"), 10L),
      ("a", ts("2024-05-01 10:40:00"), 5L),
      // 11:00 and 12:00 are gaps for key a
      ("a", ts("2024-05-01 13:10:00"), 7L),
      ("b", ts("2024-05-01 11:30:00"), 1L)
    ).toDF("k", "t", "v")

    val out = TimeSeries.resampleFfill(df, "k", "t", "hour", col("v"))
      .select($"k", $"bucket", $"n", $"v", $"v_ffill")
      .as[(String, Timestamp, Long, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    // key a: 4 dense buckets 10:00..13:00; key b: just its own bucket
    assert(out.size === 5)
    assert(out(("a", ts("2024-05-01 10:00:00"))) === ((2L, Some(15L), Some(15L))))
    assert(out(("a", ts("2024-05-01 11:00:00"))) === ((0L, None, Some(15L))),
      "gap bucket: n=0, v null, ffill carries 15")
    assert(out(("a", ts("2024-05-01 12:00:00"))) === ((0L, None, Some(15L))))
    assert(out(("a", ts("2024-05-01 13:00:00"))) === ((1L, Some(7L), Some(7L))))
    assert(out(("b", ts("2024-05-01 11:00:00"))) === ((1L, Some(1L), Some(1L))))
  }

  test("spine never extends beyond a key's own observed range") {
    val df = Seq(
      ("a", ts("2024-05-01 00:00:00"), 1L),
      ("a", ts("2024-05-03 00:00:00"), 2L),
      ("b", ts("2024-05-02 00:00:00"), 3L) // single-day key -> single row
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleFfill(df, "k", "t", "day", col("v"))
    assert(out.filter($"k" === "a").count() === 3)
    assert(out.filter($"k" === "b").count() === 1)
  }

  test("interpolate fills gaps linearly, floors exactly, and carries trailing gaps") {
    val df = Seq(
      ("a", 1, Option(100L)), ("a", 2, None), ("a", 3, None), ("a", 4, Option(10L)),
      ("a", 5, None), // trailing gap -> carry 10
      ("b", 1, Option(5L)), ("b", 2, None), ("b", 3, Option(6L))
    ).toDF("k", "i", "v")
    val out = TimeSeries.interpolate(df, "k", "i", $"v")
      .select($"k", $"i", $"v_interp").as[(String, Int, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // slope (10-100)/3 = -30: floor semantics -> 100+⌊-30⌋=70, 100+⌊-60⌋=40
    assert(out(("a", 2)) === 70L && out(("a", 3)) === 40L,
      "negative slope floors toward -inf identically on both engines")
    assert(out(("a", 4)) === 10L, "observed rows keep their value")
    assert(out(("a", 5)) === 10L, "trailing gap carries the last observation")
    assert(out(("b", 2)) === 5L, "⌊(6-5)·1/2⌋ = 0 -> stays at 5")
  }

  test("audit counts violations in one aggregate; null check result is a violation") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (-2L, "y"), (null, "x")
    ).toDF("amount", "tag")
    val row = Quality.audit(df, Seq(
      "v_amount_pos" -> ($"amount" > 0),
      "v_tag_domain" -> $"tag".isin("x", "y")
    )).as[(Long, Long, Long)].collect().head
    assert(row === ((3L, 2L, 0L)),
      "null amount counts as a violation of amount > 0")
  }

  test("acf: alternating series has exactly -(n-1)/n at lag 1, (n-2)/n at lag 2") {
    // x = +1,-1,+1,... over 10 points: mean is exactly 0, so
    // r1 = Σxₜxₜ₊₁/Σx² = -9/10 and r2 = 8/10 with no float slack
    val ser = (1 to 10).map(i => (i, if (i % 2 == 0) 1L else -1L))
      .toDF("t", "x")
    val r = graft.operators.TimeSeries.acf(ser, "t", "x", maxLag = 2)
      .collect().map(row => row.getInt(0) -> row.getDouble(2)).toMap
    assert(r(1) == -0.9, s"lag1 ${r(1)}")
    assert(r(2) == 0.8, s"lag2 ${r(2)}")
  }

  test("acf pairs by position: n_pairs shrinks by one per lag") {
    val ser = (1 to 30).map(i => (i, (i % 7).toLong)).toDF("t", "x")
    val rows = graft.operators.TimeSeries.acf(ser, "t", "x", maxLag = 7)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach(r => assert(r.getLong(1) == 30L - r.getInt(0)))
    // period-7 integer sawtooth: lag-7 autocorrelation must dominate —
    // the Box-Jenkins estimator shrinks it toward (n-k)/n ≈ 0.77, so
    // the bound is the bias-aware one, not 1
    val acf = rows.map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(acf(7) > 0.7, s"lag7 ${acf(7)}")
    (1 to 6).foreach(k => assert(acf(7) > acf(k), s"lag $k ${acf(k)}"))
  }

  test("duplicateKeys flags only repeated tuples; orphans excludes null FKs") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (3L, Option(99L)),
      (4L, Option.empty[Long])
    ).toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    val orphan = Quality.orphans(child, "fk", parent, "pk")
      .select($"id").as[Long].collect().toSet
    assert(orphan === Set(3L), "null FK is not an orphan; 99 is")

    val dups = Quality.duplicateKeys(child, Seq("fk"))
      .select($"fk", $"n_dups").as[(Option[Long], Long)].collect().toMap
    assert(dups === Map(Option(10L) -> 2L), "only fk=10 repeats")
  }

  test("holtLinear is bit-equal to an independent BigInt replay of the recurrence") {
    import graft.operators.TimeSeries
    // declining-then-recovering series: the trend goes negative, so the
    // truncating (toward-zero) division direction is actually exercised
    val ys = Seq(1000L, 700L, 450L, 300L, 280L, 350L, 500L, 720L)
    val ser = ys.zipWithIndex.map { case (y, i) => (i.toLong + 1, y) }
      .toDF("ord", "cents")
    val got = TimeSeries.holtLinear(ser, "ord", "cents")
      .select($"ord", $"level_micro", $"trend_micro", $"forecast_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // independent replay: BigInt /, like Scala Long /, truncates
    var l = BigInt(ys.head) * 1000000
    var b = BigInt(ys(1) - ys.head) * 1000000
    val want = Seq((1L, l.toLong, b.toLong, (l + b).toLong)) ++
      (1 until ys.length).map { t =>
        val y = BigInt(ys(t)) * 1000000
        val lPrev = l
        l = (2 * y + 8 * (lPrev + b)) / 10
        b = (1 * (l - lPrev) + 9 * b) / 10
        (t.toLong + 1, l.toLong, b.toLong, (l + b).toLong)
      }
    assert(got == want, s"fixed-point trajectory diverged:\n$got\n$want")
  }

  test("holtWinters is bit-equal to an independent BigInt replay; guards fire") {
    import graft.operators.TimeSeries
    // period 4, three seasons with a NEGATIVE seasonal trough so the
    // truncating division direction is exercised on the seasonal state
    val ys = Seq(100L, 300L, 50L, 200L, 140L, 360L, 80L, 250L,
      180L, 410L, 110L, 300L)
    val ser = ys.zipWithIndex.map { case (y, i) => (i.toLong + 1, y) }
      .toDF("ord", "cents")
    val got = TimeSeries.holtWinters(ser, "ord", "cents", period = 4)
      .select($"ord", $"level_micro", $"trend_micro", $"season_micro",
        $"fitted_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val m = 4
    val sum1 = ys.take(m).sum; val sum2 = ys.slice(m, 2 * m).sum
    var l = BigInt(sum1) * 1000000 / m
    var b = BigInt(sum2 - sum1) * 1000000 / (m * m)
    val s = Array.tabulate(m)(i => BigInt(ys(i)) * 1000000 - l)
    val want = (m until ys.length).map { t =>
      val y = BigInt(ys(t)) * 1000000
      val sOld = s(t % m)
      val fit = l + b + sOld
      val lPrev = l
      l = (2 * (y - sOld) + 8 * (lPrev + b)) / 10
      b = (1 * (l - lPrev) + 9 * b) / 10
      s(t % m) = (3 * (y - l) + 7 * sOld) / 10
      (t.toLong + 1, l.toLong, b.toLong, s(t % m).toLong, fit.toLong)
    }
    assert(got == want, s"HW trajectory diverged:\n$got\n$want")
    // guards: fewer than two full seasons, and the per-period cents cap
    intercept[IllegalArgumentException] {
      TimeSeries.holtWinters(ser.limit(7), "ord", "cents", period = 4)
    }
    val lim = Long.MaxValue / 1000000L / 10L / 4L
    val hot = (1 to 8).map(i =>
      (i.toLong, if (i % 2 == 0) lim else -lim)).toDF("ord", "cents")
    intercept[IllegalArgumentException] {
      TimeSeries.holtWinters(hot, "ord", "cents", period = 4)
    }
  }

  test("holtLinear fails loudly (no silent wrap) on a sign-swinging near-cap series") {
    import graft.operators.TimeSeries
    // each period passes the per-period |cents| cap, but the two-point
    // trend init is a DELTA of ~2x the cap: (bDen-bNum)*b then exceeds a
    // Long, which before the *Exact fold wrapped silently. The contract
    // is an exception, never a corrupted trajectory.
    val lim = Long.MaxValue / 1000000L / 10L
    val ser = Seq((1L, lim - 1), (2L, -(lim - 1)), (3L, lim - 1))
      .toDF("ord", "cents")
    intercept[ArithmeticException] {
      TimeSeries.holtLinear(ser, "ord", "cents")
    }
  }

  test("classicalDecompose recovers a planted trend+seasonal EXACTLY") {
    import graft.operators.TimeSeries
    // y_t = a + b·t + s_{t mod 12} with Σs = 0: the 2×12 MA of the
    // zero-sum periodic part is exactly 0 and the weighted window sum
    // of the linear part is exactly 24·(a+bt), so every division is
    // even and the decomposition is EXACT — including a NEGATIVE trend,
    // which exercises the truncating-division parity both engines claim
    val s12 = Seq(50L, -30L, 20L, -40L, 10L, 35L, -25L, 15L, -5L, 30L, -45L, -15L)
    assert(s12.sum == 0)
    for (b <- Seq(7L, -7L)) {
      val ser = (0L until 48L)
        .map(t => (t, 10000L + b * t + s12((t % 12).toInt)))
        .toDF("ord", "cents")
      val got = TimeSeries.classicalDecompose(ser, "ord", "cents")
        .select($"ord", $"trend_micro", $"seasonal_micro", $"remainder_micro")
        .as[(Long, Option[Long], Long, Option[Long])].collect().toSeq
      got.foreach { case (t, trend, seas, rem) =>
        if (t < 6 || t >= 42)
          assert(trend.isEmpty && rem.isEmpty,
            s"incomplete ±6 window must be NULL at t=$t (b=$b)")
        else {
          assert(trend.contains((10000L + b * t) * 1000000L),
            s"trend must be exact at t=$t (b=$b): $trend")
          assert(rem.contains(0L), s"remainder must vanish at t=$t (b=$b): $rem")
        }
        assert(seas == s12((t % 12).toInt) * 1000000L,
          s"seasonal index must be exact at t=$t (b=$b): $seas")
      }
    }
  }

  test("classicalDecompose guards: odd period and over-cap cents fail loudly") {
    import graft.operators.TimeSeries
    val ser = (0L until 24L).map(t => (t, t * 100L)).toDF("ord", "cents")
    intercept[IllegalArgumentException] {
      TimeSeries.classicalDecompose(ser, "ord", "cents", period = 7)
    }
    val lim = Long.MaxValue / 1000000L / 26L
    val hot = (0L until 24L).map(t => (t, lim + t)).toDF("ord", "cents")
    val ex = intercept[Exception] {
      TimeSeries.classicalDecompose(hot, "ord", "cents").collect()
    }
    assert(ex.getMessage.contains("caps |cents|") ||
      Option(ex.getCause).exists(_.getMessage.contains("caps |cents|")),
      s"expected the per-period envelope guard: ${ex.getMessage}")
  }

  test("holtLinear per-period cap fires loudly past the fixed-point envelope") {
    import graft.operators.TimeSeries
    // the contract the ×100 ScaleStress run hits for q221 (replication
    // multiplies per-period revenue past ~$9.2B): the input guard must
    // reject the series with the cap message, never fold a wrapped value
    val lim = Long.MaxValue / 1000000L / 10L
    val ser = Seq((1L, lim), (2L, lim + 1)).toDF("ord", "cents")
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.holtLinear(ser, "ord", "cents")
    }
    assert(ex.getMessage.contains("caps |cents|"),
      s"expected the per-period envelope guard: ${ex.getMessage}")
  }

  test("ewmaChart tracks the exact rational EWMA within the truncation envelope") {
    import graft.operators.TimeSeries
    // Independent-identity pin: the oracle replays the SAME truncating
    // recurrence, so a shared fixed-point slip would pass both engines.
    // The exact rational EWMA z_t = λ·y_t + (1−λ)·z_{t−1} (BigInt
    // numerators over λDen^t) is a DIFFERENT computation related by
    // analysis: each fold step truncates < 1 micro and the error
    // recursion e_t ≤ (1−λ)·e_{t−1} + 1 is bounded by 1/λ = λDen/λNum
    // = 5 micros. A drift past that bound means the fold is wrong.
    val ys = Seq(1000L, 700L, 450L, 300L, 280L, 350L, 500L, 720L, 640L, 810L)
    val ser = ys.zipWithIndex.map { case (y, i) => (i.toLong + 1, y) }
      .toDF("ord", "cents")
    val got = TimeSeries.ewmaChart(ser, "ord", "cents")
      .select($"ord", $"ewma_micro").as[(Long, Long)].collect().toSeq
    // exact rational replay from the SAME center-line seed: numerator
    // over 10^t, no per-step truncation at all
    var num = BigInt(TimeSeries.ewmaSeed(ys)) // z as num / 10^t
    var den = BigInt(1)
    got.zipWithIndex.foreach { case ((_, zMicro), t) =>
      num = 2 * BigInt(ys(t)) * 1000000 * den + 8 * num; den *= 10
      val exact = BigDecimal(num) / BigDecimal(den)
      assert((BigDecimal(zMicro) - exact).abs <= 5,
        s"t=$t: fold $zMicro vs exact $exact drifted past the 5-micro envelope")
    }
  }

  test("ewmaChart alarms on an injected shift and never on the stable stream") {
    import graft.operators.TimeSeries
    // control-chart behavior (the msprtMonitor discipline): a late
    // level shift far past 3σ·√(λ/(2−λ)) must alarm once the smoothed
    // level crosses the band; a mild alternating stream must not.
    // The first point sits a full σ off the mean ON PURPOSE: with the
    // center-line seed this stays calm (Var(z₁) = λ²σ² ≪ band²) — the
    // first-cut z₁=y₁ seeding alarmed here ~32% of in-control starts,
    // the self-review catch that forced the Roberts init.
    val stable = (1 to 40).map(t =>
      (t.toLong, 10000L + (if (t % 2 == 0) 50L else -50L)))
    val calm = TimeSeries.ewmaChart(stable.toDF("ord", "cents"), "ord", "cents")
      .select($"alarm").as[Int].collect()
    assert(calm.forall(_ == 0), "the stable alternating stream must never alarm")
    val shifted = stable.take(30) ++ (31 to 40).map(t => (t.toLong, 40000L))
    val hot = TimeSeries.ewmaChart(shifted.toDF("ord", "cents"), "ord", "cents")
      .select($"ord", $"alarm").as[(Long, Int)].collect().sortBy(_._1)
    assert(hot.takeRight(5).exists(_._2 == 1),
      s"a 4x level shift must alarm: ${hot.takeRight(10).toSeq}")
    assert(hot.take(25).forall(_._2 == 0),
      "pre-shift periods must stay inside the band")
  }

  test("q232 Yule-Walker: planted AR(2) recovered; output satisfies the defining system") {
    import graft.operators.TimeSeries
    // (1) planted truth: a stationary AR(2) with known φ = (0.6, −0.3),
    // driven by fixed splitmix-scrambled pseudo-noise (deterministic —
    // the test can never flake; a plain Weyl ramp would be a sawtooth
    // with near-1 lag autocorrelation and corrupt the plant). The
    // sample ACF of 5000 points pins the fitted coefficients.
    val (phi1, phi2) = (0.6, -0.3)
    var (y1, y2) = (0.0, 0.0)
    val ys = (1 to 5000).map { t =>
      var h = t * 0x9E3779B97F4A7C15L // full splitmix64 finalizer
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
      h = h ^ (h >>> 31)
      val e = ((h & 0xffffL) - 32767.5) / 32768.0
      val y = phi1 * y1 + phi2 * y2 + e
      y2 = y1; y1 = y
      (t.toLong, math.round(y * 10000))
    }
    val acf = TimeSeries.acf(ys.toDF("ord", "x"), "ord", "x", 2)
      .select($"lag", $"acf").as[(Int, Double)].collect().toMap
    val (r1, r2) = (acf(1), acf(2))
    val f1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val f2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(math.abs(f1 - phi1) < 0.05 && math.abs(f2 - phi2) < 0.05,
      s"planted (0.6, -0.3) not recovered: ($f1, $f2)")
    // (2) the registered query's output must SATISFY the Yule-Walker
    // system r1 = φ1 + φ2·r1, r2 = φ1·r1 + φ2 — the independence that
    // matters: a misderived closed form (the oracle mirrors it) would
    // not solve the defining equations, however consistently both
    // engines computed it. Tolerance covers the 6-decimal rounding.
    val q = graft.queries.Registry.queries("q232_yule_walker")(
      spark, sf("sf0.001")).head()
    val (qr1, qr2) = (q.getAs[Double]("r1"), q.getAs[Double]("r2"))
    val (qp1, qp2) = (q.getAs[Double]("phi1"), q.getAs[Double]("phi2"))
    assert(math.abs(qr1 - (qp1 + qp2 * qr1)) < 5e-6,
      s"YW equation 1 violated: $qr1 vs ${qp1 + qp2 * qr1}")
    assert(math.abs(qr2 - (qp1 * qr1 + qp2)) < 5e-6,
      s"YW equation 2 violated: $qr2 vs ${qp1 * qr1 + qp2}")
    assert(math.abs(q.getAs[Double]("var_ratio") -
      (1.0 - qp1 * qr1 - qp2 * qr2)) < 5e-6)
  }

  test("ccf: a planted 3-day shift peaks at lag +3; xy/yx antisymmetry holds") {
    import graft.operators.TimeSeries
    // y(t+3) = x(t): y FOLLOWS x by 3 days, so the documented sign
    // convention demands the peak at +3 — the lead/lag direction is
    // the classic ccf bug and the mirrored oracle cannot catch it
    val xs = (1 to 400).map { t =>
      var h = t * 0x9E3779B97F4A7C15L
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
      (t.toLong, ((h ^ (h >>> 31)) & 0xffffL) + 1000L)
    }
    val ys = xs.map { case (t, v) => (t + 3, v) }
    val a = xs.toDF("day", "v")
    val b = ys.toDF("day", "v")
    val r = TimeSeries.ccf(a, b, "day", "v", maxLag = 7)
      .select($"lag", $"ccf").as[(Int, Double)].collect().toMap
    assert(r(3) > 0.99, s"planted shift must peak at +3: ${r.toSeq.sorted}")
    assert(r.filter(_._1 != 3).values.forall(math.abs(_) < 0.5),
      s"off-peak lags must stay small: ${r.toSeq.sorted}")
    // ccf_xy(k) == ccf_yx(−k): same matched pairs, roles swapped — the
    // decimal folds are identical reals, only float op order differs
    val rev = TimeSeries.ccf(b, a, "day", "v", maxLag = 7)
      .select($"lag", $"ccf").as[(Int, Double)].collect().toMap
    (-7 to 7).foreach { k =>
      assert(math.abs(r(k) - rev(-k)) < 1e-12,
        s"antisymmetry broke at lag $k: ${r(k)} vs ${rev(-k)}")
    }
  }

  test("ccf emits a DENSE lag range: zero-overlap lags get n_pairs=0, ccf NULL") {
    import graft.operators.TimeSeries
    // disjoint calendars: a on days 1..4, b on days 100..103 — no lag
    // in −3..+3 has any overlapping pair, yet all 7 rows must appear
    // (the documented range, not just 'lags with >= 1 pair')
    val a = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("day", "v")
    val b = Seq((100L, 5L), (101L, 6L), (102L, 7L), (103L, 8L)).toDF("day", "v")
    val r = TimeSeries.ccf(a, b, "day", "v", maxLag = 3)
      .select($"lag", $"n_pairs", $"ccf")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.isNullAt(2)))
    assert(r.map(_._1).toSeq == (-3 to 3).toSeq,
      s"lag range must be dense −3..+3: ${r.toSeq}")
    assert(r.forall { case (_, n, isNull) => n == 0L && isNull },
      s"zero-overlap lags must carry n_pairs=0 and NULL ccf: ${r.toSeq}")
    // partial overlap keeps real lags real: shift b onto a's calendar
    val b2 = Seq((2L, 5L), (3L, 6L)).toDF("day", "v")
    val r2 = TimeSeries.ccf(a, b2, "day", "v", maxLag = 3)
      .select($"lag", $"n_pairs").as[(Int, Long)].collect().toMap
    assert(r2.keys.toSeq.sorted == (-3 to 3).toSeq)
    // b.day = a.day + lag: lag 0 matches days {2,3} (2 pairs), lag +2
    // only day 3 (1 pair), lag +3 nothing — dense row with 0
    assert(r2(0) == 2L && r2(2) == 1L && r2(3) == 0L,
      s"overlap counts wrong: $r2")
  }

  test("ewmaChart guards fire loudly: per-period cap and raw-row input") {
    import graft.operators.TimeSeries
    val lim = Long.MaxValue / 1000000L / 10L
    val hot = Seq((1L, lim), (2L, lim + 1)).toDF("ord", "cents")
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.ewmaChart(hot, "ord", "cents")
    }
    assert(ex.getMessage.contains("caps |cents|"))
    val raw = (1L to 50L).map(t => (t, t)).toDF("ord", "cents")
    val ex2 = intercept[IllegalArgumentException] {
      TimeSeries.ewmaChart(raw, "ord", "cents", maxRows = 40)
    }
    assert(ex2.getMessage.contains("pre-aggregate"))
  }
}
