package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.operators.Relational

/** Property-based invariants (SURVEY.md §5), sampled directly from
  * ScalaCheck Gens (the scalatest bridge artifact isn't in the offline
  * cache). Sample counts kept small — each case runs a Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("IQR filter output is always a subset with no new extremes") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)), 5).foreach { xs =>
      val df = xs.toDF("x")
      val kept = Relational.iqrFilter(df, "x").as[Double].collect()
      assert(kept.length <= xs.length)
      assert(kept.forall(v => xs.contains(v)))
    }
  }

  test("jaccard is within [0,1] and symmetric for any two word lists") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val text = Gen.nonEmptyListOf(word).map(_.take(20).mkString(" "))
    samples(Gen.zip(text, text), 5).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val (ab, ba) = df.select(
        TextFunctions.jaccard(TextFunctions.words($"a"), TextFunctions.words($"b")),
        TextFunctions.jaccard(TextFunctions.words($"b"), TextFunctions.words($"a")))
        .as[(Double, Double)].collect()(0)
      assert(ab >= 0.0 && ab <= 1.0 && ab == ba)
    }
  }

  test("histogram bucket counts always sum to the row count (incl. constant columns)") {
    val cases = samples(Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3)), 5) :+
      List.fill(10)(5.0) // constant column: one bucket, not a divide-by-zero
    cases.foreach { xs =>
      val df = xs.toDF("x")
      val total = Relational.histogram(df, "x", 7)
        .agg(org.apache.spark.sql.functions.sum($"cnt")).as[Long].collect()(0)
      assert(total == xs.length)
    }
  }

  test("prefix-filtered Jaccard join is lossless on random corpora (vs brute force)") {
    import graft.operators.Dedup
    // small vocabulary forces shared shingles; repeated words force the
    // short-text fallback and duplicate-shingle paths
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val text = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    samples(Gen.listOfN(8, text), 4).zipWithIndex.foreach { case (texts, i) =>
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val sh = TextFunctions.wordShingles($"text", 3)
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val brute = norm(Dedup.sparseJaccardPairs(docs, "doc_id", sh, 0.5))
      val pref = norm(Dedup.prefixJaccardPairs(docs, "doc_id", sh, 1, 2))
      val words = norm(Dedup.prefixJaccardPairsWords(docs, "doc_id", "text", 3, 1, 2))
      assert(pref == brute, s"case $i: prefix filter lost/invented pairs\n$texts")
      assert(words == brute, s"case $i: word fast path diverged\n$texts")
    }
  }

  test("snapshotDiff(a, a) is all-unchanged; statuses partition the key union") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(1L, 40L)), 4).foreach { keys =>
      val a = keys.distinct.map(k => (k, k * 1.5)).toDF("k", "v")
      val self = Relational.snapshotDiff(a, a, "k", Seq("v"))
        .select($"diff_status").distinct().as[String].collect().toSet
      assert(self == Set("unchanged"), s"self-diff must be unchanged: $self")
      // drop half the keys on one side: every key still classified exactly once
      val b = keys.distinct.filter(_ % 2 == 0).map(k => (k, k * 1.5)).toDF("k", "v")
      val d = Relational.snapshotDiff(a, b, "k", Seq("v"))
      assert(d.count() == keys.distinct.size, "one row per key in the union")
    }
  }

  test("rolling z-score never flags inside a constant series; interpolation hits observations") {
    import graft.operators.TimeSeries
    samples(Gen.chooseNum(60L, 1000L), 3).foreach { base =>
      val df = (1 to 30).map(i => ("k", i, base)).toDF("k", "b", "c")
      val flags = TimeSeries.rollingZScore(df, "k", "b", $"c", 10, 5, 3)
        .filter($"is_anomaly").count()
      assert(flags == 0, s"constant series at $base must never flag")
    }
    // interpolation returns the observed value at every observed bucket
    val obs = samples(Gen.nonEmptyListOf(Gen.chooseNum(1, 50)), 3)
    obs.map(_.distinct.sorted).filter(_.size >= 2).foreach { idxs =>
      val rows = idxs.map(i => ("k", i, Option(i * 7L)))
      val dense = (idxs.min to idxs.max).map(i =>
        ("k", i, if (idxs.contains(i)) Option(i * 7L) else None))
      val out = TimeSeries.interpolate(dense.toDF("k", "i", "v"), "k", "i", $"v")
        .filter($"v".isNotNull).select($"i", $"v_interp")
        .as[(Int, Long)].collect().toMap
      idxs.foreach(i => assert(out(i) == i * 7L, s"observed bucket $i must keep its value"))
    }
  }

  test("BPE merges equal an independent reference implementation on random corpora") {
    import graft.operators.Bpe
    // straight-line reference: mutable pair counts + greedy vector merge,
    // sharing NO code with the relational operator
    def refBpe(words: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] = {
      var st = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      (1 to rounds).flatMap { r =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- st; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (counts.isEmpty) Seq.empty
        else {
          val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          st = st.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
                out += (l + rr); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
          Seq((r, l, rr, c))
        }
      }
    }
    val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(6).mkString)
    val corpus = Gen.nonEmptyListOf(Gen.zip(word, Gen.chooseNum(1L, 5L)))
      .map(_.take(8).distinctBy(_._1))
    samples(corpus, 4).foreach { words =>
      val got = Bpe.trainMerges(words.toDF("w", "f"), "w", "f", rounds = 3)
        .orderBy($"round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val want = refBpe(words, 3)
      assert(got == want, s"corpus $words:\n got $got\nwant $want")
    }
  }

  test("binned range join equals the naive inequality join on random inputs") {
    import graft.operators.RangeJoin
    import org.apache.spark.sql.functions.col
    val ivGen = Gen.zip(Gen.chooseNum(0L, 100L), Gen.chooseNum(-5L, 30L))
      .map { case (lo, len) => (lo, lo + len) } // includes empty/inverted
    val caseGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 110L)).map(_.take(40)),
      Gen.nonEmptyListOf(ivGen).map(_.take(15)),
      Gen.chooseNum(1L, 13L))
    samples(caseGen, 4).foreach { case (pts, ivs, w) =>
      val p = pts.toDF("pt")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        .toDF("iv", "lo", "hi")
      val got = RangeJoin.pointInInterval(p, col("pt"), iv, col("lo"), col("hi"), w)
        .select($"iv", $"pt").as[(Int, Long)].collect().sorted.toSeq
      val want = (for {
        pt <- pts; ((lo, hi), i) <- ivs.zipWithIndex
        if lo <= pt && pt < hi
      } yield (i, pt)).sorted
      assert(got == want, s"binWidth=$w pts=$pts ivs=$ivs")
    }
  }

  test("TWAP equals the direct step-integral on random event sets") {
    import graft.operators.TimeSeries
    import org.apache.spark.sql.functions.{col, round => sround}
    val evGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 999L))).map(_.take(12))
    samples(evGen, 4).foreach { evs =>
      val rows = evs.zipWithIndex.map { case ((t, c), i) =>
        (1L, new java.sql.Timestamp(t * 1000), i.toLong, c / 100.0)
      }
      val df = rows.toDF("k", "ts", "id", "v")
      val got = TimeSeries.twap(df, "k", "ts", "id", sround(col("v") * 100).cast("long"))
        .collect().headOption.map(r => (r.getDouble(1), r.getLong(2), r.getLong(3)))
      // direct: sort by (t, id), value holds to the next sample
      val sorted = evs.zipWithIndex.map { case ((t, c), i) => (t, i, c) }
        .sortBy { case (t, i, _) => (t, i) }
      val steps = sorted.zip(sorted.tail).map { case ((t1, _, c), (t2, _, _)) =>
        (c * (t2 - t1), t2 - t1)
      }
      val span = steps.map(_._2).sum
      if (evs.size < 2 || span == 0) {
        // single sample never reaches the aggregate; all-simultaneous
        // samples divide by a zero span (Infinity) — just require no crash
        assert(got.isEmpty || span == 0)
      } else {
        val num = steps.map(_._1).sum
        // mirror the operator's pinning: micro units via floor(x+0.5),
        // the readable double derived from the integer by one division
        val micro = math.floor(num.toDouble * 10000.0 / span + 0.5).toLong
        val want = micro.toDouble / 1000000.0
        assert(got.contains((want, micro, span)),
          s"evs=$evs got=$got want=($want, $micro, $span)")
      }
    }
  }

  test("both grouped-median engines equal the sorted definition on random data") {
    val rowGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-5000L, 5000L)))
      .map(_.take(60))
    samples(rowGen, 4).foreach { rows =>
      val df = rows.toDF("g", "v")
      def ref(xs: Seq[Long]): Long = {
        val s = xs.sorted; val n = s.length
        s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
      }
      val want = rows.groupBy(_._1).view
        .mapValues(vs => (ref(vs.map(_._2)), vs.size.toLong)).toMap
      def got(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got(Relational.groupedMedian2(df, "g", "v")) == want,
        s"window engine diverged on $rows")
      assert(got(Relational.groupedMedian2SmallDomain(df, "g", "v")) == want,
        s"driver-assisted engine diverged on $rows")
    }
  }

  test("scatter fold identity holds for any split of a random corpus") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.{col, sum => ssum}
    val dims = 4
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-900, 900).map(_ / 1000.0f))
    val corpusGen = Gen.nonEmptyListOf(vecGen).map(_.take(12))
    samples(Gen.zip(corpusGen, Gen.chooseNum(0, 11)), 3).foreach {
      case (vecs, cut) =>
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
          .toDF("vec_id", "embedding")
        val oneShot = Similarity.embScatter(df, "embedding", dims)
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        val (a, b) = (df.filter(col("vec_id") <= cut), df.filter(col("vec_id") > cut))
        def fold(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                 keys: Seq[String], sums: Seq[String]) = {
          val u = f(a).unionByName(f(b))
          u.groupBy(keys.map(col): _*)
            .agg(ssum(col(sums.head)).as(sums.head),
              sums.tail.map(s => ssum(col(s)).as(s)): _*)
        }
        val merged = Similarity.scatterFromSums(
            fold(Similarity.embPairSums(_, "embedding", dims), Seq("i", "j"), Seq("sxy")),
            fold(Similarity.embMarginals(_, "embedding"), Seq("i"), Seq("sx", "n")))
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        assert(merged == oneShot,
          s"fold identity broke at cut=$cut over ${vecs.size} vectors")
    }
  }

  test("clusterAri is symmetric and bounded; 1 iff identical partitions (random data)") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 3)))
    (1L to 5L).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((c, l), i) => (i, s"c$c", s"l$l") }
      val lab = rows.toDF("id", "cl", "lb")
      def ari(a: String, b: String): Double =
        graft.operators.Stats.clusterAri(lab, a, b)
          .select(col("ari")).as[Double].collect()(0)
      val fwd = ari("cl", "lb"); val rev = ari("lb", "cl")
      assert(fwd == rev, s"ARI must be symmetric: $fwd vs $rev (seed $seed)")
      assert(fwd <= 1.0 + 1e-9, s"ARI <= 1: $fwd")
      val self = graft.operators.Stats
        .clusterAri(lab.withColumn("lb2", col("cl")), "cl", "lb2")
        .select(col("ari")).as[Double].collect()(0)
      assert(self == 1.0, s"ARI(P, P) must be 1: $self")
    }
    // NULL by contract on TWO TRIVIAL partitions (one cluster AND one
    // label): max index == expected index, ARI undefined — the ×100
    // stress hit this live (100 copies of one doc, one source) as an
    // ANSI DIVIDE_BY_ZERO before the guard
    val triv = (0 until 10).map(i => (i, "c0", "l0")).toDF("id", "cl", "lb")
    val nullAri = graft.operators.Stats.clusterAri(triv, "cl", "lb")
      .select(col("ari")).collect()(0)
    assert(nullAri.isNullAt(0),
      s"degenerate ARI must be NULL by contract: $nullAri")
    // the OTHER zero-denominator design: both sides all singletons
    // (p_a = p_b = 0) — the integer guard must catch it too
    val singl = (0 until 10).map(i => (i, s"c$i", s"l$i")).toDF("id", "cl", "lb")
    val nullAri2 = graft.operators.Stats.clusterAri(singl, "cl", "lb")
      .select(col("ari")).collect()(0)
    assert(nullAri2.isNullAt(0),
      s"all-singleton ARI must be NULL by contract: $nullAri2")
  }

  test("bhStepUp equals the literal BH fold on random p-value families") {
    import org.apache.spark.sql.functions._
    // random rational p-families (numerators over den=100), alpha=1/4:
    // the engine's windowed step-up must equal the textbook driver fold
    // k* = max{k : alphaDen·m·p_(k) <= den·alphaNum·k} on every draw
    val gen = Gen.choose(1, 12).flatMap(m =>
      Gen.listOfN(m, Gen.choose(1L, 100L)))
    (1L to 8L).foreach { seed =>
      val pn = gen(Gen.Parameters.default, Seed(seed)).get
      val m = pn.size
      val sorted = pn.zipWithIndex.sortBy { case (p, i) => (p, i) }
      val kstar = sorted.zipWithIndex.collect {
        case ((p, _), r) if 4L * m * p <= 100L * 1L * (r + 1) => r + 1
      }.maxOption.getOrElse(0)
      val want = sorted.zipWithIndex.map { case ((p, id), r) =>
        (id, r + 1, if (r + 1 <= kstar) 1 else 0) }.sortBy(_._1)
      val got = graft.operators.Stats.bhStepUp(
          pn.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "pn")
            .repartition(2),
          col("pn"), col("id"), den = 100L, alphaNum = 1L, alphaDen = 4L)
        .select(col("id"), col("p_rank"), col("rejected"))
        .as[(Int, Int, Int)].collect().toSeq.sortBy(_._1)
      assert(got == want, s"seed $seed (m=$m, pn=$pn): $got vs $want")
    }
  }

  test("gini equals the brute-force sorted-rank formula on random multisets") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(40, Gen.choose(0L, 50L)) // heavy ties on purpose
    (1L to 5L).foreach { seed =>
      val xs = gen(Gen.Parameters.default, Seed(seed)).get
      val got = graft.operators.Stats
        .gini(xs.map(("g", _)).toDF("g", "cents"), Seq("g"), "cents")
        .select(col("gini")).as[Option[Double]].collect()(0)
      val sorted = xs.sorted
      val n = sorted.length
      val sx = sorted.sum
      if (sx == 0) assert(got.isEmpty, "all-zero multiset must be NULL")
      else {
        val six = sorted.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
        val want = BigDecimal(2.0 * six.toDouble / (n.toDouble * sx) -
          (n + 1).toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got.contains(want),
          s"gini diverged from brute force (seed $seed): $got vs $want")
      }
    }
  }

  test("isotonicFit matches the brute-force minimax over random bins") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(1L, 9L), Gen.choose(0, 9)))
    (1L to 5L).foreach { seed =>
      val bins = gen(Gen.Parameters.default, Seed(seed)).get
        .map { case (w, e) => (w, math.min(e, w)) }
        .zipWithIndex.map { case ((w, e), i) => (i.toLong, w, e) }
      val got = graft.operators.Stats
        .isotonicFit(bins.toDF("ord", "n", "events"), "ord", "n", "events")
        .orderBy(col("ord")).select(col("iso")).as[Double].collect().toSeq
      // the independent minimax identity, O(n^3), over exact prefix sums
      val cw = bins.scanLeft(0L)(_ + _._2).tail
      val ce = bins.scanLeft(0L)(_ + _._3).tail
      def avg(j: Int, k: Int): Double = // bins j..k inclusive, 0-based
        (ce(k) - (if (j == 0) 0L else ce(j - 1))).toDouble /
          (cw(k) - (if (j == 0) 0L else cw(j - 1)))
      val want = bins.indices.map { i =>
        val v = (0 to i).map(j => (i until bins.length).map(k => avg(j, k)).min).max
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(got == want, s"PAVA vs minimax diverged (seed $seed):\n$got\n$want")
    }
  }

  test("logRank chi2 is invariant under swapping the group labels") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(0L, 1L), Gen.oneOf(0L, 1L)))
    (1L to 5L).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed)).get
      val a = graft.operators.Stats
        .logRank(rows.toDF("life", "ev", "grp")).head()
      val b = graft.operators.Stats
        .logRank(rows.map(r => (r._1, r._2, 1L - r._3))
          .toDF("life", "ev", "grp")).head()
      // (O−E)² is the same on either margin; only the labeled counts swap
      assert(a.getAs[Long]("n0") == b.getAs[Long]("n1") &&
        a.getAs[Long]("n1") == b.getAs[Long]("n0"), s"margins must swap")
      val ca = Option(a.getAs[java.lang.Double]("chi2")).map(_.toDouble)
      val cb = Option(b.getAs[java.lang.Double]("chi2")).map(_.toDouble)
      (ca, cb) match {
        case (Some(x), Some(y)) =>
          assert(math.abs(x - y) <= 2e-6, // each side rounds at 1e-6
            s"chi2 must be label-symmetric (seed $seed): $x vs $y")
        case _ => assert(ca.isEmpty == cb.isEmpty,
          s"NULL contract must be label-symmetric (seed $seed): $ca vs $cb")
      }
    }
  }

  test("holtLinear holds an exactly linear series as a fixed point") {
    import org.apache.spark.sql.functions._
    // for y_t = a + b·t (integer a, b) the recurrence reproduces
    // l_t = y_t·1e6 and b_t = b·1e6 EXACTLY (every division is even),
    // so each forecast is the true next point — for any smoothing params
    val gen = Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(-50L, 50L))
    (1L to 5L).foreach { seed =>
      val (a, b) = gen(Gen.Parameters.default, Seed(seed)).get
      val ser = (1L to 20L).map(t => (t, a + b * t)).toDF("ord", "cents")
      val got = graft.operators.TimeSeries
        .holtLinear(ser, "ord", "cents")
        .select(col("ord"), col("level_micro"), col("trend_micro"))
        .as[(Long, Long, Long)].collect().toSeq
      got.foreach { case (t, l, tr) =>
        assert(l == (a + b * t) * 1000000L && tr == b * 1000000L,
          s"linear series must be a fixed point (seed $seed): t=$t l=$l tr=$tr")
      }
    }
  }

  test("kaplanMeier survival is non-increasing and in (0, 1] on random cohorts") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 30), Gen.oneOf(0L, 1L)))
    (1L to 5L).foreach { seed =>
      val per = gen(Gen.Parameters.default, Seed(seed)).get
        .toDF("life", "ev")
      val surv = graft.operators.Stats.kaplanMeier(per)
        .orderBy(col("t_days")).select(col("surv")).as[Double].collect().toSeq
      if (surv.nonEmpty) {
        assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 },
          s"S(t) must be non-increasing (seed $seed): $surv")
        assert(surv.forall(v => v >= 0.0 && v <= 1.0 + 1e-12),
          s"S(t) must sit in [0, 1] (seed $seed): $surv")
      }
    }
  }
}
