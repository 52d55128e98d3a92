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
}
