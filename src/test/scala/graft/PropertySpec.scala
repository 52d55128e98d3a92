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
}
