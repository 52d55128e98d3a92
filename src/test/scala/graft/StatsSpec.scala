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
}
