package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators.sum128

/** [[graft.expressions.Sum128]]: the exact two-long-buffer 128-bit sum
  * must agree with the decimal-sum reference in every regime — signed
  * mixes, carry-heavy magnitudes, grouped aggregation (the fast-path
  * motivation), merge across partitions, and nulls. */
class Sum128Spec extends SparkSpec {
  import spark.implicits._

  private def decimalRef(xs: Seq[Long]): BigDecimal =
    xs.foldLeft(BigDecimal(0))(_ + BigDecimal(_))

  test("sum128 equals the exact reference on a signed pseudo-random mix") {
    val rnd = new scala.util.Random(7)
    // magnitudes spanning the q154 regime (cents² products ~1e14) up to
    // carry-exercising 2^62-scale values, both signs
    val xs = Seq.fill(5000)(rnd.nextLong() / (1L << rnd.nextInt(40)))
    val got = xs.toDF("x").repartition(7)
      .agg(sum128($"x").as("s")).head().getDecimal(0)
    assert(BigDecimal(got) == decimalRef(xs))
  }

  test("sum128 carries correctly where a long sum would overflow") {
    val xs = Seq.fill(64)(Long.MaxValue) ++ Seq.fill(8)(Long.MinValue)
    val got = xs.toDF("x").repartition(5)
      .agg(sum128($"x").as("s")).head().getDecimal(0)
    assert(BigDecimal(got) == decimalRef(xs), s"got $got")
  }

  test("sum128 is grouped-correct and treats nulls as zero") {
    val df = Seq(
      ("a", Some(10L)), ("a", None), ("a", Some(-3L)),
      ("b", Some(Long.MaxValue)), ("b", Some(Long.MaxValue)),
      ("c", None)).toDF("k", "x").repartition(3)
    val got = df.groupBy($"k").agg(sum128($"x").as("s"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(got("a") == BigDecimal(7))
    assert(got("b") == BigDecimal(Long.MaxValue) * 2)
    assert(got("c") == BigDecimal(0))
  }

  test("grouped sum128 hash-aggregates with a partial (map-side) stage") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "x")
    val plan = df.groupBy($"k").agg(sum128($"x"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") &&
      !plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"sum128 must hash-aggregate:\n$plan")
    assert(plan.contains("partial_sum128"),
      s"sum128 must map-side combine:\n$plan")
  }
}
