package graft

import graft.operators.{Redact, Selection, TimeSeries}
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub replaces in rule order and counts what it replaced") {
    val df = Seq(
      (1L, "mail a.b-c@test.org and ip 10.0.0.1 twice x@y.io"),
      (2L, "ssn 123-45-6789 vs phone 555-123-4567"),
      (3L, "clean text, no pii at all")
    ).toDF("id", "text")
    val out = Redact.piiScrub(df, col("text"))
      .select($"id", $"n_email", $"n_ssn", $"n_phone", $"n_ipv4", $"redacted")
      .as[(Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 2L, "two emails")
    assert(out(1L)._5 === 1L, "one ip")
    assert(out(1L)._6 === "mail <EMAIL> and ip <IP> twice <EMAIL>")
    assert(out(2L)._3 === 1L, "ssn counted by the ssn rule, not phone")
    assert(out(2L)._4 === 1L)
    assert(out(2L)._6 === "ssn <SSN> vs phone <PHONE>")
    assert(out(3L) === ((3L, 0L, 0L, 0L, 0L, "clean text, no pii at all")))
  }

  test("weighted sample: heavy rows win proportionally; zero weight never picked") {
    // weights 90/10/0 over m=10 probes -> expect 9/1/0 picks
    val df = Seq((1L, 90L), (2L, 10L), (3L, 0L)).toDF("id", "w")
    val picks = Selection.weightedSystematicSample(df, $"id", $"w", 10, 2)
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(picks === Map(1L -> 9L, 2L -> 1L), s"got $picks")
  }

  test("weighted sample is invariant to the bucketing parameter") {
    val df = (0L until 200L).map(i => (i, (i % 7) + 1)).toDF("id", "w")
    def run(bw: Long): Seq[(Long, Long)] =
      Selection.weightedSystematicSample(df, $"id", $"w", 17, bw)
        .select($"pick", $"id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(1000) // one bucket = the naive global cumsum
    assert(run(8) === a, "8-wide buckets must pick the identical set")
    assert(run(37) === a, "non-divisor width too")
  }

  test("rolling z-score flags a planted spike, honors minObs, and sigma=0 strictness") {
    // key a: 6 flat buckets then a spike; minObs 3, lookback 4
    val rows = (1 to 6).map(i => ("a", i, 100L)) :+ (("a", 7, 130L))
    val out = TimeSeries.rollingZScore(rows.toDF("k", "b", "c"),
        "k", "b", $"c", lookback = 4, minObs = 3, z = 3)
      .select($"b", $"is_anomaly").as[(Int, Boolean)].collect().toMap
    assert(!out(1) && !out(2) && !out(3), "head buckets below minObs never flag")
    assert(!out(5) && !out(6), "flat region is not anomalous")
    assert(out(7), "spike over a zero-variance window flags (sigma=0 strict limit)")
  }

  test("rolling z-score integer compare matches the float z-score on a noisy window") {
    val vals = Seq(100L, 104L, 96L, 101L, 99L, 103L, 97L, 100L, 102L, 98L)
    val df = (vals :+ 140L).zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "b", "c")
    val flagged = TimeSeries.rollingZScore(df, "k", "b", $"c", 10, 5, 3)
      .filter($"is_anomaly").select($"b").as[Int].collect().toSet
    // float check for the last bucket: mean=100, var=6 -> sigma~2.45; |140-100| >> 3 sigma
    assert(flagged === Set(10), s"only the planted outlier: $flagged")
  }
}
