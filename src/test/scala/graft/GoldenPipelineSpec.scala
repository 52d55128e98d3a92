package graft

import org.apache.spark.sql.functions._

import graft.functions.TripFeatures
import graft.operators.Relational

/** Golden end-to-end (SURVEY.md §5): the FIXTURES.md A1 edge rows through
  * the full reference chain — strict parse → enrich → P4 filter → A5
  * grouped mean — against hand-computed expected outputs. */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md A1 mandatory rows: clean row / null cluster / zero
  // passengers / zero distance / fractional-second ts / negative duration
  // / 2002 outlier.
  private lazy val raw = Seq(
    ("2024-05-01T08:30:00", "2024-05-01T08:45:00", Some(2.0), 3.0, 15.0),   // clean morning
    ("2024-05-01T10:00:00", "2024-05-01T10:30:00", None, 1.0, 9.0),         // null cluster
    ("2024-05-01T11:00:00", "2024-05-01T11:20:00", Some(0.0), 2.0, 8.0),    // zero passengers
    ("2024-05-04T23:10:00", "2024-05-04T23:40:00", Some(1.0), 0.0, 12.0),   // zero distance, late night Sat
    ("2024-05-01T13:00:00.500", "2024-05-01T13:20:00", Some(1.0), 2.0, 10.0), // fractional secs
    ("2024-05-03T12:00:00", "2024-05-03T11:00:00", Some(3.0), 4.0, 20.0),   // negative duration
    ("2002-12-31T23:59:00", "2003-01-01T00:09:00", Some(1.0), 1.0, 5.0)     // 2002 outlier
  ).toDF("tpep_pickup_datetime_raw", "tpep_dropoff_datetime_raw",
    "passenger_count", "trip_distance", "fare_amount")

  private lazy val cleaned = {
    val parsed = raw
      .withColumn("tpep_pickup_datetime",
        TripFeatures.parseIsoStrict($"tpep_pickup_datetime_raw"))
      .withColumn("tpep_dropoff_datetime",
        TripFeatures.parseIsoStrict($"tpep_dropoff_datetime_raw"))
    TripFeatures.dropZeroOrNull(TripFeatures.enrich(parsed), "passenger_count")
  }

  test("survivors: null/zero passengers dropped; fractional-ts row nulls out of buckets") {
    // 7 rows: minus null passenger, minus zero passenger = 5 survivors.
    assert(cleaned.count() == 5)
    // The fractional-second pickup fails the strict pattern (E1) → null
    // pickup features but the row itself SURVIVES (filter is on
    // passenger_count) — same observable as the reference stream.
    val frac = cleaned.filter($"tpep_pickup_datetime".isNull)
    assert(frac.count() == 1)
    assert(frac.select($"pickup_timeofday").collect()(0).isNullAt(0))
  }

  test("A5 grouped mean over enriched buckets matches hand-computed values") {
    val got = cleaned
      .filter($"pickup_timeofday".isNotNull)
      .groupBy($"pickup_timeofday")
      .agg(round(avg($"fare_amount"), 2).as("avg_fare"),
           count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // morning: clean row only → 15.0; afternoon: negative-duration row
    // (12:00) → 20.0; late night: Sat 23:10 → 12.0, 2002 23:59 → 5.0.
    assert(got("morning") == ((15.0, 1L)))
    assert(got("afternoon") == ((20.0, 1L)))
    assert(got("late night") == ((8.5, 2L)))
  }

  test("weekend flags and duration signs match the reference semantics") {
    val rows = cleaned.filter($"tpep_pickup_datetime".isNotNull)
      .select($"trip_duration", $"pickup_is_weekend", dayofweek($"tpep_pickup_datetime"))
      .collect()
    // negative duration preserved (no filter in the reference)
    assert(rows.exists(_.getDouble(0) == -60.0))
    // Saturday 2024-05-04 flagged weekend under canonical Sat/Sun rule
    assert(rows.filter(_.getInt(2) == 7).forall(_.getBoolean(1)))
  }

  test("IQR filter on the golden fares drops the negative-duration outlier fare") {
    val kept = Relational.iqrFilter(
      cleaned.select($"fare_amount"), "fare_amount")
    assert(kept.count() <= 5)
  }
}
