package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference pipeline's scalar feature expressions (SURVEY.md §2.3),
  * re-expressed as pure Catalyst `Column` functions — no UDFs, so every
  * one of them stays inside whole-stage codegen and is usable identically
  * in batch and Structured Streaming plans.
  *
  * Reference sites (all in /root/reference/): the streaming feature chain
  * `sparkConsumer.py:84-97`, the serving copy `deployment/main.py:23-57`,
  * and the dashboard variants `deployment/pages/1_EDA_Dashboard.py:84-117`.
  */
object TripFeatures {

  /** Producer timestamp format (kafkaProducer.py:12-16 DateTimeEncoder). */
  val IsoPattern = "yyyy-MM-dd'T'HH:mm:ss"

  /** E1 — strict parse, parity with sparkConsumer.py:85-86 (fractional
    * seconds → null, a documented reference quirk). try_to_timestamp
    * because Spark 4's ANSI mode would otherwise *throw* where Spark 3.5
    * returned null — the reference's observable behavior is null. */
  def parseIsoStrict(s: Column): Column = try_to_timestamp(s, lit(IsoPattern))

  /** E1 lenient variant — accepts fractional seconds. */
  def parseIsoLenient(s: Column): Column = to_timestamp(s)

  /** E14 — render a timestamp the way the reference producer serialized it. */
  def toIso(ts: Column): Column = date_format(ts, IsoPattern)

  /** E2 — trip duration in minutes (sparkConsumer.py:87-88), unrounded. */
  def tripDurationMin(pickup: Column, dropoff: Column): Column =
    (unix_timestamp(dropoff) - unix_timestamp(pickup)) / 60.0

  /** E6 — zero-guarded ratio (sparkConsumer.py:96): 0 when the denominator
    * is exactly 0, null when it is null. */
  def zeroGuardedRatio(num: Column, den: Column): Column =
    when(den === 0, 0.0).otherwise(num / den)

  /** E7 — time-of-day bucketing (sparkConsumer.py:71-80), as a native when
    * chain instead of the reference's Python UDF (which forced a
    * BatchEvalPython barrier per micro-batch, SURVEY.md §3.1). Null hour →
    * null (the reference UDF would raise; documented divergence). */
  def timeOfDay(hour: Column): Column =
    when(hour.isNull, lit(null: String))
      .when(hour >= 6 && hour < 12, "morning")
      .when(hour >= 12 && hour < 16, "afternoon")
      .when(hour >= 16 && hour < 22, "evening")
      .otherwise("late night")

  /** E8 — the dashboard's *different* cutpoints (1_EDA_Dashboard.py:84-92). */
  def timeOfDayDashboard(hour: Column): Column =
    when(hour.isNull, lit(null: String))
      .when(hour >= 5 && hour < 12, "Morning")
      .when(hour >= 12 && hour < 17, "Afternoon")
      .when(hour >= 17 && hour < 21, "Evening")
      .otherwise("Night")

  /** E5 canonical — Saturday/Sunday (featureEngineering.ipynb cell 12).
    * Spark dayofweek: 1=Sunday .. 7=Saturday. */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** E5 stream-parity variant — the reference stream's Friday/Saturday bug
    * (`dayofweek.isin(6,7)` at sparkConsumer.py:95), preserved knowingly
    * behind an explicit name. */
  def isWeekendStreamParity(ts: Column): Column = dayofweek(ts).isin(6, 7)

  /** E4 — pandas weekday numbering (0=Monday..6=Sunday) from Spark's
    * dayofweek (1=Sunday..7=Saturday), for dashboard-parity queries. */
  def pandasWeekday(ts: Column): Column = (dayofweek(ts) + 5) % 7

  /** E11 — full day name plus a Monday-first sort key. */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** E10 — payment-type decode map (1_EDA_Dashboard.py:107-117). */
  def paymentTypeName(code: Column): Column =
    when(code === 1, "Credit card")
      .when(code === 2, "Cash")
      .when(code === 3, "No charge")
      .when(code === 4, "Dispute")
      .when(code === 5, "Unknown")
      .when(code === 6, "Voided trip")
      .otherwise("Other")

  /** E12 — speed in mph from miles and minutes; zero-duration trips
    * (identical pickup/dropoff timestamps exist in the real data) map to
    * 0 via the same guard as fare_per_mile rather than an ANSI throw. */
  def speedMph(distanceMiles: Column, durationMin: Column): Column =
    zeroGuardedRatio(distanceMiles, durationMin / 60.0)

  /** P5 — the reference's null-impute-and-cast
    * (`when(isNull,0).otherwise(cast(double))`, sparkML.py:58-64) as one
    * expression per column, folded over the frame. */
  def imputeZeroCastDouble(df: DataFrame, cols: Seq[String]): DataFrame =
    // try_cast, not cast: under this build's ANSI mode a plain cast
    // THROWS on an uncastable string (e.g. "N/A" from a CSV upload),
    // where the Spark 3.5 reference yielded null → imputed 0.0. Same
    // null-to-zero outcome, no query-killing exception.
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, coalesce(expr(s"try_cast(`$c` AS DOUBLE)"), lit(0.0))))

  /** The full 9-column enrichment chain of sparkConsumer.py:84-97 over a
    * generic (pickupTs, dropoffTs, fare, distance) trip frame. One narrow
    * projection — no shuffle, fully codegen'd, streaming-safe. */
  def enrich(df: DataFrame, pickupTs: String = "tpep_pickup_datetime",
             dropoffTs: String = "tpep_dropoff_datetime",
             fare: String = "fare_amount",
             distance: String = "trip_distance"): DataFrame = {
    val p = col(pickupTs)
    val d = col(dropoffTs)
    df.withColumns(Map(
      "trip_duration"     -> tripDurationMin(p, d),
      "pickup_hour"       -> hour(p),
      "dropoff_hour"      -> hour(d),
      "pickup_day"        -> dayofweek(p),
      "dropoff_day"       -> dayofweek(d),
      "pickup_timeofday"  -> timeOfDay(hour(p)),
      "dropoff_timeofday" -> timeOfDay(hour(d)),
      "pickup_is_weekend" -> isWeekend(p),
      "fare_per_mile"     -> zeroGuardedRatio(col(fare), col(distance))))
  }

  /** P4 — the reference's `passenger_count != 0` filter with its
    * three-valued-logic null drop (sparkConsumer.py:97). */
  def dropZeroOrNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) =!= 0)
}
