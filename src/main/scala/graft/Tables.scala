package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every query takes the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * by extension, on a partitioned cluster path at any scale: `spark.read
  * .parquet` splits by row-group, so scans parallelize for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`:
    * events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for. With the flag the column arrives as nanos-since-epoch LongType
    * and is truncated here to a microsecond TimestampType — the same
    * truncation Spark applies everywhere else, and what DuckDB's µs
    * comparisons see after date_trunc. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
