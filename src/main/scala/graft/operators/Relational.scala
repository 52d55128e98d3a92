package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic relational operators from SURVEY.md §2.2/§2.5, parameterized by
  * column. Every operator is expressed as a declarative plan (no
  * `.collect()`-then-refilter, no driver-side loops), so each one scales to
  * arbitrary input size: scalar statistics (quantile bounds, min/max) are
  * computed as single-row aggregates and re-attached with a broadcast
  * cross-join, which Catalyst plans as a BroadcastNestedLoopJoin over one
  * row — a no-shuffle pattern that works identically at 100 TB.
  */
object Relational {

  /** Exact cent-quantized sum of a money column: `sum(round(c*100)::long)`.
    * Per-element quantization is bit-deterministic across engines and the
    * integer sum is associative, so results are exactly reproducible
    * regardless of partitioning/merge order — unlike a raw double sum,
    * whose low bits depend on aggregation order. Used for every money SUM
    * in the oracle-checked suite. */
  def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))

  /** Cent-quantized sum rendered back to currency units (exact / 100.0). */
  def moneySum(c: Column): Column = centsSum(c) / 100.0

  /** A4 — top-k groups by frequency with a deterministic tie-break. */
  def topKByCount(df: DataFrame, keys: Seq[Column], k: Int): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc +: keys.map(_.asc): _*)
      .limit(k)

  /** Single-row frame of interquartile bounds for `c` (exact percentiles,
    * A13): (lo, hi) = (Q1 - f·IQR, Q3 + f·IQR). One array-percentile
    * aggregate — Percentile is a buffer-all TypedImperativeAggregate, so
    * asking for the quantiles together halves the buffered data vs two
    * separate percentile calls. */
  def iqrBounds(df: DataFrame, c: String, factor: Double = 1.5): DataFrame =
    df.agg(percentile(col(c), array(lit(0.25), lit(0.75))).as("qs"))
      .select(element_at(col("qs"), 1).as("q1"), element_at(col("qs"), 2).as("q3"))
      .select((col("q1") - lit(factor) * (col("q3") - col("q1"))).as("lo"),
              (col("q3") + lit(factor) * (col("q3") - col("q1"))).as("hi"))

  /** P8 — IQR outlier filter (featureEngineering.ipynb cell 20;
    * 1_EDA_Dashboard.py:141-148). The bounds row is broadcast, not
    * collected: one aggregate job + one narrow filtered scan. */
  def iqrFilter(df: DataFrame, c: String, factor: Double = 1.5): DataFrame =
    df.crossJoin(broadcast(iqrBounds(df, c, factor)))
      .filter(col(c) >= col("lo") && col(c) <= col("hi"))
      .drop("lo", "hi")

  /** A15 — equal-width histogram: bucket = min(floor((x-min)/w), bins-1).
    * Min/max come from one aggregate, broadcast back; the bucketing itself
    * is a narrow map + one hash aggregate. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    val m = df.agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
    df.crossJoin(broadcast(m))
      // mn == mx guard: a constant column is one bucket, not a
      // divide-by-zero (which ANSI mode turns into a query-killing throw)
      .select(when(col("mn") === col("mx"), lit(0L))
        .otherwise(least(floor((col(c) - col("mn")) / ((col("mx") - col("mn")) / bins)),
                   lit(bins - 1L)).cast("long")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))
  }

  /** A16 — per-column null-count profile in a single aggregate pass. */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
           cols.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c")): _*)

  /** A13/A14/A17 — describe-style exact summary of one numeric column.
    * The three quartiles share one percentile buffer (see iqrBounds). */
  def summaryStats(df: DataFrame, c: String, scale: Int = 6): DataFrame =
    df.agg(
      count(col(c)).as("n"),
      round(avg(col(c)), scale).as("mean"),
      round(stddev_samp(col(c)), scale).as("sd"),
      min(col(c)).as("mn"),
      percentile(col(c), array(lit(0.25), lit(0.5), lit(0.75))).as("qs"),
      max(col(c)).as("mx"))
    .select(col("n"), col("mean"), col("sd"), col("mn"),
      round(element_at(col("qs"), 1), scale).as("q1"),
      round(element_at(col("qs"), 2), scale).as("median"),
      round(element_at(col("qs"), 3), scale).as("q3"),
      col("mx"))

  /** Skew-salted equi-join: replicates each build-side row `salt` times
    * and scatters probe-side rows uniformly across the replicas, so one
    * hot key spreads over `salt` tasks instead of stalling a single
    * reducer. Semantics-preserving for any 1:N equi-join (each probe row
    * meets exactly one replica of its match). AQE's skew-join split
    * handles sort-merge cases automatically; this explicit form covers
    * hash joins and pre-AQE plans, and documents the technique.
    *
    * Probe salt is `pmod(hash(all probe columns), salt)` — deterministic,
    * so results are reproducible run-to-run. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salt: Int = 8): DataFrame = {
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col): _*), lit(salt)))
    saltedProbe.join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey) &&
          saltedProbe("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }

  /** Approximate describe for the 100 TB path: t-digest quantiles and HLL
    * distinct count instead of the buffer-all exact Percentile (which
    * holds every value in memory per partition — fine at bench SFs,
    * impossible at petabyte group sizes). NOT oracle-hashable by design;
    * accuracy is asserted against the exact form in tests. */
  def summaryStatsApprox(df: DataFrame, c: String, accuracy: Int = 10000): DataFrame =
    df.agg(
      count(col(c)).as("n"),
      approx_count_distinct(col(c), 0.02).as("n_distinct_approx"),
      avg(col(c)).as("mean"),
      approx_percentile(col(c), array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("qs"))
    .select(col("n"), col("n_distinct_approx"), col("mean"),
      element_at(col("qs"), 1).as("q1"),
      element_at(col("qs"), 2).as("median"),
      element_at(col("qs"), 3).as("q3"))

  /** A12 — argmax row per group via a rank-1 window (deterministic
    * tie-break on `tieBreak` ascending). */
  def argmaxPerGroup(df: DataFrame, part: Column, order: Column,
                     tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(part).orderBy(order.desc, tieBreak.asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
