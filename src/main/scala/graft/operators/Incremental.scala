package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a small per-group STATE table
  * (count / cent-exact sum / min / max) and fold each new batch into it,
  * instead of re-aggregating history.
  *
  * Why this matters at 100 TB: a daily "metrics by group" job that
  * re-scans all history does O(total) work per run forever. Because
  * these aggregates are commutative monoids, state(old ⊎ new) =
  * merge(state(old), state(new)) — each run aggregates ONLY the new
  * batch (one map-side-combinable shuffle over the delta) and merges it
  * with the prior state (a |groups|-row frame). This is the batch twin
  * of the streaming sink's fold (q91, StreamPipeline) and the classic
  * materialized-view maintenance construction; AVG is derived at
  * finalize time as sum/count rather than being averaged across batches
  * (averages of averages are wrong under unequal batch sizes).
  *
  * Sums are cent-quantized BIGINTs ([[Relational.centsSum]] pattern), so
  * the fold is EXACTLY associative — float sums would drift with batch
  * boundaries and break the oracle's state(old ⊎ new) == fold identity.
  */
object Incremental {

  /** Aggregate one batch into state rows: (keys..., n, sum_cents, mn, mx). */
  def aggState(batch: DataFrame, keys: Seq[String], value: Column): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(round(value * 100).cast("long")).as("sum_cents"),
      min(value).as("mn"),
      max(value).as("mx"))

  /** Fold any number of state tables into one: the monoid merge.
    * Input and output schema are identical, so merging is closed —
    * yesterday's merged state folds with today's batch state. */
  def mergeStates(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Render state for consumption: money sum back to dollars, AVG derived
    * from the exact (sum_cents, n) pair — one long/long division, not an
    * average of per-batch floats. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      state.columns.filterNot(Set("n", "sum_cents", "mn", "mx")).map(col) ++ Seq(
        col("n"),
        (col("sum_cents").cast("double") / 100.0).as("total"),
        round(col("sum_cents").cast("double") / col("n") / 100.0, 4).as("avg_value"),
        col("mn"), col("mx")): _*)
}
