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

  /** Slowly-changing-dimension type 2 build (Kimball's SCD2) from a
    * change stream of (key, ordinal, tiebreak, attribute) rows: collapse
    * consecutive rows whose attribute did NOT change, then stitch each
    * change's `valid_from` to the next change's ordinal as `valid_to`
    * (NULL = still current). The attribute compare is NULL-SAFE (`<=>`):
    * a NULL attribute is a real dimension state — x→NULL→x is two
    * changes, and plain `=!=` would misread both edges. The sibling of
    * [[graft.queries.RelationalQueries]] q80's CDC latest-state: q80
    * keeps the head of each key's history, this keeps the whole
    * versioned timeline a point-in-time join can range-probe.
    *
    * Scale shape: two window passes over the SAME (key)-partitioned
    * (ordinal, tiebreak) sort — Spark plans one Exchange + one Sort and
    * runs both lag and lead in that single sorted pass per key; state
    * is one row per key partition, never history-proportional. */
  def scd2(df: DataFrame, key: String, ord: String, tie: String,
           attr: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ord), col(tie))
    val changes = df
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attr) <=> col("__prev")))
    val wc = Window.partitionBy(col(key)).orderBy(col(ord), col(tie))
    changes
      .withColumn("valid_to", lead(col(ord), 1).over(wc))
      .withColumn("version", row_number().over(wc))
      .select(col(key), col(attr), col("version"),
        col(ord).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }
}
