package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without a cartesian product.
  *
  * Spark has no native range-join operator: a `lo <= t && t < hi` or
  * `|ta-tb| <= w` predicate plans as BroadcastNestedLoopJoin (fine only
  * while one side broadcasts) or a cartesian-per-key nested loop — at
  * 100 TB both are non-starters. The classic fix (implemented by
  * Databricks' range-join hint and Flink's interval join) is a
  * fixed-width bin overlay that turns the inequality into a shuffled
  * EQUI-join on the bin id plus an exact residual predicate. Two faces:
  *
  *  - [[selfPairsWithin]]: same-key event pairs within a time window
  *    (bucketize, explode one side to {b-1, b, b+1}, equi-join, filter);
  *  - [[pointInInterval]]: point-in-[lo, hi) containment (intervals
  *    register in every bin they overlap, points in exactly one).
  *
  * Pair work drops from Σ|key group|² to Σ|bucket group|² — bounded by
  * data density per window, not key cardinality. Skewed bins (a hot
  * time window) compose with [[Relational.saltedJoinAdaptive]] on the
  * bin column.
  */
object RangeJoin {

  /** Self-join pairs (id_a < id_b) within `windowSec` seconds on the same
    * key. Times are floored to whole seconds (matches the DuckDB oracle's
    * integer-epoch comparison). Returns the pair ids, both timestamps'
    * epoch seconds, and all pair-payload columns prefixed a_/b_ from
    * `payload`. For a given pair exactly one of the three neighbor
    * buckets matches, so no dedup is needed. */
  def selfPairsWithin(df: DataFrame, key: String, id: String, tsCol: String,
                      windowSec: Long, payload: Seq[String] = Nil): DataFrame = {
    val base = df.withColumn("__s", unix_timestamp(col(tsCol)))
      .withColumn("__bucket", floor(col("__s") / windowSec))
    val a = base.select(
      col(key).as("__k") +: col("__bucket").as("__ba") +:
        col(id).as("id_a") +: col("__s").as("s_a") +:
        payload.map(c => col(c).as(s"a_$c")): _*)
    val b = base
      .withColumn("__cand", explode(array(col("__bucket") - 1, col("__bucket"), col("__bucket") + 1)))
      .select(
        col(key).as("__kb") +: col("__cand") +:
          col(id).as("id_b") +: col("__s").as("s_b") +:
          payload.map(c => col(c).as(s"b_$c")): _*)
    a.join(b, col("__k") === col("__kb") && col("__ba") === col("__cand"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("s_a") - col("s_b")) <= windowSec)
      .drop("__k", "__kb", "__ba", "__cand")
  }

  /** Join `points` (event column `pt`, a long — e.g. epoch seconds) to
    * `intervals` (half-open [lo, hi), same unit) on containment:
    * lo <= pt < hi. Returns all columns from both sides; column name
    * collisions must be resolved by the caller beforehand.
    *
    * Each interval registers in every bin it overlaps (`ceil(len/W) + 1`
    * bins — a small constant when `binWidth` ≳ interval length); each
    * point lands in exactly ONE bin, so every containing interval is met
    * exactly once and no dedup stage is needed. */
  def pointInInterval(points: DataFrame, pt: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // floor division built from pmod so negative epochs bin correctly
    // (long `div` truncates toward zero); the numerator is exactly
    // divisible by binWidth, so the double quotient is exact for any
    // |value| < 2^53 — epoch seconds/millis by a wide margin
    def binOf(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    val p = points.withColumn("__bin", binOf(pt))
    // hi is exclusive: an interval touching a bin boundary exactly at hi
    // contributes nothing to that bin, so the last registered bin is the
    // one containing (hi - 1). Empty intervals (hi <= lo) are dropped
    // up front — Spark's sequence() would otherwise step DOWNWARD from
    // binOf(lo) and register the interval in bins it never overlaps.
    val iv = intervals.filter(lo < hi)
      .withColumn("__bin", explode(sequence(binOf(lo), binOf(hi - lit(1L)))))
    p.join(iv, Seq("__bin"))
      .filter(lo <= pt && pt < hi)
      .drop("__bin")
  }

  /** Overlap join of two CLOSED-interval sets [aLo, aHi] × [bLo, bHi]
    * (same long unit, e.g. epoch seconds): pairs with
    * aLo ≤ bHi AND bLo ≤ aHi (touching endpoints overlap), each pair
    * emitted EXACTLY once with no dedup stage. Both sides register in
    * every bin they overlap; the pair is then CLAIMED by the single bin
    * containing max(aLo, bLo) — a point that lies inside both intervals
    * whenever they overlap, so exactly one of the shared bins keeps the
    * pair and the inequality becomes a bin equi-join plus a residual
    * predicate (the Flink/Databricks interval-join construction, the
    * interval-interval face of [[pointInInterval]]).
    *
    * `keys` optionally co-groups the join (same-key overlap only) —
    * the bin shuffle then keys on (keys, bin). Empty intervals
    * (hi < lo) are dropped up front. Column names must not collide
    * across `a` and `b` (caller renames beforehand, as with
    * [[pointInInterval]]). Explode width is ceil(len/W)+1 bins per
    * interval — pick `binWidth` of the order of typical interval
    * length. */
  def intervalOverlap(a: DataFrame, aLo: Column, aHi: Column,
                      b: DataFrame, bLo: Column, bHi: Column,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def binOf(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    val av = a.filter(aLo <= aHi)
      .withColumn("__bin", explode(sequence(binOf(aLo), binOf(aHi))))
    val bv = b.filter(bLo <= bHi)
      .withColumn("__bin", explode(sequence(binOf(bLo), binOf(bHi))))
    av.join(bv, keys :+ "__bin")
      .filter(aLo <= bHi && bLo <= aHi &&
        binOf(greatest(aLo, bLo)) === col("__bin"))
      .drop("__bin")
  }
}
