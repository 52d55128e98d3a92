package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — pairs of rows on the same key whose timestamps
  * lie within `windowSec` of each other. Spark plans a naive
  * `|ta-tb| <= w` predicate as a cartesian-per-key nested loop; the
  * scalable form here is the standard bucketization trick: quantize time
  * to w-second buckets, explode one side to its {b-1, b, b+1} neighbor
  * buckets, equi-join on (key, bucket), then apply the exact predicate.
  * For a given pair exactly one of the three neighbor buckets matches, so
  * no dedup is needed. Pair work drops from Σ|key group|² to
  * Σ|bucket group|² — bounded by data density per window, not key
  * cardinality.
  */
object RangeJoin {

  /** Self-join pairs (id_a < id_b) within `windowSec` seconds on the same
    * key. Times are floored to whole seconds (matches the DuckDB oracle's
    * integer-epoch comparison). Returns the pair ids, both timestamps'
    * epoch seconds, and all pair-payload columns prefixed a_/b_ from
    * `payload`. */
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
}
