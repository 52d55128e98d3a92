package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * right.time <= left.time on the same key. Spark has no native ASOF, and
  * per the build charter's preference ladder this is tier (a): composed
  * from built-ins rather than a custom SparkPlan, because the classic
  * union+window formulation is already the scalable algorithm — ONE
  * shuffle on the key, one per-partition sort, one forward pass. A
  * custom sort-merge SparkPlan would save only the union overhead.
  *
  * Equal timestamps: the right row sorts before the left (sort key
  * (time, is_left)), so a right event at exactly left.time matches —
  * the `>=` convention of DuckDB's ASOF JOIN, which oracles this op.
  * Ties BETWEEN right rows at the same time are broken by a content
  * hash of the right row, making the attributed match deterministic
  * under any partitioning (DuckDB's ASOF leaves that pick arbitrary;
  * the driver fixtures carry no such ties, but an engine must not be
  * run-to-run nondeterministic on data that does).
  */
object AsOf {

  /** Left as-of join. Right columns come back prefixed `right_` (null
    * when no right row precedes the left row). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lTagged = left.select(left(key).as("__k"), left(leftTime).as("__t"),
      lit(1).as("__is_left"),
      struct(left.columns.map(left(_)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    // null-keyed right rows can never match (NULL = NULL is false in the
    // equi/ASOF semantics this mirrors) — but Window.partitionBy groups
    // null keys together, so they must be removed before the union or a
    // null-keyed left row would wrongly "match" them. Null-keyed left
    // rows still flow through and emit with a null match, as a left join
    // should.
    val rTagged = right.filter(right(key).isNotNull)
      .select(right(key).as("__k"), right(rightTime).as("__t"),
      lit(0).as("__is_left"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(right(_)): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__is_left").asc, xxhash64(col("__r")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"right_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * right.time >= left.time on the same key (the "next event after"
    * shape: next maintenance after a failure, next price tick after an
    * order). Mirror image of [[asOfJoin]]: same single-shuffle
    * union+window plan, with the frame flipped to currentRow→following
    * and the first non-null following right taken. At equal timestamps
    * the right row matches (left sorts before right via `__is_left`
    * desc), mirroring DuckDB's `ASOF ... ON l.t <= r.t`; ties between
    * right rows at the same time break by content hash, deterministic
    * under any partitioning. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lTagged = left.select(left(key).as("__k"), left(leftTime).as("__t"),
      lit(1).as("__is_left"),
      struct(left.columns.map(left(_)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rTagged = right.filter(right(key).isNotNull)
      .select(right(key).as("__k"), right(rightTime).as("__t"),
      lit(0).as("__is_left"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(right(_)): _*).as("__r"))
    // the forward match rides the REVERSED sort as a RUNNING frame (the
    // O(n) incremental form — an UnboundedFollowing frame re-scans the
    // remaining partition per row, O(n²) in the per-key row count):
    // preceding-or-current under (t desc, is_left asc, hash desc) is
    // exactly current-or-following under the forward order, and the
    // running `last` of non-nulls is the nearest right row at-or-after
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__is_left").asc, xxhash64(col("__r")).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"right_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
