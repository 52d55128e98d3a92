package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that a
  * range predicate on EITHER (or both) of two columns maps to a compact
  * set of files instead of the whole store.
  *
  * Why this matters at 100 TB: partition pruning (q94) handles ONE
  * coarse-grained column; sorting handles one fine-grained column. A
  * second selective column is stranded — a `y BETWEEN` predicate over an
  * x-sorted layout touches every file. Interleaving the bits of both
  * columns into one sort key (Morton, "A computer oriented geodetic data
  * base", IBM 1966 — the construction behind Delta Lake's OPTIMIZE
  * ZORDER) makes file min/max ranges of the z-key correspond to aligned
  * rectangles in (x, y) space, so a box predicate on either dimension
  * intersects only the files whose rectangle overlaps it (~sqrt of the
  * file count for a single-dimension slice, vs all of them for a linear
  * sort on the other column). Works with plain `repartitionByRange` +
  * `sortWithinPartitions` + Parquet row-group stats — no table format
  * needed.
  *
  * Everything here is integer bit arithmetic — codegen'd, portable, and
  * re-derivable in DuckDB SQL ([[zOracleExpr]]) so the oracle verifies
  * the interleave bit-for-bit.
  */
object Layout {

  /** Morton-interleave two non-negative int columns (each < 2^bits) into
    * one long: bit b of x lands at position 2b, bit b of y at 2b+1.
    * Built as a fold of shift/mask terms — whole-stage-codegen folds it
    * to straight-line long arithmetic. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
  }

  /** DuckDB SQL for the identical interleave (for oracle queries):
    * `xExpr`/`yExpr` are integer SQL expressions. */
  def zOracleExpr(xExpr: String, yExpr: String, bits: Int): String =
    (0 until bits).flatMap { b =>
      Seq(s"((($xExpr >> $b) & 1) << ${2 * b})",
        s"((($yExpr >> $b) & 1) << ${2 * b + 1})")
    }.mkString("(CAST(", " | ", " AS BIGINT))")

  /** Write `df` clustered by the z-value of (x, y): range-partition into
    * `nFiles` z-ranges, sort within each, drop the helper column. The
    * result directory has one file per z-range whose Parquet min/max
    * stats cover an aligned (x, y) rectangle — the physical layout that
    * makes [[zValue]]-unaware readers still skip row groups via pushed
    * x/y predicates, and z-aware readers skip whole files.
    *
    * `repartitionByRange` samples range boundaries (nondeterministic file
    * SPLIT points, deterministic CONTENT per z-run) — so oracle checks
    * pin the z math and query RESULTS, while the file-skipping win is
    * asserted as a physical property in ScalePostureSpec. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
                    nFiles: Int, path: String): Unit = {
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
