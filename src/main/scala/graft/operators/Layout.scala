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

  /** Append a Hilbert-curve index column `out` for (x, y), each in
    * [0, 2^bits): the space-filling curve whose CONSECUTIVE index values
    * are always Manhattan-adjacent cells (Hilbert 1891; Faloutsos &
    * Roseman PODS'89 measured ~²⁄₃ fewer cluster breaks than Z-order on
    * box queries — why newer table formats offer it beside ZORDER).
    * Z-order jumps diagonally at every power-of-two boundary; Hilbert
    * never jumps, so file min/max ranges cover tighter rectangles.
    *
    * The classic per-level rotate-and-flip walks top bit to bottom; each
    * level materializes as its OWN projection (withColumn), so rx/ry are
    * computed once per level instead of re-expanding inside every
    * downstream reference (CollapseProject keeps non-cheap aliases
    * un-inlined, so the plan stays linear in `bits`). Pure long
    * arithmetic end-to-end: exact on any engine, mirrored level-for-
    * level by [[hilbertOracleCtes]]. */
  def withHilbert(df: DataFrame, x: Column, y: Column, bits: Int,
                  out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    var cur = df
      .withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out,
          col(out) + lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate/flip the quadrant frame: flip only in the rx=1, ry=0
        // quadrant, then swap axes whenever ry=0
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__hy",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__nx")
  }

  /** DuckDB CTE chain mirroring [[withHilbert]] level-for-level. Expects
    * a CTE (or table) `src`; emits `hilb_0 … hilb_{bits}` where
    * `hilb_{bits}` carries every `src` column plus `hx{bits}` (ignore),
    * `hy{bits}` (ignore) and `hd{bits}` — the Hilbert index. Unique
    * per-level column names sidestep lateral-alias shadowing. */
  def hilbertOracleCtes(src: String, xExpr: String, yExpr: String,
                        bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val lvl0 = s"""hilb_0 AS (SELECT *, CAST($xExpr AS BIGINT) AS hx0,
        CAST($yExpr AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM $src)"""
    val lvls = (0 until bits).map { lvl =>
      val i = bits - 1 - lvl // walk top bit to bottom, like the engine
      val s = 1L << i
      val n = lvl + 1
      s"""hilb_$n AS (SELECT *,
          CASE WHEN (hx$lvl & $s) > 0 THEN 1 ELSE 0 END AS rx$lvl,
          CASE WHEN (hy$lvl & $s) > 0 THEN 1 ELSE 0 END AS ry$lvl,
          hd$lvl + ${s * s} * xor(3 * rx$lvl, ry$lvl) AS hd$n,
          CASE WHEN ry$lvl = 0 THEN (CASE WHEN rx$lvl = 1
              THEN ${s - 1} - hy$lvl ELSE hy$lvl END)
            ELSE hx$lvl END AS hx$n,
          CASE WHEN ry$lvl = 0 THEN (CASE WHEN rx$lvl = 1
              THEN ${s - 1} - hx$lvl ELSE hx$lvl END)
            ELSE hy$lvl END AS hy$n
        FROM hilb_$lvl)"""
    }
    (lvl0 +: lvls).mkString(",\n")
  }

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

  /** Small-file compaction — the unglamorous op every 100 TB lake runs
    * nightly: streaming appends and over-parallel writers leave
    * thousands of KB-sized files, and every downstream scan then pays a
    * task + an open + a footer parse PER FILE (driver-side listing and
    * scheduling grow the same way). Rewrites `inDir` into `outDir`
    * sized at `targetBytes` per output file, file count derived from
    * the layout's ACTUAL on-disk size via the Hadoop FileSystem (never
    * java.io — the count must be right on HDFS/S3A too). `coalesce`,
    * not `repartition`: compaction must not pay a shuffle — each output
    * task concatenates input splits. Returns the output file count.
    *
    * Content is preserved row-for-row (spec-pinned); ORDER is not — a
    * layout that needs clustering compacts through [[writeZOrdered]] /
    * `repartitionByRange` instead, paying the sort deliberately. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(conf)
    // outDir == inDir is caught by Spark's self-overwrite check, but
    // nesting in EITHER direction is not: an outDir inside inDir
    // silently pollutes the source layout (recursive listings /
    // getContentSummary double-count, partition discovery misreads the
    // injected dir), and an inDir inside outDir is worse — the
    // mode(overwrite) write CLEARS outDir including the nested source
    // Component-wise compare of the qualified URIs, each resolved
    // against ITS OWN FileSystem: different SCHEMES are different
    // filesystems (same path string allowed — the bare-path compare
    // falsely rejected hdfs:/x vs file:/x); within one scheme the
    // AUTHORITY is deliberately ignored, because two spellings of the
    // same store (file:///tmp vs file://localhost/tmp, hdfs://nn vs
    // hdfs://nn:8020) would otherwise slip past a whole-string
    // startsWith and let mode(overwrite) clear a nested source —
    // rejecting a same-scheme different-cluster pair is the cheap
    // conservative failure, silently destroying data is not
    val outPath0 = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath0.getFileSystem(conf)
    val inU = fs.makeQualified(inPath).toUri
    val outU = outFs.makeQualified(outPath0).toUri
    val inQ = Option(inU.getPath).getOrElse("").stripSuffix("/")
    val outQ = Option(outU.getPath).getOrElse("").stripSuffix("/")
    val sameScheme = Option(inU.getScheme) == Option(outU.getScheme)
    require(!sameScheme ||
        (outQ != inQ && !outQ.startsWith(inQ + "/") && !inQ.startsWith(outQ + "/")),
      s"inDir and outDir must not be equal or nested either way (in=$inU out=$outU)")
    val totalBytes = fs.getContentSummary(inPath).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    // report what was WRITTEN, not the coalesce target: coalesce cannot
    // raise the partition count, so fewer-than-planned files is normal
    // when the input already has few splits
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(conf).listStatus(outPath)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
