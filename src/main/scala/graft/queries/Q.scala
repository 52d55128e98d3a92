package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB for the hash-compare.
  *
  * Contract notes (from the driver):
  *  - result column names must match the oracle's exactly (compare sorts
  *    columns by name before hashing);
  *  - every query orders its output deterministically with full tie-breaks;
  *  - double outputs are either exact (cent-quantized integer sums, see
  *    [[graft.operators.Relational.centsSum]]) or rounded at a scale where
  *    cross-engine float-summation-order noise is orders of magnitude
  *    smaller than the rounding step.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** The ONE mtime-keyed layout-cache path builder (previously copy-pasted
  * at every materialized layout/index call site): caches key on the
  * SOURCE parquet's path + lastModified, so a regenerated source
  * invalidates every derived layout (q94 discipline). java.io.File mtime
  * probing is local-FS only — a real deployment swaps this for the
  * Hadoop FileSystem mtime ([[graft.io.Fs]]) and a durable cache root. */
object LayoutKey {
  def dir(d: String, table: String, tag: String): String = {
    val src = new java.io.File(s"$d/$table.parquet")
    "/tmp/graft_layout/" +
      s"${src.getPath.replaceAll("[^A-Za-z0-9._-]", "_")}_${src.lastModified}" +
      s"/$tag"
  }

  /** Multi-source variant: the cache key folds in EVERY input table's
    * mtime (the ScaleStress replica discipline — "any table, not just
    * lineitem"), so regenerating ANY of them invalidates the layout.
    * A single-table key here would silently serve edges derived from
    * stale sibling tables (round-13 review catch on TradeGraph). */
  def dir(d: String, tables: Seq[String], tag: String): String = {
    require(tables.nonEmpty, "need at least one source table")
    val head = new java.io.File(s"$d/${tables.head}.parquet")
    // fold each table's NAME into the stamp alongside its mtime: a
    // bare mtime list would collide when a caller later swaps one
    // sibling table for another written by the same datagen run
    // (identical mtimes → identical key → stale layout served).
    // The ':' delimiter keeps (name, mtime) pairs unambiguous — a
    // table name ending in digits would otherwise let two distinct
    // pairs concatenate to the same stamp (round-13 ADVICE).
    // Note java.io lastModified is 0 for a MISSING file — the key
    // still differs once the file appears, so absence never pins a
    // stale layout past the table's creation.
    val stamp = tables
      .map(t => s"$t:${new java.io.File(s"$d/$t.parquet").lastModified}")
      .mkString("-")
    "/tmp/graft_layout/" +
      s"${head.getPath.replaceAll("[^A-Za-z0-9._-]", "_")}_$stamp" +
      s"/$tag"
  }
}

object Registry {
  /** Insertion-ordered full suite. */
  lazy val all: Seq[(String, Q)] = {
    val qs = RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      ExtendedQueries.all ++ ScaleQueries.all ++ OlapQueries.all ++
      AnalyticsQueries.all ++ StatsQueries.all ++ CurationQueries.all ++
      PipelineQueries.all
    // a duplicate name would silently shadow a query in the toMap below —
    // the shadowed one would neither run nor be oracled, with no signal
    val dups = qs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    // Some(null) oracles happen via object-initialization-order slips
    // (a val captured before its initializer ran) and would NPE the
    // Verify dump after all queries executed — fail at first touch instead
    val nullSql = qs.collect { case (n, Q(_, Some(null), _)) => n }
    require(nullSql.isEmpty, s"null oracle SQL (init order?): ${nullSql.mkString(", ")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql }.toMap
}
