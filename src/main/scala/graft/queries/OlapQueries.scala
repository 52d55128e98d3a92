package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Ranking, RangeJoin, Relational, Sketches}

/** Round-6 surface: the multidimensional-grouping family Spark and every
  * warehouse ship (ROLLUP / CUBE / GROUPING SETS / pivot) — absent from
  * both the reference and this engine until now — plus the remaining
  * LLM-corpus operators: BM25 lexical retrieval, the binned range join,
  * the HyperLogLog distinct sketch next to q98's KMV, and substring-span
  * duplication profiling (Lee et al. ACL'22).
  *
  * Rolled-up grouping rows surface NULL in the grouped columns; every
  * query here coalesces them to the '(all)' sentinel BEFORE ordering so
  * the Spark/DuckDB NULL-ordering difference (NULLS FIRST vs LAST) can
  * never reorder the compared output, and emits the grouping_id bitmask
  * so a rolled-up NULL is distinguishable from a (hypothetical) data
  * NULL.
  */
object OlapQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private val MoneySum =
    "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0"

  /** One statement, run by BOTH engines (q70 pattern). Defined before
    * `all` — a forward reference would be captured as null (the Registry
    * init-order guard exists precisely for that slip). */
  private val GroupingSetsSql =
    """SELECT coalesce(l_returnflag, '(all)') AS flag,
        coalesce(l_linestatus, '(all)') AS status,
        CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INTEGER) AS g_id,
        count(*) AS n_items,
        CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_id, flag, status"""

  val all: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------ ROLLUP
    // Hierarchy subtotals in ONE pass: region → nation → grand total.
    // Without rollup this is three separate aggregates (three shuffles,
    // three scans) union'd; Expand emits the three grouping projections
    // map-side, so the scan happens once and one hash aggregate carries
    // all levels — the textbook drill-down query at any scale. Dims
    // broadcast; the only input-proportional shuffle is the (still
    // partial-aggregated) expanded fact stream.
    "q117_rollup_revenue" -> Q(
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup($"r_name", $"n_name")
          .agg(grouping_id().cast("int").as("g_id"),
            count(lit(1)).as("n_orders"),
            Relational.moneySum($"o_totalprice").as("revenue"))
          .select(
            coalesce($"r_name", lit("(all)")).as("region"),
            coalesce($"n_name", lit("(all)")).as("nation"),
            $"g_id", $"n_orders", $"revenue")
          .orderBy($"g_id", $"region", $"nation")
      },
      Some("""SELECT coalesce(r_name, '(all)') AS region,
          coalesce(n_name, '(all)') AS nation,
          CAST(GROUPING(r_name, n_name) AS INTEGER) AS g_id,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY g_id, region, nation"""),
      "ROLLUP hierarchy subtotals (region -> nation -> total) in one pass"),

    // -------------------------------------------------------------- CUBE
    // All 2^2 grouping combinations of (returnflag, linestatus) in one
    // aggregate — the cross-tab backing every BI "totals row + totals
    // column" view. Same Expand shape as rollup: one scan, one shuffle.
    "q118_cube_flagstatus" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(grouping_id().cast("int").as("g_id"),
            count(lit(1)).as("n_items"),
            sum($"l_quantity").cast("long").as("sum_qty"))
          .select(
            coalesce($"l_returnflag", lit("(all)")).as("flag"),
            coalesce($"l_linestatus", lit("(all)")).as("status"),
            $"g_id", $"n_items", $"sum_qty")
          .orderBy($"g_id", $"flag", $"status")
      },
      Some("""SELECT coalesce(l_returnflag, '(all)') AS flag,
          coalesce(l_linestatus, '(all)') AS status,
          CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS g_id,
          count(*) AS n_items,
          CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_id, flag, status"""),
      "CUBE over (returnflag, linestatus): all grouping combinations, one pass"),

    // ---------------------------------------------------- GROUPING SETS
    // Explicit set list — the general form rollup/cube desugar to. One
    // statement shared verbatim with the oracle (the q70 pattern), so
    // the engine's SQL front door is exercised too.
    "q119_grouping_sets" -> Q(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(GroupingSetsSql)
      },
      Some(GroupingSetsSql),
      "GROUPING SETS ((flag), (status), ()): explicit multi-set aggregate via SQL"),

    // ------------------------------------------------------------- pivot
    // Long-to-wide: monthly revenue as one row per month with one column
    // per return flag. Spark's pivot with an EXPLICIT value list is one
    // hash aggregate (no distinct-values pre-scan, which an implicit
    // pivot needs and a 100 TB input can't afford); cents sums pivot as
    // longs, the money division happens after.
    "q120_pivot_monthly" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter(year($"l_shipdate") === 1995)
          .withColumn("month", date_format($"l_shipdate", "yyyy-MM"))
          .groupBy($"month")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(Relational.centsSum($"l_extendedprice"))
          .select($"month",
            ($"A" / 100.0).as("rev_a"),
            ($"N" / 100.0).as("rev_n"),
            ($"R" / 100.0).as("rev_r"))
          .orderBy($"month")
      },
      Some("""SELECT strftime(l_shipdate, '%Y-%m') AS month,
          CAST(sum(CASE WHEN l_returnflag = 'A'
            THEN CAST(round(l_extendedprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_a,
          CAST(sum(CASE WHEN l_returnflag = 'N'
            THEN CAST(round(l_extendedprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_n,
          CAST(sum(CASE WHEN l_returnflag = 'R'
            THEN CAST(round(l_extendedprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_r
        FROM lineitem WHERE year(l_shipdate) = 1995
        GROUP BY 1 ORDER BY month"""),
      "pivot (long-to-wide) with explicit value list: month x returnflag revenue"),

    // -------------------------------------------------------------- BM25
    // Lexical retrieval over the corpus: top-20 documents for a 3-term
    // query. See [[Ranking]] for the formula and the pre-filtered scale
    // shape (the token stream is cut to the query's vocabulary before
    // any shuffle).
    "q121_bm25_rank" -> Q(
      (s, d) => Ranking.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("join", "vector", "window"), topK = 20),
      Some(Ranking.bm25OracleSql("documents", "doc_id", "text",
        "'join','vector','window'", topK = 20)),
      "BM25 lexical retrieval: top-20 docs for a 3-term query"),

    // -------------------------------------------------------- range join
    // Point-in-interval without a cartesian: every lineitem shipped
    // inside the 7-day window after an urgent 1995-03 order's date. The
    // bin overlay ([[RangeJoin]]) turns the inequality join into a
    // shuffled EQUI-join on the bin id + an exact containment filter —
    // the shape that survives when neither side broadcasts.
    "q122_range_join" -> Q(
      (s, d) => {
        import s.implicits._
        val week = 7L * 86400
        val iv = t(s, d, "orders")
          .filter($"o_orderpriority" === "1-URGENT" &&
            date_format($"o_orderdate", "yyyy-MM") === "1995-03")
          .select($"o_orderkey", unix_timestamp($"o_orderdate").as("lo"))
          .withColumn("hi", $"lo" + week)
        val pts = t(s, d, "lineitem")
          .select($"l_extendedprice", unix_timestamp($"l_shipdate").as("pt"))
        RangeJoin.pointInInterval(pts, col("pt"), iv, col("lo"), col("hi"),
            binWidth = week)
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_shipped"),
            Relational.moneySum($"l_extendedprice").as("revenue"))
          .orderBy($"o_orderkey")
      },
      Some(s"""SELECT o_orderkey, count(*) AS n_shipped, $MoneySum AS revenue
        FROM orders JOIN lineitem
          ON l_shipdate >= o_orderdate
         AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        WHERE o_orderpriority = '1-URGENT'
          AND strftime(o_orderdate, '%Y-%m') = '1995-03'
        GROUP BY o_orderkey ORDER BY o_orderkey"""),
      "binned range join: lineitems shipped within 7 days of urgent orders"),

    // --------------------------------------------------------------- HLL
    // HyperLogLog distinct orders over lineitem, b=8 (256 registers,
    // ~6.5% rse) — the constant-state face of count(distinct); q98's KMV
    // is the order-statistics face. sum_pow50 pins the register array
    // bit-for-bit (exact integer); n_exact rides along so the result
    // documents its own accuracy.
    "q123_hll_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        val li = t(s, d, "lineitem")
        Sketches.hllDistinct(li, $"l_orderkey", b = 8, salt = "q123")
          .crossJoin(broadcast(
            li.agg(countDistinct($"l_orderkey").as("n_exact"))))
      },
      Some(s"""WITH ${Sketches.hllOracleCtes(
          "CAST(l_orderkey AS VARCHAR)", "lineitem", 8, "q123")},
        ex AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem)
        SELECT n_nonzero, sum_pow50, est_distinct, n_exact
        FROM hll CROSS JOIN ex"""),
      "HyperLogLog distinct-count sketch, register state integer-pinned"),

    // --------------------------------------------------- duplicate spans
    // Substring-level duplication profile (Lee et al. ACL'22): window
    // fingerprints catch shared boilerplate that document-level dedup
    // (q40/q42) misses. No pairwise stage — a span shared by a million
    // docs is one group, not C(1M, 2) rows. See [[Dedup.duplicateSpans]].
    "q124_duplicate_spans" -> Q(
      (s, d) => Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text",
          width = 40, stride = 8)
        .orderBy(col("doc_id")),
      Some("""WITH wins AS (
          SELECT doc_id, md5(substr(text, g, 40)) AS wh FROM (
            SELECT doc_id, text,
              unnest(generate_series(1, length(text) - 39, 8)) AS g
            FROM documents WHERE length(text) >= 40)),
        dup AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM wins)
          GROUP BY wh HAVING count(*) >= 2),
        per AS (SELECT doc_id, count(*) AS n_spans FROM wins GROUP BY doc_id),
        dupper AS (SELECT doc_id, count(*) AS n_dup_spans FROM wins
          WHERE wh IN (SELECT wh FROM dup) GROUP BY doc_id)
        SELECT doc_id, n_spans, n_dup_spans,
          round(CAST(n_dup_spans AS DOUBLE) / n_spans, 6) AS dup_frac
        FROM dupper JOIN per USING (doc_id) ORDER BY doc_id"""),
      "substring-span duplication profile (Lee et al. ACL'22 window form)")
  )
}
