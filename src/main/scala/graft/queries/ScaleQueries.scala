package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOf, Incremental, Layout, Quality, Redact, Relational, Selection, Sketches, TimeSeries}

/** Round-5 scale operators: the summary-sketch family (Bloom semi-join
  * reduction, KMV distinct, count-min frequencies), Z-order layout math,
  * and incremental aggregate-state maintenance — each replacing an exact
  * operation whose cost at 100 TB is dominated by a shuffle proportional
  * to the INPUT with a fixed-size mergeable summary, and each md5-
  * portable so the DuckDB oracle re-derives the sketch bits themselves
  * (the repo's standard for "verified", per Dedup/Similarity). Plus the
  * pipeline-operations completions: time-series resample with gap-fill /
  * forward-fill, a one-scan data-quality audit, and the forward as-of
  * join.
  */
object ScaleQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private val MoneySum =
    "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0"

  val all: Seq[(String, Q)] = Seq(

    // ------------------------------------------- Bloom semi-join pruning
    // The classic semi-join reduction: build a 4096-bit / 4-hash Bloom
    // filter over the German suppliers (the small side), broadcast it,
    // and drop lineitem rows at the scan before they pay the join
    // shuffle. n_candidates counts bloom survivors (exact bit-for-bit
    // sketch agreement with the oracle), n_matched/revenue come from the
    // exact join that still runs after — false positives cost only
    // wasted bytes, never wrong answers. Spark's runtime bloom (AQE)
    // does this automatically inside one query; the explicit operator
    // covers what AQE can't: persisting the filter across jobs or
    // pre-filtering a stream against a static dim.
    "q97_bloom_semijoin" -> Q(
      (s, d) => {
        import s.implicits._
        val M = 4096; val K = 4; val SALT = "q97"
        val dim = t(s, d, "supplier").filter($"s_nationkey" === 7)
          .select($"s_suppkey")
        val bloom = Sketches.bloomBuild(dim, $"s_suppkey", M, K, SALT)
        // r18 (guide §2.5): the K-md5-per-row membership test ran as ONE
        // task over the single-row-group scan (0.94 s stage, paid twice:
        // n_candidates + the exact join re-derive cand); spread keyed on
        // the join key so the semi-join's exchange is satisfied too
        // (identity at production fan-out)
        val cand = Sketches.bloomFilter(
          Relational.spreadIfNarrow(
            t(s, d, "lineitem").select($"l_suppkey", $"l_extendedprice"),
            $"l_suppkey"),
          bloom, $"l_suppkey", M, K, SALT)
        val nCand = cand.agg(count(lit(1)).as("n_candidates"))
        val matched = cand.join(dim, cand("l_suppkey") === dim("s_suppkey"), "left_semi")
          .agg(count(lit(1)).as("n_matched"),
            (sum(round($"l_extendedprice" * 100).cast("long")).cast("double") / 100.0)
              .as("revenue"))
        nCand.crossJoin(matched)
      },
      Some {
        val dimSql = "SELECT CAST(s_suppkey AS VARCHAR) AS k FROM supplier WHERE s_nationkey = 7"
        s"""WITH ${Sketches.bloomOracleCtes(dimSql, 4096, 4, "q97")},
          cand AS (
            SELECT l_suppkey, l_extendedprice
            FROM lineitem CROSS JOIN bloom_arr
            WHERE ${Sketches.bloomOracleTest("CAST(l_suppkey AS VARCHAR)", 4096, 4, "q97")}),
          c AS (SELECT count(*) AS n_candidates FROM cand),
          m AS (SELECT count(*) AS n_matched, $MoneySum AS revenue
                FROM cand
                WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7))
          SELECT n_candidates, n_matched, revenue FROM c CROSS JOIN m"""
      },
      "Bloom-filter semi-join reduction (bit-exact sketch, exact join after)"),

    // ------------------------------------------------- KMV distinct count
    // count(distinct key) at 100 TB shuffles every distinct key; the KMV
    // sketch keeps the 256 smallest md5 hashes (O(k) state per partition,
    // TakeOrdered merge) and estimates n ≈ (k-1)/h_(k). kth_hash60 in the
    // output pins the sketch itself; n_exact rides along so the result
    // documents its own accuracy (~1/sqrt(k) ≈ 6%).
    "q98_kmv_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        val sketch = Sketches.kmvDistinct(t(s, d, "lineitem"), $"l_partkey",
          k = 256, salt = "q98")
        val exact = t(s, d, "lineitem")
          .agg(countDistinct($"l_partkey").as("n_exact"))
        sketch.crossJoin(exact)
      },
      Some("""WITH h AS (
            SELECT DISTINCT md5('q98:' || CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
          topk AS (SELECT h FROM h ORDER BY h LIMIT 256),
          s AS (SELECT count(*) AS n_kept,
                       max(CAST('0x' || substr(h, 1, 15) AS BIGINT)) AS kth_hash60
                FROM topk),
          e AS (SELECT count(DISTINCT l_partkey) AS n_exact FROM lineitem)
          SELECT n_kept, kth_hash60,
            round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                  ELSE 255.0 * pow(2.0, 60.0) / CAST(kth_hash60 AS DOUBLE) END, 4)
              AS est_distinct,
            n_exact
          FROM s CROSS JOIN e"""),
      "K-minimum-values distinct sketch, kth hash pinned bit-for-bit"),

    // ------------------------------------------------- Z-order box query
    // The Morton interleave behind multi-dimensional file clustering
    // (Layout.writeZOrdered): bit b of x at position 2b, bit b of y at
    // 2b+1. This query oracle-pins the interleave math on a 2-D box
    // predicate; the physical payoff — a y-only slice touching ~sqrt of
    // the files instead of all of them — is asserted on real written
    // layouts in ScalePostureSpec (file splits are sampled by
    // repartitionByRange, so file COUNTS are a test property, not an
    // oracle hash).
    "q99_zorder_box" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            ($"l_partkey" % 256).cast("long").as("x"),
            ($"l_suppkey" % 256).cast("long").as("y"))
          .withColumn("z", Layout.zValue($"x", $"y", bits = 8))
          .filter($"x".between(32, 47) && $"y".between(10, 20))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
            CAST(l_partkey % 256 AS BIGINT) AS x,
            CAST(l_suppkey % 256 AS BIGINT) AS y,
            ${Layout.zOracleExpr("(l_partkey % 256)", "(l_suppkey % 256)", 8)} AS z
          FROM lineitem
          WHERE (l_partkey % 256) BETWEEN 32 AND 47
            AND (l_suppkey % 256) BETWEEN 10 AND 20
          ORDER BY l_orderkey, l_linenumber"""),
      "Morton/Z-order interleave pinned bit-for-bit on a 2-D box predicate"),

    // -------------------------------------- incremental aggregate state
    // Materialized-view maintenance: aggregate two disjoint order batches
    // separately (as a daily job would see them), fold the per-group
    // states, and finalize — the oracle one-shots the same aggregate over
    // the union, so the hash compare IS the fold identity
    // state(a ⊎ b) == merge(state(a), state(b)). Cent-exact sums make the
    // fold associative; AVG derives from (sum, n) at the end.
    "q100_incremental_agg" -> Q(
      (s, d) => {
        import s.implicits._
        val orders = t(s, d, "orders")
        val keys = Seq("o_orderpriority")
        val old = Incremental.aggState(
          orders.filter($"o_orderdate" < "1996-01-01"), keys, $"o_totalprice")
        val fresh = Incremental.aggState(
          orders.filter($"o_orderdate" >= "1996-01-01"), keys, $"o_totalprice")
        Incremental.finalizeState(Incremental.mergeStates(keys, old, fresh))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total,
            round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
              / count(*) / 100.0, 4) AS avg_value,
            min(o_totalprice) AS mn, max(o_totalprice) AS mx
          FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "incremental agg-state fold == one-shot recompute (MV maintenance)"),

    // ------------------------------------------------- count-min sketch
    // Frequency estimation from d=4 × w=512 counters instead of a
    // per-key groupBy: the shuffle carries 2048 cells per map partition
    // no matter how many rows feed it, and sketches merge cell-wise.
    // Probes are the 20 heaviest suppliers (truth rides along), and the
    // oracle re-derives every cell — estimates are exact-match verified,
    // including any collision inflation (est_n >= true_n always; the
    // over-estimate property itself is pinned in SketchSpec).
    "q101_countmin_heavy" -> Q(
      (s, d) => {
        import s.implicits._
        val D = 4; val W = 512; val SALT = "q101"
        val li = t(s, d, "lineitem")
        val table = Sketches.countMinTable(li, $"l_suppkey", D, W, SALT)
        val probes = li.groupBy($"l_suppkey")
          .agg(count(lit(1)).as("true_n"))
          .orderBy($"true_n".desc, $"l_suppkey")
          .limit(20)
        // true_n rides through the estimate's group-by — no re-join, no
        // second aggregation pass over lineitem
        Sketches.countMinEstimate(probes, table, $"l_suppkey", D, W, SALT)
          .select($"l_suppkey", $"true_n", $"est_n")
          .orderBy($"l_suppkey")
      },
      // cell r reads slice r of ONE digest (md5('q101:0:'||k) hex chars
      // 1+8r..8+8r) — the same less-hashing construction as the engine
      Some("""WITH cm AS (
            SELECT i AS r,
              CAST(CAST('0x' || substr(md5('q101:0:' || CAST(l_suppkey AS VARCHAR)),
                1 + 8 * i, 8) AS BIGINT) % 512 AS INT) AS c,
              count(*) AS n
            FROM lineitem CROSS JOIN range(4) t(i) GROUP BY 1, 2),
          probes AS (
            SELECT l_suppkey, count(*) AS true_n FROM lineitem
            GROUP BY 1 ORDER BY true_n DESC, l_suppkey LIMIT 20),
          probe_cells AS (
            SELECT p.l_suppkey, p.true_n, cm.n
            FROM probes p CROSS JOIN range(4) t(i)
            LEFT JOIN cm ON cm.r = t.i
              AND cm.c = CAST(CAST('0x' || substr(md5('q101:0:' ||
                CAST(p.l_suppkey AS VARCHAR)), 1 + 8 * t.i, 8) AS BIGINT) % 512 AS INT))
          SELECT l_suppkey, true_n, min(COALESCE(n, 0)) AS est_n
          FROM probe_cells GROUP BY 1, 2 ORDER BY l_suppkey"""),
      "count-min frequency sketch, every cell oracle-derived"),

    // ------------------------------------- time-series resample + ffill
    // Hourly purchase/signup revenue with a DENSE axis: generated gap
    // buckets carry n=0 and the forward-filled last observation — the
    // pandas resample().sum().ffill() shape, but the spine is exploded
    // per key from a one-row-per-key min/max aggregate, never built on
    // the driver. Value sums are cent-quantized (order-independent), so
    // both the observed and forward-filled columns hash exactly.
    "q102_resample_ffill" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
          .filter($"event_type".isin("purchase", "signup"))
        TimeSeries.resampleFfill(e, "event_type", "ts", "hour",
            round($"value" * 100).cast("long"))
          .select($"event_type", $"bucket", $"n",
            ($"v".cast("double") / 100.0).as("v"),
            ($"v_ffill".cast("double") / 100.0).as("v_ffill"))
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n,
              sum(CAST(round(value*100) AS BIGINT)) AS v
            FROM events WHERE event_type IN ('purchase','signup') GROUP BY 1, 2),
          span AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM agg GROUP BY 1),
          spine AS (SELECT event_type,
              unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM span),
          dense AS (SELECT s.event_type, s.bucket, COALESCE(a.n, 0) AS n, a.v
            FROM spine s LEFT JOIN agg a
              ON s.event_type = a.event_type AND s.bucket = a.bucket)
          SELECT event_type, bucket, n, CAST(v AS DOUBLE)/100.0 AS v,
            CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
                ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)/100.0 AS v_ffill
          FROM dense ORDER BY event_type, bucket"""),
      "resample to dense hourly buckets with gap-fill + forward-fill"),

    // --------------------------------------------- one-scan data audit
    // The expectations layer before publishing a batch: six checks fold
    // into ONE hash aggregate over lineitem (adding a check adds a
    // column, not a scan). Counters count VIOLATIONS; a null check
    // result is a violation, not a pass.
    "q103_quality_audit" -> Q(
      (s, d) => {
        import s.implicits._
        Quality.audit(t(s, d, "lineitem"), Seq(
          "v_qty_positive" -> ($"l_quantity" > 0),
          "v_qty_le_30" -> ($"l_quantity" <= 30),
          "v_disc_le_6pct" -> ($"l_discount" <= 0.06),
          "v_tax_le_disc" -> ($"l_tax" <= $"l_discount"),
          "v_flag_domain" -> $"l_returnflag".isin("A", "N", "R"),
          "v_ship_from_1996" -> ($"l_shipdate" >= "1996-01-01")))
      },
      Some("""SELECT count(*) AS n_rows,
          CAST(sum(CASE WHEN COALESCE(l_quantity > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v_qty_positive,
          CAST(sum(CASE WHEN COALESCE(l_quantity <= 30, false) THEN 0 ELSE 1 END) AS BIGINT) AS v_qty_le_30,
          CAST(sum(CASE WHEN COALESCE(l_discount <= 0.06, false) THEN 0 ELSE 1 END) AS BIGINT) AS v_disc_le_6pct,
          CAST(sum(CASE WHEN COALESCE(l_tax <= l_discount, false) THEN 0 ELSE 1 END) AS BIGINT) AS v_tax_le_disc,
          CAST(sum(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), false) THEN 0 ELSE 1 END) AS BIGINT) AS v_flag_domain,
          CAST(sum(CASE WHEN COALESCE(l_shipdate >= TIMESTAMP '1996-01-01', false) THEN 0 ELSE 1 END) AS BIGINT) AS v_ship_from_1996
        FROM lineitem"""),
      "one-scan data-quality audit (violation counters as one aggregate)"),

    // ------------------------------------------------- forward as-of
    // Time-to-convert: for each click, the user's EARLIEST purchase
    // at-or-after it. Engine side is the mirror-image union+window
    // composition (operators.AsOf.asOfJoinForward); oracle is DuckDB's
    // native ASOF with the inequality flipped.
    "q104_asof_forward" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
        val clicks = e.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = e.filter($"event_type" === "purchase")
          .select($"event_id".as("p_event_id"), $"user_id", $"ts".as("p_ts"))
        AsOf.asOfJoinForward(clicks, purchases, "user_id", "ts", "p_ts")
          .select($"event_id".as("click_id"),
            $"right_p_event_id".as("next_purchase_id"),
            (unix_timestamp($"right_p_ts") - unix_timestamp($"ts"))
              .as("secs_to_convert"))
          .orderBy($"click_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS next_purchase_id,
          CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT)
            AS secs_to_convert
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY click_id"""),
      "forward as-of join (next event at-or-after) vs DuckDB native ASOF"),

    // --------------------------------------------- referential orphans
    // FK integrity audit with a PLANTED violation: parents restricted to
    // p_size <= 25, so every lineitem referencing a larger part is an
    // orphan. The anti-join broadcasts when the parent is dim-sized; the
    // summary groups orphan damage by return flag.
    "q105_fk_orphans" -> Q(
      (s, d) => {
        import s.implicits._
        val parent = t(s, d, "part").filter($"p_size" <= 25)
        Quality.orphans(t(s, d, "lineitem"), "l_partkey", parent, "p_partkey")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_orphans"),
               (sum(round($"l_extendedprice" * 100).cast("long"))
                 .cast("double") / 100.0).as("orphan_revenue"))
          .orderBy($"l_returnflag")
      },
      Some(s"""SELECT l_returnflag, count(*) AS n_orphans,
          $MoneySum AS orphan_revenue
        FROM lineitem l
        WHERE l_partkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM part p
          WHERE p.p_partkey = l.l_partkey AND p.p_size <= 25)
        GROUP BY 1 ORDER BY 1"""),
      "FK orphan audit via anti-join, planted by shrinking the parent"),

    // ---------------------------------------------- duplicate key audit
    // Uniqueness check on a key that is NOT unique — (user_id,
    // event_type) — returning the 20 heaviest duplicate groups. One hash
    // aggregate; the empty result on a truly-unique key is the pass.
    "q106_duplicate_keys" -> Q(
      (s, d) => {
        import s.implicits._
        Quality.duplicateKeys(t(s, d, "events"), Seq("user_id", "event_type"))
          .orderBy($"n_dups".desc, $"user_id", $"event_type")
          .limit(20)
      },
      Some("""SELECT user_id, event_type, count(*) AS n_dups
        FROM events GROUP BY 1, 2 HAVING count(*) > 1
        ORDER BY n_dups DESC, user_id, event_type LIMIT 20"""),
      "duplicate-key audit (top-20 heaviest groups)"),

    // ---------------------------------------------------- PII redaction
    // Curation scrub pass: emails / SSN-shaped ids / phones / IPv4s →
    // placeholder tokens, with per-rule replacement counts. The corpus
    // is synthetic word-salad, so PII is PLANTED deterministically from
    // doc_id (same construction on both engines — the q105 convention);
    // rules are RE2-safe and apply in order, each counting on the text
    // state it rewrites. Output pins md5(redacted), so the oracle
    // verifies every byte of the scrubbed text, not just the counts.
    "q107_pii_redaction" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = t(s, d, "documents").withColumn("t0", concat(
          $"text", lit(" contact user"), $"doc_id", lit("@example.com"),
          when($"doc_id" % 3 === 0, concat(lit(" call 555-"),
            lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((($"doc_id" * 7) % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when($"doc_id" % 5 === 0, concat(lit(" from 10."),
            ($"doc_id" % 256).cast("string"), lit(".0."),
            (($"doc_id" * 3) % 256).cast("string"))).otherwise(lit("")),
          when($"doc_id" % 7 === 0, concat(lit(" ssn "),
            ($"doc_id" % 900 + 100).cast("string"), lit("-"),
            ($"doc_id" % 90 + 10).cast("string"), lit("-"),
            ($"doc_id" % 9000 + 1000).cast("string"))).otherwise(lit(""))))
        Redact.piiScrub(planted, $"t0")
          .select($"doc_id", $"n_email", $"n_ssn", $"n_phone", $"n_ipv4",
            md5($"redacted").as("redacted_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
            SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com'
              || CASE WHEN doc_id % 3 = 0 THEN ' call 555-'
                   || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                   || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
              || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                   || CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END
              || CASE WHEN doc_id % 7 = 0 THEN ' ssn '
                   || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
                   || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
                   || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END AS t0
            FROM documents),
          s1 AS (SELECT doc_id,
            CAST(len(regexp_extract_all(t0,
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
            regexp_replace(t0,
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t1
            FROM planted),
          s2 AS (SELECT doc_id, n_email,
            CAST(len(regexp_extract_all(t1,
              '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
            regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS t2
            FROM s1),
          s3 AS (SELECT doc_id, n_email, n_ssn,
            CAST(len(regexp_extract_all(t2,
              '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS BIGINT) AS n_phone,
            regexp_replace(t2, '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b',
              '<PHONE>', 'g') AS t3
            FROM s2),
          s4 AS (SELECT doc_id, n_email, n_ssn, n_phone,
            CAST(len(regexp_extract_all(t3,
              '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
            regexp_replace(t3, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
              '<IP>', 'g') AS t4
            FROM s3)
          SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4, md5(t4) AS redacted_md5
          FROM s4 ORDER BY doc_id"""),
      "PII scrub with per-rule counts; redacted text pinned via md5"),

    // ------------------------------------- weighted systematic sample
    // Weight-proportional selection for mixture construction: m probes
    // at the midpoints of m equal strata over the corpus's n_chars mass.
    // All-integer (no float pow/ln near a selection boundary), so the
    // picked set is bit-reproducible; the distributed form is a
    // two-level cumsum (per-bucket window + bucket-offset window over
    // the bucket list), probes a broadcast m-row table.
    "q108_weighted_sample" -> Q(
      (s, d) => {
        import s.implicits._
        Selection.weightedSystematicSample(
            t(s, d, "documents").select($"doc_id", $"n_chars"),
            $"doc_id", $"n_chars", m = 25, bucketWidth = 64)
          .select($"pick", $"doc_id", $"n_chars")
          .orderBy($"pick")
      },
      Some("""WITH base AS (
            SELECT doc_id, n_chars, COALESCE(n_chars, 0) AS w FROM documents),
          tot AS (SELECT sum(w) AS W FROM base),
          cum AS (SELECT doc_id, n_chars, w,
            sum(w) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM base),
          probes AS (SELECT j AS pick, ((2 * j + 1) * W) // 50 AS t
            FROM range(25) r(j) CROSS JOIN tot)
          SELECT p.pick, c.doc_id, c.n_chars
          FROM probes p JOIN cum c ON p.t >= c.c - c.w AND p.t < c.c
          ORDER BY p.pick"""),
      "integer-exact weight-proportional systematic sample (m strata midpoints)"),

    // ------------------------------------------ rolling z-score anomaly
    // Trailing-window outlier detection on the dense hourly series from
    // q102's resampler: a bucket is anomalous when it sits more than 3σ
    // from the mean of its 24 preceding buckets (≥12 observed). The
    // z-score compare is all-integer — (c·n − S)² > 9·(n·Q − S²) — so
    // the flag set hashes bit-for-bit, no float stddev at a boundary.
    "q109_rolling_zscore" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
          .filter($"event_type".isin("purchase", "view"))
        val ser = TimeSeries.resampleFfill(e, "event_type", "ts", "hour",
            round($"value" * 100).cast("long"))
          .select($"event_type", $"bucket", coalesce($"v", lit(0L)).as("c"))
        TimeSeries.rollingZScore(ser, "event_type", "bucket", $"c",
            lookback = 24, minObs = 12, z = 3)
          .filter($"is_anomaly")
          .select($"event_type", $"bucket",
            ($"c".cast("double") / 100.0).as("v"), $"win_n")
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
              sum(CAST(round(value*100) AS BIGINT)) AS v
            FROM events WHERE event_type IN ('purchase','view') GROUP BY 1, 2),
          span AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM agg GROUP BY 1),
          spine AS (SELECT event_type,
              unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM span),
          ser AS (SELECT s.event_type, s.bucket,
              CAST(COALESCE(a.v, 0) AS BIGINT) AS c
            FROM spine s LEFT JOIN agg a
              ON s.event_type = a.event_type AND s.bucket = a.bucket),
          win AS (SELECT event_type, bucket, c,
              CAST(count(c) OVER w AS BIGINT) AS n,
              CAST(sum(c) OVER w AS BIGINT) AS S,
              CAST(sum(c*c) OVER w AS BIGINT) AS Q
            FROM ser WINDOW w AS (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
          SELECT event_type, bucket, CAST(c AS DOUBLE)/100.0 AS v, n AS win_n
          FROM win
          WHERE n >= 12 AND (c*n - S)*(c*n - S) > 9*(n*Q - S*S)
          ORDER BY event_type, bucket"""),
      "integer-exact rolling z-score anomalies on the dense hourly series"),

    // ------------------------------------- linear interpolation fill
    // The interpolate(method='linear') face of the q102 resampler: gap
    // buckets get pv + ⌊(nv−pv)·k/g⌋ between their neighboring
    // observations — floor-of-exact-rational on cents, so the filled
    // series hashes bit-for-bit; trailing gaps carry forward.
    "q110_resample_interp" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
          .filter($"event_type".isin("purchase", "signup"))
        val dense = TimeSeries.resampleFfill(e, "event_type", "ts", "hour",
          round($"value" * 100).cast("long"))
        TimeSeries.interpolate(dense, "event_type", "bucket", $"v")
          .select($"event_type", $"bucket", $"n",
            ($"v".cast("double") / 100.0).as("v"),
            ($"v_interp".cast("double") / 100.0).as("v_interp"))
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n,
              sum(CAST(round(value*100) AS BIGINT)) AS v
            FROM events WHERE event_type IN ('purchase','signup') GROUP BY 1, 2),
          span AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM agg GROUP BY 1),
          spine AS (SELECT event_type,
              unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM span),
          dense AS (SELECT s.event_type, s.bucket, COALESCE(a.n, 0) AS n, a.v
            FROM spine s LEFT JOIN agg a
              ON s.event_type = a.event_type AND s.bucket = a.bucket),
          win AS (SELECT event_type, bucket, n, v,
              row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS i
            FROM dense),
          fill AS (SELECT event_type, bucket, n, v, i,
              last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wb AS pi,
              last_value(v IGNORE NULLS) OVER wb AS pv,
              first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wf AS ni,
              first_value(v IGNORE NULLS) OVER wf AS nv
            FROM win
            WINDOW wb AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wf AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          SELECT event_type, bucket, n, CAST(v AS DOUBLE)/100.0 AS v,
            CAST(CASE WHEN v IS NOT NULL THEN v
                WHEN ni IS NULL THEN pv
                ELSE pv + CAST(floor(CAST((nv - pv) * (i - pi) AS DOUBLE)
                  / (ni - pi)) AS BIGINT) END AS DOUBLE)/100.0 AS v_interp
          FROM fill ORDER BY event_type, bucket"""),
      "linear interpolation across resample gaps, floor-of-rational exact"),

    // --------------------------------- exact similarity join (prefix)
    // The LOSSLESS scalable twin of q41's brute-force Jaccard: AllPairs/
    // PPJoin prefix filtering over the FULL corpus (q41 bounds itself to
    // doc_id < 100 because its inverted join is quadratic in shingle
    // df). Candidates come only from each doc's ~n·(1−t) rarest
    // shingles; the oracle runs the full O(n²) ground truth, so the
    // hash compare IS the proof that prefix pruning dropped nothing.
    // Word-5-gram shingles: their universe is combinatorial (median
    // df=1 here), which is what prefix filtering exploits — char-3grams
    // on this deliberately self-similar corpus have only ~400 types, ALL
    // stop-shingles, and no candidate-pruning scheme survives that (the
    // right tool there is MinHash-LSH, q42). Threshold 3/4 is rational
    // end-to-end — prefix length and the J ≥ t verify are integer
    // compares on both engines.
    "q111_prefix_jaccard" -> Q(
      (s, d) => {
        import s.implicits._
        graft.operators.Dedup.prefixJaccardPairsWords(
            t(s, d, "documents"), "doc_id", "text", n = 5,
            tNum = 3, tDen = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH s AS (SELECT doc_id,
            CASE WHEN len(string_split(lower(text), ' ')) >= 5
              THEN list_distinct(list_transform(
                range(1, len(string_split(lower(text), ' ')) - 3),
                i -> array_to_string(
                  list_slice(string_split(lower(text), ' '), i, i + 4), ' ')))
              ELSE [array_to_string(string_split(lower(text), ' '), ' ')]
            END AS sh FROM documents),
          tok AS (SELECT doc_id, unnest(sh) AS sh_one FROM s),
          sizes AS (SELECT doc_id, len(sh) AS n FROM s),
          inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ni
            FROM tok a JOIN tok b
              ON a.sh_one = b.sh_one AND a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT ia AS id_a, ib AS id_b,
            round(CAST(ni AS DOUBLE)/(sa.n + sb.n - ni), 6) AS jaccard
          FROM inter JOIN sizes sa ON ia = sa.doc_id
            JOIN sizes sb ON ib = sb.doc_id
          WHERE ni*4 >= 3*(sa.n + sb.n - ni)
          ORDER BY id_a, id_b"""),
      "exact Jaccard join via prefix filtering vs full O(n²) ground truth"),

    // --------------------------------------------- grouped KMV sketch
    // "Approx distinct parts per return flag": the q98 KMV sketch, per
    // group — the window is partitioned by the group so no group sorts
    // more than its own distinct hashes, and shard sketches still merge
    // losslessly per group. Exact truth rides along; every kth hash is
    // pinned bit-for-bit by the oracle.
    "q112_kmv_grouped" -> Q(
      (s, d) => {
        import s.implicits._
        val li = t(s, d, "lineitem")
        val sk = Sketches.kmvSketchGrouped(li, Seq("l_returnflag"),
          $"l_partkey", k = 128, salt = "q112")
        val est = Sketches.kmvEstimateGrouped(sk, Seq("l_returnflag"), k = 128)
        val exact = li.groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("n_exact"))
        est.join(exact, "l_returnflag").orderBy($"l_returnflag")
      },
      Some("""WITH h AS (SELECT DISTINCT l_returnflag,
              md5('q112:' || CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
          topk AS (SELECT l_returnflag, h FROM (
              SELECT l_returnflag, h,
                row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
              FROM h) WHERE rn <= 128),
          s AS (SELECT l_returnflag, count(*) AS n_kept,
              max(CAST('0x' || substr(h, 1, 15) AS BIGINT)) AS kth_hash60
            FROM topk GROUP BY 1),
          e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
            FROM lineitem GROUP BY 1)
          SELECT s.l_returnflag, n_kept, kth_hash60,
            round(CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
                ELSE 127.0 * pow(2.0, 60.0) / CAST(kth_hash60 AS DOUBLE) END, 4)
              AS est_distinct,
            n_exact
          FROM s JOIN e ON s.l_returnflag = e.l_returnflag
          ORDER BY s.l_returnflag"""),
      "per-group KMV distinct sketch, kth hashes pinned bit-for-bit"),

    // --------------------------------------------- snapshot diff audit
    // Reconciliation after a simulated backfill: version B of orders
    // drops every 97th key, bumps every 101st total — snapshotDiff
    // classifies every key added/removed/changed/unchanged in ONE full
    // outer join with codegen'd null-safe column compares (no row
    // hashing, so nothing to keep hash-portable). The batch face of the
    // q91 incremental-vs-recompute identity.
    "q113_snapshot_diff" -> Q(
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        val a = o.filter($"o_orderkey" % 89 =!= 0)
        val b = o.filter($"o_orderkey" % 97 =!= 0)
          .withColumn("o_totalprice",
            when($"o_orderkey" % 101 === 0, $"o_totalprice" + 1.0)
              .otherwise($"o_totalprice"))
        Relational.snapshotDiff(a, b, "o_orderkey",
            Seq("o_totalprice", "o_orderstatus"))
          .groupBy($"diff_status")
          .agg(count(lit(1)).as("n"), min($"o_orderkey").as("min_key"))
          .orderBy($"diff_status")
      },
      Some("""WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 89 <> 0),
          b AS (SELECT o_orderkey,
              CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 97 <> 0),
          d AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
              CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                  OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  THEN 'changed'
                ELSE 'unchanged' END AS diff_status
            FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
          SELECT diff_status, count(*) AS n, min(k) AS min_key
          FROM d GROUP BY 1 ORDER BY 1"""),
      "snapshot reconciliation: added/removed/changed/unchanged in one join"),

    // ------------------------------------------- rolling exact median
    // Exact order statistic over trailing windows: the 24-bucket rolling
    // median of the dense hourly series — `percentile` (Spark's exact,
    // interpolating aggregate) as a window function vs DuckDB's
    // quantile_cont, both linear-interpolating at p·(n−1). Medians of
    // integer cents are whole or half cents, so /100 at round-4 never
    // sits on a rounding boundary. The frame is 24 rows regardless of
    // input size; the window is key-partitioned.
    "q114_rolling_median" -> Q(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val e = t(s, d, "events")
          .filter($"event_type".isin("purchase", "signup"))
        val ser = TimeSeries.resampleFfill(e, "event_type", "ts", "hour",
            round($"value" * 100).cast("long"))
          .select($"event_type", $"bucket", coalesce($"v", lit(0L)).as("c"))
        val w = Window.partitionBy($"event_type").orderBy($"bucket")
          .rowsBetween(-23, Window.currentRow)
        ser
          .withColumn("med", expr("percentile(c, 0.5)").over(w))
          .select($"event_type", $"bucket",
            round($"med" / 100.0, 4).as("med"))
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
              sum(CAST(round(value*100) AS BIGINT)) AS v
            FROM events WHERE event_type IN ('purchase','signup') GROUP BY 1, 2),
          span AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM agg GROUP BY 1),
          spine AS (SELECT event_type,
              unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM span),
          ser AS (SELECT s.event_type, s.bucket,
              CAST(COALESCE(a.v, 0) AS BIGINT) AS c
            FROM spine s LEFT JOIN agg a
              ON s.event_type = a.event_type AND s.bucket = a.bucket)
          SELECT event_type, bucket,
            round(quantile_cont(c, 0.5) OVER (PARTITION BY event_type
                ORDER BY bucket ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
              / 100.0, 4) AS med
          FROM ser ORDER BY event_type, bucket"""),
      "rolling exact median (interpolating percentile) over trailing frames"),

    // ------------------------------------- exact dedup pipeline (e2e)
    // The EXACT end-to-end twin of the approximate q42→q75 MinHash
    // pipeline, over the FULL corpus: prefix-filtered Jaccard pairs
    // (q111's lossless join, word-5-grams t=3/4) → shape-safe star-
    // contraction clustering → keep-first keeper per family. Every
    // stage re-derived by the oracle: the O(n²) ground-truth pair join
    // feeding a recursive-CTE fixpoint — so the composed pipeline, not
    // just its pieces, is hash-verified.
    "q116_exact_dedup_pipeline" -> Q(
      (s, d) => {
        import s.implicits._
        val base = t(s, d, "documents")
        val pairs = graft.operators.Dedup.prefixJaccardPairsWords(
          base, "doc_id", "text", n = 5, tNum = 3, tDen = 4)
        val cc = graft.operators.Dedup.cluster(
          base.select($"doc_id"), "doc_id", pairs)
        val sizes = cc.groupBy($"cluster_id")
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, "cluster_id")
          .select($"id".as("doc_id"), $"cluster_id", $"cluster_size",
            ($"id" === $"cluster_id").cast("int").as("is_keeper"))
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE s AS (SELECT doc_id,
            CASE WHEN len(string_split(lower(text), ' ')) >= 5
              THEN list_distinct(list_transform(
                range(1, len(string_split(lower(text), ' ')) - 3),
                i -> array_to_string(
                  list_slice(string_split(lower(text), ' '), i, i + 4), ' ')))
              ELSE [array_to_string(string_split(lower(text), ' '), ' ')]
            END AS sh FROM documents),
          tok AS (SELECT doc_id, unnest(sh) AS sh_one FROM s),
          sizes AS (SELECT doc_id, len(sh) AS n FROM s),
          inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ni
            FROM tok a JOIN tok b
              ON a.sh_one = b.sh_one AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pairs AS (SELECT ia AS id_a, ib AS id_b
            FROM inter JOIN sizes sa ON ia = sa.doc_id
              JOIN sizes sb ON ib = sb.doc_id
            WHERE ni*4 >= 3*(sa.n + sb.n - ni)),
          und AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
          walk(id, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT u.dst, w.lbl FROM walk w JOIN und u ON u.src = w.id),
          cc AS (SELECT id, min(lbl) AS cluster_id FROM walk GROUP BY id),
          sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
          SELECT cc.id AS doc_id, cluster_id, cluster_size,
            CAST(cc.id = cluster_id AS INTEGER) AS is_keeper
          FROM cc JOIN sz USING (cluster_id) ORDER BY doc_id"""),
      "exact dedup end-to-end: lossless pair join -> clusters -> keepers"),

    // ----------------------------------------------- KMV set operations
    // Union AND intersection cardinality of two token sets from their
    // k-smallest sketches alone (Beyer et al. SIGMOD'07): the merged
    // sketch is exactly the union's sketch (shard-merge closure), and
    // Jaccard is decidable inside it because h ∈ M ∧ h ∈ A ⇒ h ∈ Kₐ.
    // The only corpus-proportional work is the two side sketch builds;
    // the set algebra runs on ≤ 3k hash rows. Exact counts ride along
    // (one extra aggregate) to expose the realized estimation error —
    // at 100 TB you'd drop them and keep only the sketch path.
    "q151_kmv_setops" -> Q(
      (s, d) => {
        import s.implicits._
        val w = t(s, d, "documents")
          .select((substring($"source", 4, 10).cast("int") < 10).as("side_a"),
            explode(split(lower($"text"), " ")).as("w"))
          .filter($"w".rlike("^[a-z0-9]+$"))
          .localCheckpoint() // reused: two sketch builds + exact pass
        val sk = Sketches.kmvSetOps(
          w.filter($"side_a"), $"w", w.filter(!$"side_a"), $"w",
          k = 256, salt = "q151")
        val exact = w.groupBy($"w")
          .agg(max(when($"side_a", 1).otherwise(0)).as("ia"),
            max(when($"side_a", 0).otherwise(1)).as("ib"))
          .agg(count(lit(1)).as("exact_union"),
            sum(when($"ia" === 1 && $"ib" === 1, 1L).otherwise(0L))
              .as("exact_inter"))
        sk.crossJoin(exact)
      },
      Some("""WITH w AS (SELECT CAST(substr(source, 4, 10) AS INT) < 10 AS side_a, w
            FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
            WHERE regexp_matches(w, '^[a-z0-9]+$')),
          ha AS (SELECT DISTINCT md5('q151:' || w) AS h FROM w WHERE side_a),
          sa AS (SELECT h FROM ha ORDER BY h LIMIT 256),
          hb AS (SELECT DISTINCT md5('q151:' || w) AS h FROM w WHERE NOT side_a),
          sb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
          m AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
            ORDER BY h LIMIT 256),
          f AS (SELECT m.h,
              CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
              CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
            FROM m LEFT JOIN sa ON m.h = sa.h LEFT JOIN sb ON m.h = sb.h),
          agg AS (SELECT count(*) AS n_m,
              max(CAST('0x' || substr(h, 1, 15) AS BIGINT)) AS kth_hash60,
              CAST(sum(in_a * in_b) AS BIGINT) AS n_both
            FROM f),
          est AS (SELECT n_m, kth_hash60, n_both,
              CASE WHEN n_m < 256 THEN CAST(n_m AS DOUBLE)
                ELSE 255.0 * pow(2.0, 60.0) / CAST(kth_hash60 AS DOUBLE) END AS eu
            FROM agg),
          sides AS (SELECT w,
              max(CASE WHEN side_a THEN 1 ELSE 0 END) AS ia,
              max(CASE WHEN side_a THEN 0 ELSE 1 END) AS ib
            FROM w GROUP BY w),
          ex AS (SELECT count(*) AS exact_union,
              CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS exact_inter
            FROM sides)
          SELECT n_m, kth_hash60, n_both, round(eu, 4) AS est_union,
            round(CAST(n_both AS DOUBLE) / n_m, 6) AS jaccard,
            round(CAST(n_both AS DOUBLE) / n_m * eu, 4) AS est_inter,
            exact_union, exact_inter
          FROM est CROSS JOIN ex"""),
      "KMV union/intersection/Jaccard from two k-min sketches, exact ride-along"),

    // --------------------------------------------- Hilbert-curve layout
    // The continuity upgrade over q99's Z-order: consecutive Hilbert
    // indices are ALWAYS Manhattan-adjacent cells (no power-of-two
    // diagonal jumps), so file min/max ranges cluster tighter on box
    // predicates (Faloutsos & Roseman PODS'89). Same physical recipe as
    // writeZOrdered — range-partition + sort on the curve value. The
    // oracle re-walks all 8 rotate/flip levels CTE-for-CTE in exact
    // long arithmetic; the adjacency property itself is spec-pinned
    // over the full 16×16 grid (SketchSpec).
    "q153_hilbert_box" -> Q(
      (s, d) => {
        import s.implicits._
        val boxed = t(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            ($"l_partkey" % 256).cast("long").as("x"),
            ($"l_suppkey" % 256).cast("long").as("y"))
          .filter($"x".between(32, 47) && $"y".between(10, 20))
        Layout.withHilbert(boxed, $"x", $"y", bits = 8, out = "h")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some(s"""WITH src AS (SELECT l_orderkey, l_linenumber,
              CAST(l_partkey % 256 AS BIGINT) AS x,
              CAST(l_suppkey % 256 AS BIGINT) AS y
            FROM lineitem
            WHERE (l_partkey % 256) BETWEEN 32 AND 47
              AND (l_suppkey % 256) BETWEEN 10 AND 20),
          ${Layout.hilbertOracleCtes("src", "x", "y", 8)}
          SELECT l_orderkey, l_linenumber, x, y, hd8 AS h
          FROM hilb_8 ORDER BY l_orderkey, l_linenumber"""),
      "Hilbert curve index pinned level-for-level on a 2-D box predicate")
  )
}
