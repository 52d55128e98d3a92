package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Curation

/** Corpus-curation suite over `documents`: LM-quality filtering, DSIR
  * importance resampling, and sequence packing — the selection/layout
  * stages of an LLM training-data pipeline (driver-brief extensions;
  * the reference repo rahult18/NYC-Yellow-Taxi-Trip-Data-Pipeline has
  * no text stage). All scores are fixed-point integers, so every query
  * is fully hash-compared against the DuckDB oracle.
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** Shared oracle CTEs: `ws(doc_id, lang, ws)` token arrays and
    * `big(doc_id, lang, w1, w2)` — every bigram occurrence in id order,
    * the exact mirror of [[Curation.bigrams]]'s shifted-slice zip. */
  private val bigramCtes: String =
    """ws AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
         FROM documents),
       big AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM (
         SELECT doc_id, lang, unnest(list_transform(range(1, len(ws)),
             i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
         FROM ws))"""

  val all: Seq[(String, Q)] = Seq(

    // ------------------------------------------------- bigram-LM quality
    // CCNet-style quality filter (Wenzek et al. LREC 2020) with the
    // external KenLM replaced by self-trained bigram MLE counts and
    // perplexity by the fixed-point average conditional probability
    // (integer-exact, see Curation.lmQualityScores). Docs whose word
    // transitions are corpus-typical score high; the score column is
    // what a curation pipeline thresholds on.
    "q177_lm_quality" -> Q(
      (s, d) => {
        import s.implicits._
        Curation.lmQualityScores(docs(s, d), "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $bigramCtes,
          c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
          c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
          p AS (SELECT b.doc_id, (c12.c12 * ${Curation.Scale}) // c1.c1 AS p_scaled
            FROM big b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
                       JOIN c1 ON b.w1 = c1.w1)
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(CAST(sum(p_scaled) AS BIGINT) // count(*) AS BIGINT) AS lm_score
        FROM p GROUP BY doc_id ORDER BY doc_id"""),
      "bigram-LM quality score per doc: CCNet-style filter, integer-exact"),

    // --------------------------------------------- DSIR data selection
    // Hashed-bigram importance resampling (Xie et al. NeurIPS 2023):
    // target = the English slice, source = the full corpus; 256 hashed
    // features; top-25 source docs by length-normalized importance.
    // The bucket ids combine per-token xxhash64 residues mod 256 — the
    // oracle re-derives Spark's xxhash64 from the XXH64 spec
    // (xxhash64Ctes), maps it unsigned in HUGEINT (2^8 | 2^64 makes the
    // residues agree), with the loud out-of-envelope guard on the hash
    // CTE.
    "q178_dsir_select" -> Q(
      (s, d) => {
        import s.implicits._
        val src = docs(s, d)
        Curation.dsirSelect(src, src.filter($"lang" === "en"),
          "doc_id", "text", buckets = 256, k = 25)
      },
      Some {
        val M = "18446744073709551616" // 2^64
        s"""WITH $bigramCtes,
          toks AS (SELECT DISTINCT CAST(0 AS BIGINT) AS doc_id, sh
            FROM (SELECT unnest(ws) AS sh FROM ws)),
          ${TextQueries.xxhash64Ctes("toks")},
          xm AS MATERIALIZED (SELECT sh, xh FROM xxh),
          g AS (SELECT CASE WHEN count(*) = 0 THEN 0
                 ELSE CAST(error('dsir oracle: token outside the hash envelope')
                           AS BIGINT) END AS guard
            FROM xm WHERE xh IS NULL),
          h AS (SELECT sh, (CAST(xh AS HUGEINT) + $M) % $M AS xu FROM xm),
          bf AS (SELECT b.doc_id, b.lang,
              CAST(((h1.xu % 256) * 31 + (h2.xu % 256) + g.guard) % 256
                AS BIGINT) AS bucket
            FROM big b JOIN h h1 ON b.w1 = h1.sh
                       JOIN h h2 ON b.w2 = h2.sh, g),
          src AS (SELECT bucket, count(*) AS src_n FROM bf GROUP BY 1),
          tgt AS (SELECT bucket, count(*) AS tgt_n FROM bf
            WHERE lang = 'en' GROUP BY 1),
          w AS (SELECT bucket,
              ((coalesce(tgt_n, 0) + 1) * ${Curation.Scale})
                // (coalesce(src_n, 0) + 1) AS w_scaled
            FROM src FULL OUTER JOIN tgt USING (bucket))
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(CAST(sum(w_scaled) AS BIGINT) // count(*) AS BIGINT) AS dsir_score
        FROM bf JOIN w USING (bucket)
        GROUP BY doc_id ORDER BY dsir_score DESC, doc_id LIMIT 25"""
      },
      "DSIR hashed-bigram importance resampling: top-25 toward the en slice"),

    // ------------------------------------------------- sequence packing
    // Concat-and-chunk packing into 64-token training sequences: docs
    // laid end-to-end in id order, the stream cut every 64 tokens.
    // Engine cumsum is the range-partitioned two-pass prefix sum
    // (Stats.rangeCumSums); the oracle uses a plain window (oracle-only
    // plan shape, same arithmetic).
    "q179_sequence_pack" -> Q(
      (s, d) => {
        import s.implicits._
        Curation.packSequences(docs(s, d), "doc_id", "text", seqLen = 64)
          .orderBy($"seq_id")
      },
      Some("""WITH ws AS (SELECT doc_id,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
          FROM documents),
        c AS (SELECT doc_id, n,
            CAST(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
          FROM ws),
        e AS (SELECT doc_id, off, n,
            off // 64 AS fs, (off + n - 1) // 64 AS ls FROM c),
        x AS (SELECT doc_id, off, n, fs,
            unnest(range(fs, ls + 1)) AS seq_id FROM e)
      SELECT seq_id, count(*) AS n_docs,
        CAST(sum(CASE WHEN fs = seq_id THEN 1 ELSE 0 END) AS BIGINT)
          AS n_docs_starting,
        CAST(sum(least(off + n, (seq_id + 1) * 64)
               - greatest(off, seq_id * 64)) AS BIGINT) AS n_tokens
      FROM x GROUP BY seq_id ORDER BY seq_id"""),
      "concat-and-chunk packing into 64-token sequences, per-seq occupancy"),

    // --------------------------- weighted sample without replacement
    // Efraimidis-Spirakis (IPL 2006) A-Res: each item draws
    // u = (md5-slice + 0.5)/2^60 and the k items with the LARGEST
    // u^(1/w) are a weighted sample without replacement — the
    // distributed corpus-downsampling primitive (sample by quality
    // weight, dedup weight, domain budget). Ranked in log space,
    // key = ln(u)/w (monotone in u^(1/w), no pow): one NARROW
    // projection + a TakeOrdered top-k, nothing else — the shape that
    // holds at any corpus size, and the reason this beats the
    // sort-the-whole-corpus-by-priority layout. Weight here is
    // n_chars (longer documents proportionally likelier — the token-
    // budget sampling convention). Determinism: u is an md5 slice (the
    // q134 hash-sample discipline), and the emitted key is rounded at
    // 1e-9 — eight orders above any cross-engine ln() ULP wobble —
    // with doc_id as the total tie-break. CurationOpsSpec pins the
    // log-space trick against literal u^(1/w) ranking AND the
    // selection frequencies against the w_i/Σw law over md5 salts.
    "q231_weighted_sample" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .filter($"n_chars" > 0) // positive weights by contract
          .select($"doc_id", $"n_chars",
            conv(substring(md5(concat(lit("q231:"),
                $"doc_id".cast("string"))), 1, 15), 16, 10)
              .cast("long").as("h"))
          .select($"doc_id", $"n_chars",
            round(log(($"h" + lit(0.5)) / lit(1152921504606846976.0)) /
              $"n_chars", 9).as("es_key"))
          .orderBy($"es_key".desc, $"doc_id")
          .limit(20)
      },
      Some("""WITH k AS (SELECT doc_id, n_chars,
            CAST('0x' || substr(md5('q231:' || CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT) AS h
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, n_chars,
          round(ln((h + 0.5) / 1152921504606846976.0) / n_chars, 9) AS es_key
        FROM k ORDER BY es_key DESC, doc_id LIMIT 20"""),
      "Efraimidis-Spirakis weighted sample: one narrow pass + top-k, md5 draws")
  )
}
