package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + dedup + multimodal-plumbing suite over `documents` —
  * the LLM-data-pipeline extensions (BASELINE.json north-star). Oracled
  * wherever DuckDB can express the same arithmetic; hash-based ops
  * (MinHash/SimHash use Spark's xxhash64) are rows-only by design.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  private val EnStops = Seq("the", "a", "of", "and")
  private val DeStops = Seq("der", "die", "und", "das")
  private val EsStops = Seq("el", "la", "los", "y")
  private val FrStops = Seq("le", "les", "et", "dans")

  val all: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------- token counting
    "q30_text_tokens" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d).select(
          $"doc_id",
          length($"text").as("n_chars_actual"),
          wordCount($"text").as("n_tokens"),
          uniqueWordCount($"text").as("n_unique"),
          bpeishTokenCount($"text").as("n_bpeish"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_actual,
        CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
        CAST(len(list_distinct(string_split(lower(text), ' '))) AS INTEGER) AS n_unique,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpeish
        FROM documents ORDER BY doc_id"""),
      "token counting: whitespace + BPE-ish regex pre-tokenizer"),

    // ------------------------------------------------------ quality scoring
    "q31_text_quality" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d).select(
          $"doc_id",
          wordCount($"text").as("n_words"),
          round(stopwordRatio($"text", EnStops), 6).as("stop_ratio"),
          round(alphaRatio($"text"), 6).as("alpha_ratio"),
          round(length(translate($"text", " ", "")).cast("double") /
            wordCount($"text"), 6).as("avg_word_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_words,
        round(CAST(len(list_filter(string_split(lower(text), ' '),
          w -> w IN ('the','a','of','and'))) AS DOUBLE) / len(string_split(lower(text), ' ')), 6) AS stop_ratio,
        round(CASE WHEN length(text) = 0 THEN 0.0
          ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS alpha_ratio,
        round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(lower(text), ' ')), 6) AS avg_word_len
        FROM documents ORDER BY doc_id"""),
      "quality scoring: length/stopword/alpha ratios"),

    // ---------------------------------------------------------- language-ID
    // Marker-word heuristic with a deterministic argmax; aggregated as a
    // (declared_lang × predicted_lang) contingency table.
    "q32_text_langid" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d).select($"lang",
            langId(langScore($"text", EnStops), langScore($"text", DeStops),
                   langScore($"text", EsStops), langScore($"text", FrStops)).as("pred_lang"))
          .groupBy($"lang", $"pred_lang")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"pred_lang")
      },
      Some("""WITH sc AS (SELECT lang,
          len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and'))) AS en,
          len(list_filter(string_split(lower(text),' '), w -> w IN ('der','die','und','das'))) AS de,
          len(list_filter(string_split(lower(text),' '), w -> w IN ('el','la','los','y'))) AS es,
          len(list_filter(string_split(lower(text),' '), w -> w IN ('le','les','et','dans'))) AS fr
        FROM documents)
        SELECT lang, CASE WHEN en >= de AND en >= es AND en >= fr THEN 'en'
          WHEN de >= es AND de >= fr THEN 'de' WHEN es >= fr THEN 'es'
          ELSE 'fr' END AS pred_lang, count(*) AS n
        FROM sc GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""),
      "language-ID heuristic via marker-word argmax"),

    // -------------------------------------------------------- fingerprinting
    "q33_text_fingerprint" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d).select($"doc_id", fingerprint($"text").as("fp")).orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
          string_split(lower(text), ' '))), ' ')) AS fp
        FROM documents ORDER BY doc_id"""),
      "normalization fingerprint (sorted distinct token set → md5)"),

    // ----------------------------------------------------------- exact dedup
    "q40_dedup_exact" -> Q(
      (s, d) => Dedup.exactStats(docs(s, d), "text"),
      Some("""SELECT count(*) AS n_docs,
        count(DISTINCT md5(text)) AS n_unique_exact,
        count(DISTINCT md5(array_to_string(list_sort(list_distinct(
          string_split(lower(text), ' '))), ' '))) AS n_unique_fingerprint
        FROM documents"""),
      "exact + fingerprint dedup stats in one pass"),

    // ------------------------------------------------- n-gram Jaccard pairs
    // Exact character-3-gram Jaccard over a bounded id range — the
    // ground-truth near-dup measure the LSH path approximates.
    "q41_dedup_ngram_jaccard" -> Q(
      (s, d) => {
        import s.implicits._
        val sh = docs(s, d).filter($"doc_id" < 100)
          .select($"doc_id", charNGrams($"text", 3).as("sh"))
        val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
        val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
        a.join(b, $"id_a" < $"id_b")
          .select($"id_a", $"id_b", round(jaccard($"sh_a", $"sh_b"), 6).as("jaccard"))
          .filter($"jaccard" >= 0.6)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH s AS (SELECT doc_id, CASE WHEN length(text) >= 3
          THEN list_distinct(list_transform(range(1, length(text)-1), i -> substr(text, i, 3)))
          ELSE [text] END AS sh
        FROM documents WHERE doc_id < 100)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          round((len(a.sh)+len(b.sh)-len(list_distinct(list_concat(a.sh,b.sh))))::DOUBLE
            / len(list_distinct(list_concat(a.sh,b.sh))), 6) AS jaccard
        FROM s a, s b WHERE a.doc_id < b.doc_id
          AND round((len(a.sh)+len(b.sh)-len(list_distinct(list_concat(a.sh,b.sh))))::DOUBLE
            / len(list_distinct(list_concat(a.sh,b.sh))), 6) >= 0.6
        ORDER BY id_a, id_b"""),
      "exact n-gram Jaccard near-dup pairs (bounded baseline)"),

    // ------------------------------------------------------ MinHash+LSH dedup
    // Scale path: shingle → 64 minhashes → 8 bands of 8 → bucket equi-join
    // → exact-Jaccard verify on candidates only. r=8 rows/band keeps the
    // candidate rate low even on this pathologically-self-similar corpus
    // (unigram Jaccard median ≈0.62); the id bound keeps the *query* fixed
    // across SFs — the operator itself is unbounded.
    // Rows-only check: MinHash uses Spark's xxhash64, not SQL-expressible.
    "q42_dedup_minhash_lsh" -> Q(
      (s, d) => {
        import s.implicits._
        Dedup.minhashNearDups(docs(s, d).filter($"doc_id" < 1000), "doc_id", "text",
            shingleWords = 1, k = 64, bands = 8, threshold = 0.9)
          .orderBy($"id_a", $"id_b")
      },
      None,
      "MinHash+LSH near-dup pipeline (banded, verify-on-candidates)"),

    // ----------------------------------------------------------- SimHash dedup
    // 64-bit SimHash sketches + banded pair search (first 16 bits as the
    // bucket), Hamming-verified. Rows-only (xxhash64-based).
    "q43_dedup_simhash" -> Q(
      (s, d) => {
        import s.implicits._
        val sh = Dedup.simhash64(docs(s, d).filter($"doc_id" < 300), "doc_id", "text")
        val a = sh.select($"doc_id".as("id_a"), $"simhash".as("ha"))
        val b = sh.select($"doc_id".as("id_b"), $"simhash".as("hb"))
        a.join(b, $"id_a" < $"id_b")
          .withColumn("dist", Dedup.hamming64($"ha", $"hb"))
          .filter($"dist" <= 10)
          .select($"id_a", $"id_b", $"dist")
          .orderBy($"id_a", $"id_b")
      },
      None,
      "SimHash near-dup pairs (Hamming ≤ 10 over 64-bit sketches)"),

    // ------------------------------------------------- multimodal plumbing
    // Binary media columns with typed metadata: content as opaque bytes
    // (here derived from text — the container has no codecs), metadata
    // extracted relationally. The decode stub lives in
    // graft.multimodal.Multimodal; this query oracle-checks the
    // schema/bytes/digest plumbing end-to-end.
    "q44_multimodal_meta" -> Q(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"doc_id", $"text".cast("binary").as("blob"))
          .select(
            $"doc_id",
            length($"blob").as("n_bytes"),
            sha2($"blob", 256).as("digest"),
            (length($"blob") % 640).as("fake_width"),
            (length($"blob") * 7 % 480).as("fake_height"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        sha256(text) AS digest,
        CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
        CAST(octet_length(encode(text)) * 7 % 480 AS INTEGER) AS fake_height
        FROM documents ORDER BY doc_id"""),
      "multimodal binary column: byte length, digest, stub decode dims")
  )
}
