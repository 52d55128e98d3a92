package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline extensions
  * (BASELINE.json north-star): tokenization, shingling, quality scoring,
  * language-ID heuristics, fingerprinting. All pure Catalyst expressions
  * (higher-order array functions, no UDFs) — they run inside codegen'd
  * projections and scale linearly with rows, no shuffle of their own.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens (the corpus is single-space separated). */
  def words(text: Column): Column = split(lower(text), " ")

  def wordCount(text: Column): Column = size(words(text))

  def uniqueWordCount(text: Column): Column = size(array_distinct(words(text)))

  /** BPE-ish token count: alpha runs, digit runs, and single non-alnum
    * marks — the classic pre-tokenizer split, kept to RE2-safe classes. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Distinct word-n-gram shingle HASHES (xxhash64 seed 42 of each
    * shingle string) via the codegen-friendly
    * [[graft.expressions.WordShingleHash64]] — one static call per row
    * over the lowered UTF-8 bytes instead of the interpreted
    * split/transform/slice/concat_ws chain (~1 ms/doc → ~µs/doc). Hash
    * equality with `xxhash64` over [[wordShingles]] elements is pinned
    * in ExpressionSpec. */
  def wordShingleHash64(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(graft.expressions.WordShingleHash64(
      GraftGlue.expression(text), n))
  }

  /** All width-char window hashes of a text in one O(n) pass
    * ([[graft.expressions.RollingWindowHash]]): polynomial rolling hash
    * over code points, mod 2⁶¹−1 — the 8-byte-key engine of the q275
    * substring-dedup path (candidates only; consumers verify on the
    * actual substring). Element i = the window at 1-based char pos i+1. */
  def rollingWindowHash(text: Column, width: Int): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(graft.expressions.RollingWindowHash(
      GraftGlue.expression(text), width))
  }

  /** The k salted MinHash slot values of a token straight from md5
    * digest bytes ([[graft.expressions.Md5MinHash60]]) — bit-equal to
    * the `conv(substring(md5(...)))` formulation, with no hex string /
    * substring / base-16 parse per slot. */
  def md5MinHash60(tok: Column, k: Int): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(graft.expressions.Md5MinHash60(
      GraftGlue.expression(tok), k))
  }

  /** 60-bit decode of hex chars 1-15 of md5(tok)
    * ([[graft.expressions.Md5Head60]]) — the single-digest token base
    * of the LCG/OPH MinHash families. */
  def md5Head60(tok: Column): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(graft.expressions.Md5Head60(
      GraftGlue.expression(tok)))
  }

  /** Character n-gram shingle set (distinct). Guards short strings by
    * falling back to the whole string as one shingle. */
  def charNGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array(text))

  /** Word n-gram shingle set (distinct), same short-input guard. */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /** |A ∩ B| / |A ∪ B| via the inclusion-exclusion identity — avoids
    * engine-specific intersect dedup rules, so the same arithmetic is
    * expressible in the DuckDB oracle. Inputs are deduped here; the
    * identity is only valid on sets. */
  def jaccard(a: Column, b: Column): Column = {
    val (da, db) = (array_distinct(a), array_distinct(b))
    val union = size(array_distinct(concat(da, db)))
    (size(da) + size(db) - union).cast("double") / union
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ws = words(text)
    size(filter(ws, w => w.isin(stopwords: _*))).cast("double") / size(ws)
  }

  /** Fraction of characters that are lowercase ASCII letters; 0.0 for
    * empty text (routine in raw corpora; unguarded division would throw
    * under ANSI mode). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") / length(text))

  /** Marker-word hit count for one language (n-gram-free language-ID
    * heuristic; see langId for the argmax decision). */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(words(text), w => w.isin(markers: _*)))

  /** Deterministic argmax over four language scores with a fixed
    * tie-break order (en > de > es > fr). Null scores (a null document)
    * yield null, not a spurious "fr" — every `when` predicate on nulls
    * is null/skipped, so without the guard the otherwise branch would
    * claim unscorable rows. */
  def langId(en: Column, de: Column, es: Column, fr: Column): Column =
    when(en.isNull || de.isNull || es.isNull || fr.isNull, lit(null).cast("string"))
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")

  /** Normalization fingerprint (OpenRefine-style): md5 of the sorted
    * distinct token set — catches shuffled/duplicated-word near-dups. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Order-sensitive rolling document hash: Horner polynomial over token
    * hashes mod a 56-bit prime. The modulus keeps every intermediate
    * below 2^61 (acc < 2^56, ×31 < 2^61), so the arithmetic never
    * overflows — ANSI mode turns a silent long wraparound into a
    * query-killing throw, which the naive acc*BIG+h form would hit on any
    * document beyond a few tokens. */
  def rollingHash64(text: Column): Column = {
    val p = 72057594037927931L // largest prime < 2^56
    aggregate(words(text), lit(0L),
      (acc, w) => pmod(acc * 31 + pmod(xxhash64(w), lit(p)), lit(p)))
  }
}
