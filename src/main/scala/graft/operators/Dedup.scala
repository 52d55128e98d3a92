package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, fingerprint, MinHash+LSH, SimHash. Every stage is a shuffle-
  * bounded DataFrame plan (explode → hash-aggregate → equi-join); nothing
  * touches the driver, so each op scales horizontally with executors.
  */
object Dedup {

  /** Exact dedup stats: total vs distinct-by-content-hash. */
  def exactStats(df: DataFrame, text: String): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col(text))).as("n_unique_exact"),
           countDistinct(TextFunctions.fingerprint(col(text))).as("n_unique_fingerprint"))

  /** Exact dedup keeper selection: min id per content hash (the standard
    * "keep first" policy, expressed as one hash aggregate). */
  def exactKeepers(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: k independent min-hashes over the distinct
    * shingle set of each doc, as one explode + one grouped aggregate with
    * k running mins. This shape is deliberately NOT a higher-order-
    * function expression: HOF lambdas evaluate interpreted (outside
    * whole-stage codegen), ~10× slower per hash — the explode/agg form
    * keeps xxhash64 codegen'd and is map-side combinable, so shuffle
    * volume is O(docs × k) regardless of shingle count. */
  def minhashSignatures(df: DataFrame, id: String, shingles: Column,
                        k: Int): DataFrame = {
    val mins = (0 until k).map(j => min(xxhash64(lit(j), col("sh"))).as(s"mh$j"))
    df.select(col(id), explode(shingles).as("sh"))
      .groupBy(col(id))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: signature → (band_idx, band_hash) rows. Docs sharing any
    * band bucket become candidate pairs. bands must divide k. */
  def lshBands(sigs: DataFrame, id: String, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(j => col(s"mh$j")): _*)
    }
    sigs.select(col(id), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate pairs from band buckets: self equi-join on (band_idx,
    * band_hash) with id_a < id_b, then distinct.
    *
    * Buckets larger than `maxBucket` are dropped first (stop-bucket
    * removal, the standard LSH hygiene step): a bucket of b docs emits
    * b²/2 pairs, so one pathological bucket — boilerplate-heavy corpora
    * produce them — turns the join quadratic and skews one task. The cap
    * bounds any bucket's contribution and, at cluster scale, keeps the
    * shuffle-side pair explosion O(buckets · maxBucket²). Docs in dropped
    * buckets still pair through their other bands. */
  def lshCandidates(bandsDf: DataFrame, id: String,
                    maxBucket: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = bandsDf.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("band_idx"), col("band_hash"), col(id).as("id_a"))
    val b = sized.select(col("band_idx"), col("band_hash"), col(id).as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-Jaccard verify. Only candidate pairs (a vanishing fraction of
    * n²) ever join back to their shingle sets. */
  def minhashNearDups(df: DataFrame, id: String, text: String,
                      shingleWords: Int = 1, k: Int = 64, bands: Int = 8,
                      threshold: Double = 0.9): DataFrame = {
    val shingled = df.select(col(id),
      TextFunctions.wordShingles(col(text), shingleWords).as("sh_set"))
    val sigs = minhashSignatures(shingled, id, col("sh_set"), k)
    val cands = lshCandidates(lshBands(sigs, id, k, bands), id)
    val sets = shingled.select(col(id), col("sh_set"))
    cands
      .join(sets.select(col(id).as("id_a"), col("sh_set").as("sh_a")), "id_a")
      .join(sets.select(col(id).as("id_b"), col("sh_set").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from the doc's distinct token set: per bit, sum +1/-1
    * weighted by token-hash bit, take the sign. Expressed as 64 running
    * sums in one hash aggregate (map-side combinable). */
  def simhash64(df: DataFrame, id: String, text: String): DataFrame = {
    val tokens = df.select(col(id),
      explode(array_distinct(TextFunctions.words(col(text)))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val sums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val bitSums = tokens.groupBy(col(id)).agg(sums.head, sums.tail: _*)
    bitSums.select(col(id),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** Hamming distance between two 64-bit sketches (popcount of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
