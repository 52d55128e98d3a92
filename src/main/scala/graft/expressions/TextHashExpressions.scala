package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly word-shingle hashing for similarity joins.
  *
  * `TextFunctions.wordShingles` (split → transform → slice → concat_ws →
  * array_distinct) is a chain of higher-order functions that Spark
  * evaluates INTERPRETED — measured ~1 ms per document, which dominates
  * an AllPairs prefix join end-to-end (Dedup.prefixJaccardPairs). This
  * expression computes the same shingle IDENTITY — xxhash64 (seed 42,
  * Spark's) of each distinct word n-gram string — in one pass over the
  * lowered text's UTF-8 bytes, exploiting that joining consecutive
  * `split(text, " ")` tokens with " " reconstructs the original byte
  * span: shingle k is exactly bytes [start(word k), end(word k+n−1)),
  * so no per-shingle string is ever materialized. ASCII 0x20 never
  * occurs inside a UTF-8 multibyte sequence, so byte-level space
  * scanning is UTF-8-safe. Shorter-than-n texts fall back to one
  * whole-text shingle, mirroring wordShingles' fallback (join of all
  * split tokens == the original string).
  *
  * doGenCode emits one static call per row — not a fused loop, but on
  * the codegen path: no interpreted expression-tree walk per element,
  * no intermediate arrays/strings. Hash equality with
  * `xxhash64(explode(wordShingles(text, n)))` is pinned in
  * ExpressionSpec. */
case class WordShingleHash64(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = s"word_shingle_hash64"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHash64.hashShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingleHash64.hashShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The k salted MinHash slot values of one token, computed straight
  * from md5 DIGEST BYTES: slot 2m (2m+1) is the 60-bit integer decode
  * of hex chars 1-15 (16-30) of md5("m:" ++ token) — exactly
  * `conv(substring(md5(concat(lit("m:"), tok)), 1+15·(j%2), 15), 16,
  * 10).cast("long")`, the portable decode the DuckDB oracle mirrors —
  * but with NO hex string, NO substring and NO base-16 parse: the two
  * halves read directly out of the 16 digest bytes (chars 1-15 = top
  * 60 bits of the big-endian first 8 bytes; chars 16-30 = low 60 bits
  * of big-endian bytes 7-14). One thread-local MessageDigest serves all
  * k/2 digests of a row; doGenCode emits one static call per row, so
  * the whole k-wide fan-out stays inside whole-stage codegen as one
  * array-producing expression. Bit-equality with the SQL-functions
  * formulation is pinned in TextDedupSpec. */
case class Md5MinHash60(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2 && k % 2 == 0, s"k=$k must be even (two hashes per md5)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "md5_minhash60"

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHash60.hashAll(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5MinHash60.hashAll($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinHash60 {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  // "m:" prefix bytes per slot-pair index, computed once per k
  private val prefixes =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()

  private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** 60-bit decode of hex chars 1-15 of md5(token) — the unsalted base
    * hash of the LCG/OPH MinHash families
    * (`conv(substring(md5(sh), 1, 15), 16, 10)`). */
  def head60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    digest.update(s.getBytes)
    be64(digest.digest(), 0) >>> 4
  }

  def hashAll(s: UTF8String, k: Int): ArrayData = {
    val pre = prefixes.computeIfAbsent(k,
      kk => Array.tabulate(kk / 2)(m => s"$m:".getBytes("UTF-8")))
    val tok = s.getBytes
    val out = new Array[Long](k)
    val digest = md.get()
    var m = 0
    while (m < k / 2) {
      digest.reset()
      digest.update(pre(m))
      digest.update(tok)
      val d = digest.digest()
      // hex chars 1-15 = nibbles 0-14 = top 60 bits of bytes [0, 8)
      out(2 * m) = be64(d, 0) >>> 4
      // hex chars 16-30 = nibbles 15-29 = low 60 bits of bytes [7, 15)
      out(2 * m + 1) = be64(d, 7) & 0x0fffffffffffffffL
      m += 1
    }
    new GenericArrayData(out)
  }
}

/** [[Md5MinHash60.head60]] as a standalone scalar expression — the
  * single-digest token base the LCG and OPH MinHash schemes reduce. */
case class Md5Head60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "md5_head60"

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHash60.head60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5MinHash60.head60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `width`-char window hashes of a text in ONE O(n) pass — the
  * codegen'd engine for exact substring dedup at scale
  * ([[graft.operators.Dedup.substringDedupRolling]], q275).
  *
  * The md5 formulation (q273) hashes every 40-char window from scratch:
  * O(n·width) digest work per doc plus a 32-char hex string per window
  * through the shuffle. This expression computes the classic polynomial
  * rolling hash over CODE POINTS —
  * h(p) = Σ cp(p+j)·B^(width−1−j) mod M, B = 131, M = 2⁶¹−1 —
  * with the O(1) slide h' = (h − cp_out·B^(width−1))·B + cp_in mod M:
  * one pass, two modular multiplies per char, an 8-byte key per window.
  * 128-bit products reduce via the Mersenne fold (2⁶⁴ ≡ 8 mod M) on
  * `Math.multiplyHigh` — no BigInteger, no allocation beyond the output
  * array and a width-sized ring buffer.
  *
  * A 61-bit hash is NOT collision-free, so the consumer must treat
  * equal hashes as CANDIDATES and verify on the actual substring (the
  * banded-Hamming verify discipline) — which also means hash identity
  * never crosses engines: the DuckDB oracle pins the RESULT by grouping
  * on the substring itself, not the hash. Output: one long per window,
  * index i = the window starting at 1-based char position i+1; texts
  * shorter than `width` return an empty array. */
case class RollingWindowHash(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 2, s"window width must be >= 2, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "rolling_window_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingWindowHash.hashWindows(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingWindowHash.hashWindows($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingWindowHash {

  /** Mersenne prime 2^61 - 1: products of two residues fit 122 bits,
    * and 2^64 ≡ 2^3 (mod M) makes the 128-bit reduction two shifts. */
  val M: Long = (1L << 61) - 1
  val B: Long = 131L

  /** (a · b) mod M for a, b in [0, M). */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // a·b = hi·2^64 + lo ≡ hi·8 + (lo >>> 61) + (lo & M)  (mod M)
    var r = (hi << 3) | (lo >>> 61)
    r += lo & M
    if (r >= M) r -= M
    if (r >= M) r -= M
    r
  }

  /** B^e mod M by square-and-multiply (e = width - 1, computed once
    * per call site — the JIT hoists it out of the per-row loop via the
    * thread-local cache below). */
  def powB(e: Int): Long = {
    var r = 1L; var b = B; var k = e
    while (k > 0) {
      if ((k & 1) == 1) r = mulMod(r, b)
      b = mulMod(b, b)
      k >>= 1
    }
    r
  }

  private val bw1Cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()

  def hashWindows(s: UTF8String, width: Int): ArrayData = {
    val bw1: Long = bw1Cache.computeIfAbsent(width, w => powB(w - 1))
    val bytes = s.getBytes
    val nBytes = bytes.length
    val ring = new Array[Int](width)
    // sequential UTF-8 decode: code points arrive in order, which is
    // all a rolling recurrence needs — no random char access ever
    var h = 0L
    var ci = 0          // char index of the NEXT code point
    var bi = 0          // byte cursor
    var out: Array[Long] = null
    var m = 0           // windows emitted
    while (bi < nBytes) {
      val b0 = bytes(bi) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; bi += 1 }
      else if ((b0 & 0xe0) == 0xc0 && bi + 1 < nBytes) {
        cp = ((b0 & 0x1f) << 6) | (bytes(bi + 1) & 0x3f); bi += 2
      } else if ((b0 & 0xf0) == 0xe0 && bi + 2 < nBytes) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(bi + 1) & 0x3f) << 6) |
          (bytes(bi + 2) & 0x3f); bi += 3
      } else if ((b0 & 0xf8) == 0xf0 && bi + 3 < nBytes) {
        cp = ((b0 & 0x07) << 18) | ((bytes(bi + 1) & 0x3f) << 12) |
          ((bytes(bi + 2) & 0x3f) << 6) | (bytes(bi + 3) & 0x3f); bi += 4
      } else { cp = b0; bi += 1 } // malformed byte: degrade, don't throw
      if (ci >= width) {
        // slide: drop the char leaving the window
        var t = h - mulMod(ring(ci % width).toLong, bw1)
        if (t < 0) t += M
        h = mulMod(t, B)
        h += cp.toLong
        if (h >= M) h -= M
      } else {
        // fill: Horner
        h = mulMod(h, B)
        h += cp.toLong
        if (h >= M) h -= M
      }
      ring(ci % width) = cp
      ci += 1
      if (ci >= width) {
        if (out == null) {
          // sized by the BYTE count — an upper bound on code points
          // that stays valid even for malformed UTF-8 (where numChars
          // and this decoder's degrade-don't-throw fallback can
          // disagree — round-15 self-review catch); truncated below
          out = new Array[Long](nBytes - width + 1)
        }
        out(m) = h
        m += 1
      }
    }
    if (out == null) new GenericArrayData(Array.emptyLongArray)
    else if (m == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object WordShingleHash64 {

  /** Single pass: lowercase, scan space positions, hash each word-n-gram
    * byte span with XXH64 seed 42 (== Spark's xxhash64 of the shingle
    * string), dedup preserving first occurrence. */
  def hashShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    // space positions; W words = spaces + 1 (split(" ") keeps empties)
    var spaceCount = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaceCount += 1; i += 1 }
    val words = spaceCount + 1
    if (words < n) {
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      return new GenericArrayData(Array(h))
    }
    val spaces = new Array[Int](spaceCount)
    var j = 0; i = 0
    while (i < len) { if (bytes(i) == ' ') { spaces(j) = i; j += 1 }; i += 1 }
    val out = new Array[Long](words - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](words * 2)
    var m = 0
    var k = 0
    while (k <= words - n) {
      val start = if (k == 0) 0 else spaces(k - 1) + 1
      val end = if (k + n - 1 < words - 1) spaces(k + n - 1) else len
      val h = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      k += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }
}
