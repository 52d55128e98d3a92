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
