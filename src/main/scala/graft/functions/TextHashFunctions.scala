package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over every `k`-char window of a string, as a
  * native codegen expression: one O(n) pass emits n-k+1 window hashes
  * (h_{i+1} = (h_i - c_i·B^{k-1})·B + c_{i+k} mod P). The built-in
  * composition (transform over sequence + substring + hash) would rehash
  * every window from scratch — O(n·k) — and allocate a substring per
  * window. This is the standard primitive under content-defined chunking
  * and winnowing-style document fingerprinting.
  *
  * Deterministic: fixed base/modulus, byte-level iteration over the
  * UTF-8 encoding. Strings shorter than `k` yield an empty array.
  */
case class RollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(RollingHash.hashes(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.hashes($c.getBytes(), $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** 31-bit Mersenne prime modulus (2^31 - 1): with h < P, every step's
    * product (h*B, drop*B^{k-1} term) stays well under 2^63 in plain Long
    * arithmetic — no 128-bit tricks needed. Hash space is ~2.1e9, ample
    * for per-document window fingerprints (birthday collisions only
    * matter around ~5e4 windows PER COMPARISON SET, far above any
    * document's window count); base 131 is the classic Rabin-Karp odd
    * prime. */
  private final val P = 2147483647L // 2^31 - 1
  private final val B = 131L

  /** All k-byte window hashes of `bytes` (empty array if too short).
    * Shared by interpreted eval and generated code. */
  def hashes(bytes: Array[Byte], k: Int): Array[Long] = {
    val n = bytes.length
    if (n < k) return Array.emptyLongArray
    // B^(k-1) mod P for the remove-leading-byte step
    var bk = 1L
    var i = 1
    while (i < k) { bk = (bk * B) % P; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xFF)) % P; i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      val drop = ((bytes(i - k) & 0xFF) * bk) % P
      h = ((h - drop + P) * B + (bytes(i) & 0xFF)) % P
      out(i - k + 1) = h
      i += 1
    }
    out
  }
}

/** Minimum of every `w`-wide window of a long array, O(n) via a monotonic
  * deque — the winnowing selection step. The built-in composition
  * (`transform(sequence, i -> array_min(slice(arr, i, w)))`) is O(n·w)
  * and allocates a slice per window. */
case class SlidingMin(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window size must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_min requires array<bigint> without null elements, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    new GenericArrayData(SlidingMin.mins(arr.toLongArray(), w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = SlidingMin.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.mins($c.toLongArray(), $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SlidingMin {
  /** Monotonic-deque sliding minimum: each index enters and leaves the
    * deque at most once → O(n) total. Empty result if the array is
    * shorter than the window. */
  def mins(a: Array[Long], w: Int): Array[Long] = {
    val n = a.length
    if (n < w) return Array.emptyLongArray
    val out = new Array[Long](n - w + 1)
    val deque = new Array[Int](n) // indices, increasing values
    var head = 0; var tail = 0    // deque = [head, tail)
    var i = 0
    while (i < n) {
      if (head < tail && deque(head) <= i - w) head += 1 // expire left
      while (head < tail && a(deque(tail - 1)) >= a(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (i >= w - 1) out(i - w + 1) = a(deque(head))
      i += 1
    }
    out
  }
}

/** Distinct xxhash64 values of every `n`-consecutive-word shingle of a
  * string, in one pass over the UTF-8 bytes — the scan-side kernel of
  * n-gram dedup (d2) and MinHash LSH (d3).
  *
  * Bit-compatibility contract: returns EXACTLY
  * `transform(shingles, s -> xxhash64(s))` where `shingles` is the
  * distinct word-n-gram list produced by `split(text, " ")` +
  * `concat_ws(" ", w_j ... w_{j+n-1})` (first-occurrence order). This
  * holds because word boundaries are single 0x20 bytes, so each joined
  * shingle is byte-identical to the SPAN of the original text from the
  * first word's start to the last word's end — hashed in place with
  * Spark's own XXH64 (seed 42), no substring is ever materialized.
  *
  * Why it exists: the built-in composition
  * (`transform(sequence(...), i -> concat_ws(element_at...))`) is a
  * higher-order function — CodegenFallback, interpreted per element, and
  * it allocates every shingle string (measured ~12 µs per shingle at
  * sf0.1: the whole d2 scan was 11 s of a 14 s query). This kernel is
  * O(bytes) per document, allocation-light, and emits 8-byte longs so the
  * downstream (source, shingle) shuffle moves ~4x fewer bytes than
  * shuffling 3-word strings — the difference between a scan-bound and a
  * shuffle-bound dedup at 100 TB.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new GenericArrayData(WordShingleHashes.hashes(s, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = WordShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.hashes($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Distinct hashes of the n-word shingles of `s`, first-occurrence
    * order. `split(" ")` semantics: words are the segments between single
    * space bytes, EMPTY segments included (leading/trailing/consecutive
    * spaces), so `m = spaces + 1`; fewer than n words → empty array.
    * Shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, n: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // pass 1: count spaces → word count
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1
    if (m < n) return Array.emptyLongArray
    // pass 2: word start/end byte offsets (end exclusive)
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        ends(w) = i; w += 1; starts(w) = i + 1
      }
      i += 1
    }
    ends(w) = len
    // hash each shingle's span in place; dedupe preserving first occurrence
    val total = m - n + 1
    val out = new Array[Long](total)
    var count = 0
    val seen = new java.util.HashSet[java.lang.Long](total * 2)
    var j = 0
    while (j < total) {
      val a = starts(j)
      val b = ends(j + n - 1)
      val h = XXH64.hashUnsafeBytes(base, off + a, b - a, 42L)
      if (seen.add(h)) { out(count) = h; count += 1 }
      j += 1
    }
    if (count == total) out else java.util.Arrays.copyOf(out, count)
  }
}

/** Per-bigram polynomial feature buckets in one pass over the UTF-8
  * bytes — the scan-side kernel of DSIR-style hashed-n-gram importance
  * scoring (t23). For each adjacent word pair the bucket is the byte-wise
  * fold  acc = (acc·131 + byte) mod `p`  over the pair's span, taken
  * mod `b` buckets. Word boundaries are single 0x20 bytes, so the span
  * from word j's first byte to word j+1's last byte IS the joined string
  * `w_j || ' ' || w_{j+1}` (the WordShingleHashes trick) — nothing is
  * ever concatenated or allocated per bigram.
  *
  * Bit-compatibility contract (TextAnalysisSpec): this equals the
  * built-in composition
  * `transform(bigrams, s -> aggregate(chars, 0, (acc, c) -> (acc*131 +
  * ascii(c)) % p) % b)` — which is what the DuckDB oracle replays with
  * `list_reduce`/`unicode` — on ALL text, not just ASCII: the byte fold
  * runs only when a same-scan check proves every byte is its own code
  * point, and any non-ASCII input dispatches to a decoded code-point
  * fold with identical arithmetic (ADVICE r14; see
  * [[BigramPolyBuckets.buckets]]).
  * The composition itself is a CodegenFallback higher-order chain
  * (interpreted per element, a string allocation per bigram: measured
  * ~6 s for t23's scan at sf0.1 where this kernel is ~0.1 s); this is
  * O(bytes) per document with no allocation beyond the output array. */
case class BigramPolyBuckets(child: Expression, p: Long, b: Int)
    extends UnaryExpression {

  require(p > 131, s"modulus must exceed the base, got $p")
  require(b >= 1, s"bucket count must be >= 1, got $b")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bigram_poly_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_poly_buckets requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new GenericArrayData(BigramPolyBuckets.buckets(s, p, b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = BigramPolyBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.buckets($c, ${p}L, $b));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramPolyBuckets {
  /** One bucket per adjacent word pair, in order (m-1 for m words; empty
    * if fewer than 2 words). `split(" ")` word semantics — empty segments
    * between consecutive spaces count as words, exactly as in
    * [[WordShingleHashes.hashes]]. Shared by interpreted eval and
    * generated code.
    *
    * The byte fold is the FAST PATH, taken only when every byte is ASCII
    * (checked in the same scan that counts the spaces — on ASCII each
    * byte IS its code point, so the fold equals the oracle's
    * per-character `unicode` fold). Any high byte routes to
    * [[bucketsCodePoints]], which folds decoded code points — the
    * oracle's semantics — so a multibyte corpus changes nothing about
    * cross-engine agreement instead of silently diverging (ADVICE r14:
    * the ASCII contract is now enforced by dispatch, not assumed). */
  def buckets(s: UTF8String, p: Long, nb: Int): Array[Int] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == 0x20) spaces += 1
      // dispatch on the FIRST high byte: the rest of the byte scan (and
      // its space count) is dead work once the document is known
      // multibyte — the code-point path re-splits from the decoded string
      if ((b & 0x80) != 0) return bucketsCodePoints(s.toString, p, nb)
      i += 1
    }
    val m = spaces + 1
    if (m < 2) return Array.emptyIntArray
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        ends(w) = i; w += 1; starts(w) = i + 1
      }
      i += 1
    }
    ends(w) = len
    val out = new Array[Int](m - 1)
    var j = 0
    while (j < m - 1) {
      var acc = 0L
      var k = starts(j)
      val e = ends(j + 1) // span covers "w_j<space>w_{j+1}" byte-exactly
      while (k < e) {
        acc = (acc * 131L +
          (org.apache.spark.unsafe.Platform.getByte(base, off + k) & 0xFF)) % p
        k += 1
      }
      out(j) = (acc % nb).toInt
      j += 1
    }
    out
  }

  /** The non-ASCII fallback: identical word split (on the space code
    * point) and identical polynomial fold, but over decoded Unicode code
    * points — exactly what the DuckDB oracle's `unicode` per-character
    * fold and the Spark `transform`+`aggregate` reference composition
    * compute. Max code point 0x10FFFF keeps acc·131 + cp < 2³¹ for the
    * catalog modulus, well inside Long regardless. */
  private def bucketsCodePoints(str: String, p: Long, nb: Int): Array[Int] = {
    val cps = str.codePoints().toArray
    val n = cps.length
    var spaces = 0
    var i = 0
    while (i < n) { if (cps(i) == 0x20) spaces += 1; i += 1 }
    val m = spaces + 1
    if (m < 2) return Array.emptyIntArray
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (cps(i) == 0x20) { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = n
    val out = new Array[Int](m - 1)
    var j = 0
    while (j < m - 1) {
      var acc = 0L
      var k = starts(j)
      val e = ends(j + 1) // span covers "w_j<space>w_{j+1}" exactly
      while (k < e) {
        acc = (acc * 131L + cps(k)) % p
        k += 1
      }
      out(j) = (acc % nb).toInt
      j += 1
    }
    out
  }
}

object TextHashFunctions {
  /** Column-API entry point: `rolling_hash($"text", 8)`. */
  def rolling_hash(c: Column, k: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), k))

  /** Column-API entry point: `sliding_min($"hashes", 4)`. */
  def sliding_min(c: Column, w: Int): Column =
    ColumnBridge.column(SlidingMin(ColumnBridge.expression(c), w))

  /** Column-API entry point: `word_shingle_hashes($"text", 3)`. */
  def word_shingle_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(c), n))

  /** Column-API entry point: `bigram_poly_buckets($"text", 1000003L, 512)`. */
  def bigram_poly_buckets(c: Column, p: Long, b: Int): Column =
    ColumnBridge.column(BigramPolyBuckets(ColumnBridge.expression(c), p, b))
}
