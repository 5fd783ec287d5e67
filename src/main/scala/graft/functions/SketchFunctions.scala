package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side MinHash signature: the 64 permutation minima of a shingle-
  * hash array in ONE pass, as a native codegen expression.
  *
  * Bit-compatibility contract (pinned in DedupSpec): element i equals
  * `min(pmod(pmod(h, P) * a_i + b_i, P))` over the array's elements —
  * exactly the per-group aggregate composition it replaces. The
  * coefficients are the fixed-seed permutation set shared with the
  * dedup pipeline ([[MinHashSig.HashA]]/[[MinHashSig.HashB]]).
  *
  * Why it exists: the aggregate formulation explodes every shingle into
  * a row and runs 64 `min` aggregate columns (plus a `collect_set`,
  * which forces ObjectHashAggregate) over the exploded table — per-row
  * aggregation machinery around 64 multiplications per shingle. At
  * 100 TB the exploded table is trillions of rows of aggregate-buffer
  * traffic; this kernel does the same 64 multiplications per shingle in
  * a tight JIT loop at the scan, so the downstream group-by only
  * carries one 512-byte signature per document. Empty input yields an
  * empty array (docs too short to shingle are filtered before grouping,
  * matching the explode path where they simply produce no rows).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> without null elements, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    new GenericArrayData(MinHashSig.sig(arr.toLongArray()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.sig($c.toLongArray()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val NumHashes = 64

  /** 31-bit Mersenne prime: keeps `a*(h mod P)+b <= 2^62` in plain Long
    * arithmetic (Spark 4 runs ANSI mode — overflow would throw in the
    * aggregate formulation this kernel must match). */
  val P = 2147483647L

  /** Deterministic permutation coefficients, fixed seed — results must
    * be reproducible run-over-run for the differential oracle. (One
    * sequential Random(42): a-draws first, then b-draws.) */
  val (hashA: Array[Long], hashB: Array[Long]) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue - 1).toLong + 1L),
     Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** The 64 permutation minima of `hs` (empty in → empty out). Shared by
    * interpreted eval and generated code. */
  def sig(hs: Array[Long]): Array[Long] = {
    if (hs.isEmpty) return Array.emptyLongArray
    val out = new Array[Long](NumHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      var hb = hs(j) % P
      if (hb < 0) hb += P // pmod semantics for negative hashes
      var i = 0
      while (i < NumHashes) {
        val v = (hb * hashA(i) + hashB(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    out
  }
}

/** Scan-side 64-bit SimHash fingerprint of a text in ONE pass, as a
  * native codegen expression.
  *
  * Bit-compatibility contract (pinned in DedupSpec): equals the
  * aggregate composition it replaces — `split(text, " ")` (EMPTY words
  * included, exactly Spark's split semantics), `xxhash64(word)` per
  * occurrence (term-frequency weighted, not distinct), per-bit counter
  * `+1` if the hash's bit is set else `-1`, fingerprint bit set iff the
  * counter is strictly positive. Word spans are hashed in place with
  * Spark's own XXH64 (seed 42) — word boundaries are single 0x20 bytes,
  * so no word string is ever materialized (same span trick as
  * [[WordShingleHashes]]).
  *
  * Replaces an explode of every WORD into a row followed by 64
  * conditional-sum aggregate columns per text group — the same
  * row-machinery-around-a-tight-loop argument as [[MinHashSig]], and
  * the fingerprint of a duplicate group equals any member's fingerprint
  * (group sums are member sums scaled by a positive count, which cannot
  * change a sign), so the collapse grouping only needs `first(fp)`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.fingerprint($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Term-frequency-weighted 64-bit SimHash of `s` (see class doc for
    * the exact contract). Shared by interpreted eval and generated code. */
  def fingerprint(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val counts = new Array[Int](64)
    var wordStart = 0
    var i = 0
    while (i <= len) {
      val atSpace = i < len &&
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20
      if (atSpace || i == len) {
        // the span [wordStart, i) is one word (possibly empty — split
        // keeps empty segments around consecutive/leading/trailing spaces)
        val h = XXH64.hashUnsafeBytes(base, off + wordStart, i - wordStart, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        wordStart = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** Scan-side 8×8 average-hash chunks of a payload's byte stream: the
  * four 16-bit aHash chunks m6's perceptual dedup blocks on, in ONE
  * O(64) pass — 64 random byte reads off the m5 nearest-neighbor grid,
  * one integer mean comparison per pixel, no substring materialization.
  *
  * Bit-compatibility contract (pinned in MultimodalSpec): on ASCII
  * payloads, element c equals the unrolled
  * `ascii(substring(text, pmod(idx, len)+1, 1))`-per-pixel composition
  * it replaces (byte value == code point for ASCII — the multimodal
  * payload contract, where the column is really bytes; the composition
  * walks the string once PER PIXEL because UTF8String substring is
  * O(position), making it O(64·len) per row vs this kernel's O(64)).
  * Geometry is m5's: width = 64 + len%64, height = 64 + (len/64)%64,
  * pixel t reads byte ((ty·height/8)·width + (tx·width/8)) mod len.
  * Empty input yields an empty array (m6 filters len > 0 first). */
case class AHashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "ahash_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ahash_chunks requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(AHashChunks.chunks(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = AHashChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.chunks($c));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHashChunks {
  /** The four 16-bit aHash chunks of `s` (empty in → empty out). Shared
    * by interpreted eval and generated code. */
  def chunks(s: UTF8String): Array[Int] = {
    val len = s.numBytes
    if (len == 0) return Array.emptyIntArray
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val width = 64 + len % 64
    val height = 64 + (len / 64) % 64
    val px = new Array[Int](64)
    var sum = 0L
    var t = 0
    while (t < 64) {
      val ty = t / 8
      val tx = t % 8
      val idx = (ty * height / 8) * width + (tx * width / 8)
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + idx % len)
      px(t) = b & 0xFF
      sum += px(t)
      t += 1
    }
    val out = new Array[Int](4)
    var c = 0
    while (c < 4) {
      var bits = 0
      var j = 0
      while (j < 16) {
        if (px(16 * c + j) * 64L > sum) bits |= 1 << j
        j += 1
      }
      out(c) = bits
      c += 1
    }
    out
  }
}

/** Scan-side 8×8 nearest-neighbor thumbnail as lowercase hex (m5's
  * output contract): the 64 sampled payload bytes of the m5 grid,
  * hex-encoded into one 128-char string in a single O(64) pass.
  * Replaces the 64-term `lower(hex(substring(payload, …, 1)))` concat
  * composition (kept as `Multimodal.thumbHexComposed` for the
  * bit-compat pin) — same bytes for ALL inputs, since both sides are
  * byte-addressed (the composition slices the binary payload, this
  * kernel reads the UTF8String's bytes, and a string's UTF-8 bytes ARE
  * its binary cast). Empty input yields an empty string (m5 filters
  * len > 0 first). */
case class ThumbHex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "thumb_hex"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"thumb_hex requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    ThumbHex.thumb(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = ThumbHex.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.thumb($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ThumbHex {
  private val HexDigits = "0123456789abcdef".getBytes

  /** 128-char lowercase hex of the 64 m5-grid bytes (empty in → empty
    * out). Shared by interpreted eval and generated code. */
  def thumb(s: UTF8String): UTF8String = {
    val len = s.numBytes
    if (len == 0) return UTF8String.EMPTY_UTF8
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val width = 64 + len % 64
    val height = 64 + (len / 64) % 64
    val out = new Array[Byte](128)
    var t = 0
    while (t < 64) {
      val ty = t / 8
      val tx = t % 8
      val idx = (ty * height / 8) * width + (tx * width / 8)
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + idx % len) & 0xFF
      out(2 * t) = HexDigits(b >> 4)
      out(2 * t + 1) = HexDigits(b & 0xF)
      t += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Scan-side PCM window statistics: per [[PcmWindowStats.Win]]-sample
  * window of the payload read as 16-bit little-endian PCM, the window
  * index, exact integer energy (Σ sample²) and peak |sample|, in ONE
  * O(bytes) pass over the string's UTF-8 bytes.
  *
  * Bit-compatibility contract (pinned in MultimodalSpec): equals the
  * hex-composition it replaces ([[graft.queries.Multimodal
  * .m7AudioEnergyComposed]]) — `lower(hex(CAST(text AS BINARY)))`
  * addressed 4 chars per sample with substr/ascii arithmetic. A
  * string's UTF-8 bytes ARE its binary cast, so reading byte pairs
  * directly decodes the identical sample values.
  *
  * Why it exists: the composition expands to ~16 interpreted `substr`
  * calls per sample inside a non-codegen higher-order `transform` —
  * 21 s at sf0.1 for 625k samples, 10× slower than DuckDB on the same
  * arithmetic. This kernel is the m2 decode-seam contract in codegen
  * form: a production build swaps the sample loop for a codec without
  * touching windowing geometry or anything downstream. Only FULL
  * windows are scored; docs shorter than one window yield an empty
  * array (explode then emits nothing, matching both engines). */
case class PcmWindowStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("win", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("energy", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("peak", LongType,
        nullable = false))), containsNull = false)
  override def prettyName: String = "pcm_window_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_window_stats requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    PcmWindowStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = PcmWindowStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.stats($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmWindowStats {
  /** Samples per energy window — byte-aligned with the multimodal
    * FrameBytes geometry (50 samples × 2 bytes = 100 bytes); the single
    * source of truth for m7's window size. */
  val Win = 50

  /** Per-window (win, energy, peak) rows (shorter-than-one-window in →
    * empty out). Shared by interpreted eval and generated code. */
  def stats(s: UTF8String): GenericArrayData = {
    val len = s.numBytes
    val nWin = (len / 2) / Win
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val rows = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      var energy = 0L
      var peak = 0L
      var k = 0
      while (k < Win) {
        val i = (w * Win + k) * 2
        val b0 = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
        val b1 = org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0xFF
        var v = b0 + 256 * b1
        if (v >= 32768) v -= 65536
        energy += v.toLong * v
        val a = if (v < 0) -v.toLong else v.toLong
        if (a > peak) peak = a
        k += 1
      }
      rows(w) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](w.toLong, energy, peak))
      w += 1
    }
    new GenericArrayData(rows)
  }
}

object SketchFunctions {
  /** Column-API entry point: `minhash_sig($"shingle_hashes")`. */
  def minhash_sig(c: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))

  /** Column-API entry point: `simhash64($"text")`. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** Column-API entry point: `ahash_chunks($"text")`. */
  def ahash_chunks(c: Column): Column =
    ColumnBridge.column(AHashChunks(ColumnBridge.expression(c)))

  /** Column-API entry point: `thumb_hex($"text")`. */
  def thumb_hex(c: Column): Column =
    ColumnBridge.column(ThumbHex(ColumnBridge.expression(c)))

  /** Column-API entry point: `pcm_window_stats($"text")`. */
  def pcm_window_stats(c: Column): Column =
    ColumnBridge.column(PcmWindowStats(ColumnBridge.expression(c)))
}
