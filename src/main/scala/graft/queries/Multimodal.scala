package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * The harness has no real image/audio payloads (and this container has no
  * codec libraries), so media payloads are modeled the way a 100 TB
  * pipeline would model them anyway: an opaque `binary` column with typed
  * metadata alongside. Here the payload is deterministically synthesized
  * from `documents.text` (utf-8 bytes) so every byte-level result is
  * reproducible and DuckDB-checkable; the codec call itself is STUBBED
  * (see [[StubDecoder]]) while the Spark-side plumbing — schema, column
  * pruning, per-partition batch processing, typed output — is real.
  */
object Multimodal {

  /** m1 — typed metadata over an opaque binary column: byte length,
    * modality tag, content checksum. This is the catalog/manifest query a
    * media lakehouse runs constantly; everything pushes down to the scan
    * (one projection, no shuffle before the final sort). */
  def m1MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        // modality assignment is synthetic but deterministic
        element_at(typedlit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        length(payload).as("byte_len"),
        md5(payload).as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Input/output rows for the typed decode path. The payload column is
    * pruned to exactly (doc_id, payload) before deserialization. */
  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaFeat(doc_id: Long, width: Int, height: Int,
      n_frames: Int, sampled_frames: Int, top_bin: Int, intensity: Double)

  /** The stub standing in for a real codec. A production build would call
    * e.g. javax.imageio / ffmpeg bindings here and nothing outside this
    * object would change — the pipeline contract is bytes in, dims +
    * features out. Dims are derived deterministically from the payload;
    * the 16-bin byte histogram and mean intensity are REAL byte-level
    * computations (the shape of a thumbnail-histogram feature extractor).
    */
  private[graft] object StubDecoder {
    def decode(bytes: Array[Byte], hist: Array[Long]): MediaFeat = {
      java.util.Arrays.fill(hist, 0L)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      var top = 0
      var j = 1
      while (j < hist.length) { if (hist(j) > hist(top)) top = j; j += 1 }
      val nFrames = bytes.length / 100 + 1
      MediaFeat(
        doc_id = -1L, // filled by caller
        width = 64 + bytes.length % 64,
        height = 64 + (bytes.length / 64) % 64,
        n_frames = nFrames,
        sampled_frames = (nFrames + 9) / 10, // every-10th frame sampling
        top_bin = top,
        intensity =
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0)
    }
  }

  /** m2 — batched decode + feature extraction via `mapPartitions`: the
    * Scala analogue of a vectorized media UDF. One decoder state (the
    * histogram buffer) is allocated per PARTITION, not per row — the
    * batch shape that matters when the real codec carries expensive
    * native state. Runs embarrassingly parallel; output is per-doc typed
    * features. */
  def m2DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
    in.mapPartitions { rows =>
      val hist = new Array[Long](16) // per-partition decoder state
      rows.map { m =>
        StubDecoder.decode(m.payload, hist).copy(doc_id = m.doc_id)
      }
    }
      .toDF()
      .withColumn("intensity", round(col("intensity"), 4))
      .orderBy(col("doc_id"))
  }

  /** m2b — historically the oracle-checkable slice of the decode
    * pipeline (the d4b/t5b/x3b trick): of [[MediaFeat]]'s six features,
    * four are pure functions of the payload LENGTH ([[StubDecoder]]'s
    * dims/frame arithmetic), which DuckDB derives independently from
    * `octet_length`. Since r15 the FULL m2 row is oracle-gated too (the
    * hex trick — see [[oracleSql]]); m2b stays as the cheaper
    * length-only differential (bench-excluded, so it costs nothing) and
    * as the historical record of the two-tier gate. */
  def m2bDecodeDims(s: SparkSession, dir: String): DataFrame =
    m2DecodeFeatures(s, dir)
      .select(col("doc_id"), col("width"), col("height"),
        col("n_frames"), col("sampled_frames"))
      .orderBy(col("doc_id"))

  /** m3's frame geometry — shared with [[StubDecoder]]'s arithmetic
    * (`n_frames = len/100 + 1`, every-10th sampling) so the manifest,
    * the decode features and the frame sample agree on frame counts. */
  private val FrameBytes = 100
  private val FrameStride = 10

  /** m3 — deterministic frame sampling over the opaque binary payload:
    * treat the payload as fixed-[[FrameBytes]] frames, keep every
    * [[FrameStride]]-th, and emit each sampled frame's byte length and
    * content fingerprint. This is the codec-free half of video handling —
    * a real pipeline samples frames BEFORE decoding (seek offsets are
    * byte arithmetic), then hands only the sampled frames to the
    * expensive decoder (m2's seam). Everything here is scan-side codegen
    * (sequence + explode + substr + md5): no shuffle at all before the
    * final sort, and output volume is 1/[[FrameStride]] of the corpus —
    * the reduction that makes downstream feature extraction affordable
    * at 100 TB.
    *
    * Fingerprint contract: md5 over the LOWERCASE HEX of the frame bytes
    * (not the raw bytes) — DuckDB's md5 only accepts VARCHAR and its
    * substring cannot slice BLOBs, but `hex(blob)` is common ground, and
    * a byte slice is exactly a 2×-offset slice of the hex text. */
  def m3FrameSample(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    Tables.documents(s, dir)
      .select(col("doc_id"), payload.as("payload"),
        (floor(length(payload) / lit(FrameBytes.toDouble)) + 1)
          .cast("int").as("n_frames"))
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(FrameStride)))
          .as("frame_idx"))
      .withColumn("frame",
        col("payload").substr(
          col("frame_idx") * lit(FrameBytes) + 1, lit(FrameBytes)))
      .select(
        col("doc_id"), col("frame_idx"), col("n_frames"),
        length(col("frame")).as("frame_len"),
        md5(lower(hex(col("frame"))).cast("binary")).as("frame_fp"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** m5's fixed thumbnail edge (8×8 = 64 sampled bytes). */
  private val ThumbEdge = 8

  /** m5 — nearest-neighbor RESIZE to a fixed [[ThumbEdge]]² thumbnail:
    * the payload is addressed as the width×height byte grid the decode
    * seam reports ([[StubDecoder]]'s dims arithmetic), and each target
    * pixel (ty, tx) samples the source byte at
    * `((ty*height div 8)*width + (tx*width div 8)) mod len` — the
    * standard nearest-neighbor index map, wrapped mod len because the
    * synthetic grid is larger than the payload. This is the codec-free
    * shape of the resize every multimodal pipeline runs before feature
    * extraction: pure per-row byte addressing, done scan-side with a
    * statically unrolled 64-term projection (no higher-order-function
    * fallback, no shuffle before the final sort), output 64 bytes/doc
    * regardless of payload size — the downsample that makes downstream
    * vision models affordable at 100 TB.
    *
    * The engine samples single BYTES off the binary payload (substring
    * on binary is positional — O(1) per sample; character-indexed
    * substring over the payload's hex TEXT walks the string from the
    * start per sample, measured 5x slower on this projection) and hexes
    * each sampled byte; the hex-text output (byte i = hex chars
    * [2i+1, 2i+2]) is the same common-ground contract as m3, so DuckDB
    * replays the identical sampling off its hex text and the thumbnail
    * compares content-exact (hex + md5 fingerprint). */
  def m5ResizeThumb(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    // the thumb/md5 kernels sit ABOVE the presentation sort so the range
    // partitioner's sample pass only executes the bare scan (the t1
    // sample-pass rule, TextAnalysis.t1TokenCount)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), length(payload).as("len"))
      .filter(col("len") > 0)
      .orderBy(col("doc_id"))
      .select(col("doc_id"),
        expr("CAST(64 + pmod(len, 64) AS INT)").as("width"),
        expr("CAST(64 + pmod(len div 64, 64) AS INT)").as("height"),
        graft.functions.SketchFunctions.thumb_hex(col("text")).as("thumb_hex"))
      .withColumn("thumb_fp", md5(col("thumb_hex").cast("binary")))
  }

  /** The 64-term hex-concat composition [[graft.functions.ThumbHex]]
    * replaced — kept as the reference semantics for MultimodalSpec's
    * bit-compat pin (byte-addressed binary substrings, so equivalence
    * holds for ALL payloads, not only ASCII). */
  private[graft] def thumbHexComposed(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val n = ThumbEdge
    val terms = (0 until n * n).map { t =>
      val ty = t / n
      val tx = t % n
      s"lower(hex(substring(payload, pmod((($ty * height) div $n) * width + (($tx * width) div $n), len)+1, 1)))"
    }
    docs
      .select(col("doc_id"), payload.as("payload"),
        length(payload).as("len"))
      .filter(col("len") > 0)
      .withColumn("width", expr("CAST(64 + pmod(len, 64) AS INT)"))
      .withColumn("height", expr("CAST(64 + pmod(len div 64, 64) AS INT)"))
      .selectExpr("doc_id", s"concat(${terms.mkString(", ")}) AS thumb_hex")
  }

  /** m4 — modality alignment audit: FULL OUTER join of the text table
    * against the embedding table on id, profiled as a lang × label grid.
    * The join direction nobody writes until it bites: a pipeline that
    * embeds documents must prove every doc got a vector and every vector
    * still has a doc — orphans on either side surface here under
    * sentinel groups (`<no_doc>` / `<no_vec>`) instead of silently
    * vanishing through an inner join. One id-keyed shuffle join + one
    * grid aggregation; both sides prune to two columns at the scan. */
  def m4ModalityJoin(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    d.join(e, d("doc_id") === e("vec_id"), "full_outer")
      .groupBy(
        coalesce(col("lang"), lit("<no_doc>")).as("lang"),
        coalesce(col("label").cast("string"), lit("<no_vec>")).as("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("label"))
  }

  /** m6's chunk-bucket cap: a (chunk_idx, value) bucket above this size
    * produces no pairs — the d4/d5 skew insurance, mirrored EXACTLY in
    * the oracle (thumbnail bits over a synthetic corpus are correlated,
    * so hot buckets are expected, not an anomaly). */
  private[graft] val M6MaxBucket = 64

  /** m6's near-dup cutoff: pairs within this many differing aHash bits. */
  private val M6MaxHamming = 10

  /** m6 — perceptual-hash image near-dup: the multimodal rung of the
    * dedup ladder (d1-d5 dedup text and embeddings; scaled image corpora
    * dedup on a perceptual hash of the DECODED pixels, so re-encoded /
    * differently-compressed copies of one image still collide). The hash
    * is the classic 8×8 average-hash: m5's nearest-neighbor thumbnail
    * grid supplies 64 pixels (the sampled payload byte — the decode
    * seam's pixel read), and bit t is set iff pixel t exceeds the
    * thumbnail mean — computed integer-only as `px*64 > sum(px)`, no
    * division, by the scan-side [[graft.functions.AHashChunks]] codegen
    * kernel (O(64) byte reads per row; the unrolled substring
    * composition it replaced — kept as [[aHashChunksComposed]] for the
    * bit-compat pin — walks the string once per pixel, O(64·len)).
    * Candidates must share one of four 16-bit hash chunks
    * (d4's pigeonhole: guaranteed for Hamming <= 3 when no bucket
    * overflows [[M6MaxBucket]]); survivors rank by exact Hamming
    * distance over all 64 bits.
    *
    * Runs over the d4b-augmented corpus (every 50th doc replanted under
    * a shifted id — the harness corpus has no organic exact dups below
    * sf0.1), so Hamming-0 pairs exist at every SF and the check is
    * never vacuous. Everything — grid, bits, buckets, cap, cutoff — is
    * integer arithmetic the DuckDB oracle replays exactly.
    *
    * Scale shape: signature is scan-side projection; one shuffle on
    * (chunk_idx, value) with capped buckets, pairs expanded inside
    * groups via [[Dedup.pairCombos]] (never a self-join of the exploded
    * table); `distinct` + rank on the candidate set, which the cap keeps
    * linear-ish in the corpus. */
  /** The unrolled per-pixel SQL composition [[graft.functions.AHashChunks]]
    * replaced — kept as the reference semantics for MultimodalSpec's
    * bit-compat pin (each `substring` walks the string from the start,
    * so the composition is O(64·len) per row vs the kernel's O(64)). */
  private[graft] def aHashChunksComposed(docs: DataFrame): DataFrame = {
    val n = 8 // ThumbEdge: 8x8 aHash grid, 64 bits
    val pixExprs = (0 until n * n).map { t =>
      val ty = t / n
      val tx = t % n
      s"ascii(substring(text, pmod((($ty * height) div $n) * width + (($tx * width) div $n), len) + 1, 1))"
    }
    val chunkExprs = (0 until 4).map { c =>
      (0 until 16).map { j =>
        s"(CASE WHEN element_at(px, ${16 * c + j + 1}) * 64 > psum THEN ${1 << j} ELSE 0 END)"
      }.mkString("CAST(", " + ", " AS INT)")
    }
    docs
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") > 0)
      .withColumn("width", expr("CAST(64 + pmod(len, 64) AS INT)"))
      .withColumn("height", expr("CAST(64 + pmod(len div 64, 64) AS INT)"))
      .withColumn("px", expr(s"array(${pixExprs.mkString(", ")})"))
      .withColumn("psum", expr("aggregate(px, 0, (a, x) -> a + x)"))
      .select(col("doc_id") +:
        chunkExprs.zipWithIndex.map { case (e, c) => expr(e).as(s"c$c") }: _*)
  }

  def m6PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    // ahash_chunks is byte-addressed (UTF-8 numBytes) while the DuckDB
    // oracle and the composed-builtins spec reference are char-addressed
    // — equivalent ONLY on ASCII text (ADVICE r10). Assert that loudly on
    // the scan instead of letting a future multi-byte corpus desync the
    // engine and oracle silently: assert_true is non-foldable, so fusing
    // it into the text projection keeps it alive through optimization,
    // and it costs one octet/char length compare inside codegen.
    val asciiText = when(
      assert_true(octet_length(col("text")) === length(col("text")),
        concat(lit("m6: ahash_chunks is byte-addressed but doc_id="),
          col("doc_id"), lit(" has multi-byte UTF-8 text; "),
          lit("the char-addressed oracle would diverge"))).isNull,
      col("text"))
    val sig = Dedup.d4bAugmented(Tables.documents(s, dir))
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchFunctions.ahash_chunks(asciiText).as("ch"))
      .select(col("doc_id") +: (0 until 4).map(c =>
        element_at(col("ch"), c + 1).as(s"c$c")): _*)
    val chunks = sig.select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("chunk_idx", "chunk")))
    chunks.groupBy(col("chunk_idx"), col("chunk"))
      .agg(collect_list(struct(col("doc_id"), col("c0"), col("c1"),
        col("c2"), col("c3"))).as("ds"))
      .filter(size(col("ds")).between(2, M6MaxBucket))
      .select(explode(Dedup.pairCombos(col("ds"))).as("p"))
      .select(col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"),
        (bit_count(col("p.x.c0").bitwiseXOR(col("p.y.c0"))) +
         bit_count(col("p.x.c1").bitwiseXOR(col("p.y.c1"))) +
         bit_count(col("p.x.c2").bitwiseXOR(col("p.y.c2"))) +
         bit_count(col("p.x.c3").bitwiseXOR(col("p.y.c3")))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= M6MaxHamming)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** m7's window geometry: 50 16-bit samples (100 bytes) per energy
    * window — byte-aligned with [[FrameBytes]] so the audio windows and
    * m3's video frames tile the payload identically — and the peak
    * threshold under which a window counts as silence. */
  private val M7Win = graft.functions.PcmWindowStats.Win
  private val M7SilencePeak = 1024

  /** m7 — audio energy profile: the third modality's codec-free half.
    * The opaque payload is read as 16-bit little-endian PCM; per
    * [[M7Win]]-sample window this computes the integer energy
    * (Σ sample², exact), the RMS (one rounded sqrt at the end), the
    * peak |sample|, and a silence flag (peak < [[M7SilencePeak]]) — the
    * voice-activity-detection preprocessing an audio pipeline runs
    * BEFORE the expensive codec/ASR stage, so silent windows never cost
    * a decode (the same budget argument as m3's frame sampling).
    *
    * Byte access rides the m3/m5/m6 hex common ground: both engines
    * address `lower(hex(payload))` with identical substr/ascii
    * arithmetic (DuckDB's md5/substring cannot touch BLOBs), so every
    * sample value is bit-identical by construction. The per-window
    * lambda stack here is the documented decode SEAM (m2's contract):
    * a production build swaps it for a codec/kernel over the raw bytes
    * without touching the windowing geometry, the energy policy, or
    * anything downstream. Only FULL windows are scored (a trailing
    * partial window has no honest RMS denominator); docs shorter than
    * one window emit nothing, in both engines.
    *
    * The engine path runs the [[graft.functions.PcmWindowStats]] codegen
    * kernel — one O(bytes) pass per document emitting (win, energy,
    * peak) rows directly, with the RMS/silence policy applied on top.
    * [[m7AudioEnergyComposed]] keeps the built-ins-only hex composition
    * alive as the bit-compat reference (MultimodalSpec pins kernel ≡
    * composition on real payloads); the DuckDB oracle below runs the
    * composition's arithmetic, so the kernel stays differentially
    * checked end to end. */
  def m7AudioEnergy(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.SketchFunctions.pcm_window_stats(col("text")))
          .as("w"))
      .select(col("doc_id"), col("w.win").as("win"),
        col("w.energy").as("energy"),
        round(sqrt(col("w.energy").cast("double") / M7Win), 4).as("rms"),
        col("w.peak").as("peak"),
        (col("w.peak") < M7SilencePeak).as("is_silence"))
      .orderBy(col("doc_id"), col("win"))

  /** The built-ins-only formulation of m7 — the bit-compat reference the
    * [[graft.functions.PcmWindowStats]] kernel must match (and the shape
    * the DuckDB oracle runs). Kept linear: each exploded row carries only
    * its own window's hex slice, not the whole document. */
  def m7AudioEnergyComposed(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    // per-window arithmetic addresses the window's OWN 4*M7Win-char hex
    // slice (whx), not the whole-document string: carrying the full hx
    // into every exploded row made the operator O(doc_len * n_win) bytes
    // — quadratic in document length — which dominated the bench (51 s
    // at sf0.1) and drove the scale slope super-linear. The slice is cut
    // inside the window-generating transform, so each row holds exactly
    // one window of payload and the explode stays linear.
    def hv(pos: String) =
      s"(ascii(substr(whx, $pos, 1)) - (CASE WHEN substr(whx, $pos, 1) " +
        "BETWEEN '0' AND '9' THEN 48 ELSE 87 END))"
    val base = s"(k * 4)"
    val b0 = s"(${hv(s"$base + 1")} * 16 + ${hv(s"$base + 2")})"
    val b1 = s"(${hv(s"$base + 3")} * 16 + ${hv(s"$base + 4")})"
    val v0 = s"($b0 + 256 * $b1)"
    val v = s"(CASE WHEN $v0 >= 32768 THEN $v0 - 65536 ELSE $v0 END)"
    val winBytesHex = 4 * M7Win
    Tables.documents(s, dir)
      .select(col("doc_id"), lower(hex(payload)).as("hx"),
        expr(s"CAST((length(CAST(text AS BINARY)) div 2) div $M7Win AS BIGINT)")
          .as("n_win"))
      .filter(col("n_win") >= 1)
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0L, n_win - 1),
             |  w -> struct(w AS win,
             |    substr(hx, CAST(w * $winBytesHex + 1 AS INT),
             |           $winBytesHex) AS whx))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.win").as("win"), col("p.whx").as("whx"))
      .withColumn("vs",
        expr(s"transform(sequence(0, ${M7Win - 1}), k -> CAST($v AS BIGINT))"))
      .select(col("doc_id"), col("win"),
        expr("aggregate(vs, CAST(0 AS BIGINT), (a, x) -> a + x * x)")
          .as("energy"),
        expr("array_max(transform(vs, x -> abs(x)))").as("peak"))
      .withColumn("rms",
        round(sqrt(col("energy").cast("double") / M7Win), 4))
      .withColumn("is_silence", col("peak") < M7SilencePeak)
      .select(col("doc_id"), col("win"), col("energy"), col("rms"),
        col("peak"), col("is_silence"))
      .orderBy(col("doc_id"), col("win"))
  }

  // ---- m8: cross-video duplicated frame-run detection ---------------

  /** m8's frame geometry and plant rule. Frames are [[M8FrameBytes]]-char
    * consecutive windows (finer than m3's sampling grid — run detection
    * needs EVERY frame, and the harness texts are 48–553 chars); a run
    * must span ≥ [[M8MinRun]] consecutive duplicated frames. Every
    * [[M8Every]]-th doc re-enters under a shifted id with the SAME first
    * half and an UPPERCASED tail — the shared-intro/different-content
    * shape (trailers, syndicated openings) that makes the gate
    * non-vacuous on a corpus without organic cross-video frame overlap;
    * both halves are exact string arithmetic DuckDB replays verbatim. */
  private[graft] val M8FrameBytes = 32
  private[graft] val M8MinRun = 2
  private[graft] val M8IdShift = 30000000L
  private[graft] val M8Every = 25
  private[graft] def m8Augmented(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    val half = (len / 2).cast("int")
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % M8Every === 0)
        .select((col("doc_id") + M8IdShift).as("doc_id"),
          concat(col("text").substr(lit(1), half),
            upper(col("text").substr(half + 1, len))).as("text")))
  }

  /** m8 — duplicated FRAME-RUN detection across videos (d10's
    * exact-substring shape lifted to the frame axis): find maximal runs
    * of consecutive frames whose content recurs in another video — the
    * shared-intro/outro/credits detection a video-dedup pipeline runs
    * before paying per-frame decode or embedding cost for redundant
    * segments. A frame is "duplicated" when its content hash appears in
    * more than one distinct video (min≠max over ONE frame-key window —
    * no pair materialization), and runs are gaps-and-islands over each
    * video's duplicated frame indices.
    *
    * Scale shape: frames are hashed SCAN-side (md5 of the frame slice —
    * the payload itself never shuffles; what crosses the wire is
    * (doc_id, frame_idx, 16-byte key)); one frame-key window + one
    * doc_id islands window = two bounded shuffles, every group bounded
    * by either a frame key's occurrence count or one video's frame
    * count. Output is runs, ∝ shared segments, not frames. */
  def m8FrameRuns(s: SparkSession, dir: String): DataFrame = {
    val docs = m8Augmented(Tables.documents(s, dir))
    val len = length(col("text"))
    val frames = docs
      .select(col("doc_id"), col("text"),
        ceil(len / lit(M8FrameBytes.toDouble)).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("text"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(col("text")
          .substr(col("frame_idx") * M8FrameBytes + 1, lit(M8FrameBytes))
          .cast("binary")).as("fk"))
    val W = org.apache.spark.sql.expressions.Window
    val wk = W.partitionBy(col("fk"))
    val wDoc = W.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("dup",
        min(col("doc_id")).over(wk) =!= max(col("doc_id")).over(wk))
      .filter(col("dup"))
      .withColumn("grp", col("frame_idx") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame_idx")).as("run_start"),
        max(col("frame_idx")).as("run_end"),
        count(lit(1)).as("run_len"),
        min(col("n_frames")).as("n_frames"))
      .filter(col("run_len") >= M8MinRun)
      .select(col("doc_id"), col("run_start"), col("run_end"),
        col("run_len"), col("n_frames"))
      .orderBy(col("doc_id"), col("run_start"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m7_audio_energy"     -> m7AudioEnergy _,
    "m1_multimodal_meta"  -> m1MultimodalMeta _,
    "m2_decode_features"  -> m2DecodeFeatures _,
    "m2_decode_dims"      -> m2bDecodeDims _,
    "m3_frame_sample"     -> m3FrameSample _,
    "m4_modality_join"    -> m4ModalityJoin _,
    "m5_resize_thumb"     -> m5ResizeThumb _,
    "m6_phash_neardup"    -> m6PhashNearDup _,
    "m8_frame_runs"       -> m8FrameRuns _,
  )

  /** All nine entries fully oracle-checked since r15. m2 was the
    * long-documented rows-only seam ("byte-histogram output is
    * impractical to express in SQL") until the hex-common-ground trick
    * m5/m7 already used was applied to it (VERDICT r14 #6): every
    * payload byte is two hex chars, so the 16-bin histogram of b >> 4 is
    * exactly the histogram of the HIGH-nibble hex digits, and the byte
    * sum is 16·Σhigh + Σlow — both per-byte unnests DuckDB replays
    * digit-for-digit. The mapPartitions DECODE SEAM itself is unchanged
    * (that is m2's point — stub codec behind a real batch shape); what
    * flipped is that the stub's full output is now hash-gated, not just
    * its length-derived slice (m2b). */
  val oracleSql: Map[String, String] = Map(
    // m2: the full decode-feature row — dims from octet_length, top_bin
    // as the high-nibble histogram argmax (ties → LOWEST bin, the
    // first-max-wins loop in StubDecoder), intensity as one double
    // division chain over the exact integer byte sum
    "m2_decode_features" -> {
      def hv(pos: String) =
        s"(ascii(substr(hx, $pos, 1)) - (CASE WHEN substr(hx, $pos, 1) " +
          "BETWEEN '0' AND '9' THEN 48 ELSE 87 END))"
      s"""WITH p AS (
         |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
         |         octet_length(CAST(text AS BLOB)) AS len
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, len,
         |         ${hv("2 * t.i + 1")} AS hi,
         |         ${hv("2 * t.i + 2")} AS lo
         |  FROM p, unnest(range(len)) AS t(i)
         |), s AS (
         |  SELECT doc_id, CAST(sum(hi * 16 + lo) AS BIGINT) AS bsum
         |  FROM b GROUP BY doc_id
         |), bins AS (
         |  SELECT doc_id, hi AS bin, count(*) AS n FROM b GROUP BY 1, 2
         |), top AS (
         |  SELECT doc_id, bin AS top_bin FROM (
         |    SELECT doc_id, bin, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY n DESC, bin ASC) AS rn
         |    FROM bins)
         |  WHERE rn = 1
         |)
         |SELECT p.doc_id,
         |       64 + len % 64 AS width,
         |       64 + (len // 64) % 64 AS height,
         |       len // 100 + 1 AS n_frames,
         |       (len // 100 + 1 + 9) // 10 AS sampled_frames,
         |       coalesce(top_bin, 0) AS top_bin,
         |       CASE WHEN len = 0 THEN 0.0
         |            ELSE round(CAST(bsum AS DOUBLE) / len / 255.0, 4) END
         |         AS intensity
         |FROM p LEFT JOIN s USING (doc_id) LEFT JOIN top USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // m8: the planted augmentation (exact halves arithmetic), per-frame
    // md5 keys, min<>max dup flag over the frame-key partition,
    // gaps-and-islands runs — replayed end to end
    "m8_frame_runs" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $M8IdShift,
         |         substr(text, 1, CAST(floor(length(text) / 2) AS INT))
         |           || upper(substr(text,
         |                CAST(floor(length(text) / 2) AS INT) + 1))
         |  FROM documents WHERE doc_id % $M8Every = 0
         |),
         |p AS (
         |  SELECT doc_id, text,
         |         CAST(ceil(length(text) / $M8FrameBytes.0) AS INT)
         |           AS n_frames
         |  FROM aug
         |),
         |frames AS (
         |  SELECT doc_id, n_frames,
         |         unnest(generate_series(0, n_frames - 1)) AS frame_idx,
         |         text
         |  FROM p
         |),
         |keyed AS (
         |  SELECT doc_id, n_frames, frame_idx,
         |         md5(substr(text, frame_idx * $M8FrameBytes + 1,
         |                    $M8FrameBytes)) AS fk
         |  FROM frames
         |),
         |flagged AS (
         |  SELECT *,
         |         min(doc_id) OVER (PARTITION BY fk)
         |           <> max(doc_id) OVER (PARTITION BY fk) AS dup
         |  FROM keyed
         |),
         |runs AS (
         |  SELECT doc_id, n_frames, frame_idx,
         |         frame_idx - row_number() OVER (
         |           PARTITION BY doc_id ORDER BY frame_idx) AS grp
         |  FROM flagged WHERE dup
         |)
         |SELECT doc_id, min(frame_idx) AS run_start,
         |       max(frame_idx) AS run_end,
         |       count(*) AS run_len, min(n_frames) AS n_frames
         |FROM runs GROUP BY doc_id, grp
         |HAVING count(*) >= $M8MinRun
         |ORDER BY doc_id, run_start""".stripMargin,
    // m7: the identical substr/ascii sample arithmetic over the same
    // lowercase-hex common ground, exact integer energy, one rounded
    // sqrt — a sample-decode bug, a sign error on values >= 0x8000, a
    // window misalignment or a flipped silence threshold shifts a value
    // and hash-mismatches
    "m7_audio_energy" -> {
      def hv(pos: String) =
        s"(ascii(substr(hx, $pos, 1)) - (CASE WHEN substr(hx, $pos, 1) " +
          "BETWEEN '0' AND '9' THEN 48 ELSE 87 END))"
      val base = s"(win * $M7Win + k) * 4"
      val b0 = s"(${hv(s"$base + 1")} * 16 + ${hv(s"$base + 2")})"
      val b1 = s"(${hv(s"$base + 3")} * 16 + ${hv(s"$base + 4")})"
      val v0 = s"($b0 + 256 * $b1)"
      val v = s"(CASE WHEN $v0 >= 32768 THEN $v0 - 65536 ELSE $v0 END)"
      s"""WITH p AS (
         |  SELECT doc_id, lower(hex(text)) AS hx,
         |         (octet_length(CAST(text AS BLOB)) // 2) // $M7Win AS n_win
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, hx, t.win
         |  FROM p, unnest(range(n_win)) AS t(win)
         |  WHERE n_win >= 1
         |), vs AS (
         |  SELECT doc_id, win,
         |         list_transform(range(0, $M7Win),
         |           k -> CAST($v AS BIGINT)) AS samples
         |  FROM w
         |)
         |SELECT doc_id, win,
         |       CAST(list_sum(list_transform(samples, x -> x * x))
         |            AS BIGINT) AS energy,
         |       round(sqrt(CAST(list_sum(list_transform(samples, x -> x * x))
         |            AS DOUBLE) / $M7Win), 4) AS rms,
         |       CAST(list_max(list_transform(samples, x -> abs(x)))
         |            AS BIGINT) AS peak,
         |       list_max(list_transform(samples, x -> abs(x)))
         |         < $M7SilencePeak AS is_silence
         |FROM vs
         |ORDER BY doc_id, win""".stripMargin
    },
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |       ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
        |       octet_length(CAST(text AS BLOB)) AS byte_len,
        |       md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mirrors StubDecoder.decode's length-derived arithmetic exactly:
    // width = 64 + len%64, height = 64 + (len/64)%64, n_frames = len/100+1,
    // sampled_frames = every-10th-frame rounding up
    "m2_decode_dims" ->
      """WITH p AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS len FROM documents
        |)
        |SELECT doc_id,
        |       64 + len % 64 AS width,
        |       64 + (len // 64) % 64 AS height,
        |       len // 100 + 1 AS n_frames,
        |       (len // 100 + 1 + 9) // 10 AS sampled_frames
        |FROM p ORDER BY doc_id""".stripMargin,
    // byte slice [i, i+100) of the payload == hex-char slice
    // [2i, 2i+200) of hex(payload); md5 is over the lowercase hex text
    // (the engine applies the identical contract)
    "m3_frame_sample" -> {
      val hexBytes = 2 * FrameBytes
      s"""WITH p AS (
         |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
         |         CAST(floor(octet_length(CAST(text AS BLOB)) / $FrameBytes.0)
         |              AS INT) + 1 AS n_frames
         |  FROM documents
         |),
         |fr AS (
         |  SELECT doc_id, hx, n_frames,
         |         unnest(generate_series(0, n_frames - 1, $FrameStride))
         |           AS frame_idx
         |  FROM p
         |)
         |SELECT doc_id, frame_idx, n_frames,
         |       CAST(len(substr(hx, frame_idx * $hexBytes + 1, $hexBytes)) / 2
         |            AS INT) AS frame_len,
         |       md5(lower(substr(hx, frame_idx * $hexBytes + 1, $hexBytes)))
         |         AS frame_fp
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
    },
    "m4_modality_join" ->
      """SELECT coalesce(d.lang, '<no_doc>') AS lang,
        |       coalesce(CAST(e.label AS VARCHAR), '<no_vec>') AS label,
        |       count(*) AS n
        |FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the identical statically-unrolled nearest-neighbor index map over
    // the lowercase-hex payload (byte i = hex chars [2i+1, 2i+2])
    "m5_resize_thumb" -> {
      val n = ThumbEdge
      val terms = (0 until n * n).map { t =>
        val ty = t / n
        val tx = t % n
        s"substr(hx, 2*(((($ty * height) // $n) * width + (($tx * width) // $n)) % len)+1, 2)"
      }
      s"""WITH p AS (
         |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
         |         octet_length(CAST(text AS BLOB)) AS len
         |  FROM documents
         |  WHERE octet_length(CAST(text AS BLOB)) > 0
         |),
         |g AS (
         |  SELECT doc_id, hx, len,
         |         64 + len % 64 AS width,
         |         64 + (len // 64) % 64 AS height
         |  FROM p
         |),
         |t AS (
         |  SELECT doc_id, width, height,
         |         ${terms.mkString(" || ")} AS thumb_hex
         |  FROM g
         |)
         |SELECT doc_id, width, height, thumb_hex, md5(thumb_hex) AS thumb_fp
         |FROM t ORDER BY doc_id""".stripMargin
    },
    // full replay of the aHash pipeline: same d4b planting, same m5
    // nearest-neighbor grid (t = 8*ty+tx row-major), same integer
    // bit rule px*64 > sum, same chunk buckets, cap and cutoff. The
    // candidate join is a plain self-join here (oracle clarity); the
    // engine expands pairs inside collect_list groups instead.
    "m6_phash_neardup" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${Dedup.D4bIdShift} AS doc_id, text
         |  FROM documents WHERE doc_id % ${Dedup.D4bEvery} = 0
         |), p AS (
         |  SELECT doc_id, text, length(text) AS len,
         |         64 + length(text) % 64 AS width,
         |         64 + (length(text) // 64) % 64 AS height
         |  FROM aug WHERE length(text) > 0
         |), px AS (
         |  SELECT doc_id,
         |         list_transform(range(64), t ->
         |           ascii(substr(text, CAST(
         |             ((((t // 8) * height) // 8) * width
         |              + (((t % 8) * width) // 8)) % len + 1 AS BIGINT), 1)))
         |           AS px
         |  FROM p
         |), sig AS (
         |  SELECT doc_id,
         |         list_sum(list_transform(range(16), j -> CASE
         |           WHEN px[j + 1] * 64 > list_sum(px) THEN 1 << j
         |           ELSE 0 END)) AS c0,
         |         list_sum(list_transform(range(16), j -> CASE
         |           WHEN px[j + 17] * 64 > list_sum(px) THEN 1 << j
         |           ELSE 0 END)) AS c1,
         |         list_sum(list_transform(range(16), j -> CASE
         |           WHEN px[j + 33] * 64 > list_sum(px) THEN 1 << j
         |           ELSE 0 END)) AS c2,
         |         list_sum(list_transform(range(16), j -> CASE
         |           WHEN px[j + 49] * 64 > list_sum(px) THEN 1 << j
         |           ELSE 0 END)) AS c3
         |  FROM px
         |), chunks AS (
         |  SELECT doc_id, c0, c1, c2, c3, i AS chunk_idx,
         |         [c0, c1, c2, c3][i + 1] AS chunk
         |  FROM sig, unnest(range(4)) AS t(i)
         |), buck AS (
         |  SELECT chunk_idx, chunk FROM chunks
         |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $M6MaxBucket
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(bit_count(CAST(xor(a.c0, b.c0) AS BIGINT))
         |            + bit_count(CAST(xor(a.c1, b.c1) AS BIGINT))
         |            + bit_count(CAST(xor(a.c2, b.c2) AS BIGINT))
         |            + bit_count(CAST(xor(a.c3, b.c3) AS BIGINT)) AS INT)
         |           AS hamming
         |  FROM chunks a
         |  JOIN buck k ON k.chunk_idx = a.chunk_idx AND k.chunk = a.chunk
         |  JOIN chunks b ON b.chunk_idx = a.chunk_idx AND b.chunk = a.chunk
         |   AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 10
         |ORDER BY hamming, doc_a, doc_b LIMIT 20""".stripMargin,
  )
}
