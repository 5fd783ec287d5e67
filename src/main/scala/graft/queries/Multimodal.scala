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

  /** m2b — the oracle-checkable slice of the decode pipeline (the
    * d4b/t5b/x3b trick): of [[MediaFeat]]'s six features, four are pure
    * functions of the payload LENGTH ([[StubDecoder]]'s dims/frame
    * arithmetic), which DuckDB derives independently from `octet_length`.
    * The slice runs the REAL `mapPartitions` decode path — a decoder that
    * drops rows, scrambles doc_ids, or miscomputes the dims arithmetic
    * hash-mismatches the oracle. Only `top_bin`/`intensity` (byte-content
    * aggregates with no SQL equivalent) stay spec-covered in
    * MultimodalSpec. */
  def m2bDecodeDims(s: SparkSession, dir: String): DataFrame =
    m2DecodeFeatures(s, dir)
      .select(col("doc_id"), col("width"), col("height"),
        col("n_frames"), col("sampled_frames"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta"  -> m1MultimodalMeta _,
    "m2_decode_features"  -> m2DecodeFeatures _,
    "m2_decode_dims"      -> m2bDecodeDims _,
  )

  /** m2's byte-histogram output is impractical to express in SQL → rows-
    * only gate + MultimodalSpec + the m2b differential slice; m1 is fully
    * oracle-checked (byte length, modality tag and md5 all have exact
    * DuckDB equivalents). */
  val oracleSql: Map[String, String] = Map(
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
  )
}
