package graft

import graft.queries.Multimodal
import graft.queries.Multimodal.StubDecoder

class MultimodalSpec extends SparkSpec {

  test("stub decoder: deterministic dims, histogram argmax, intensity") {
    val hist = new Array[Long](16)
    val bytes = "aaaaAAAA".getBytes("UTF-8") // 'a'=0x61 bin 6, 'A'=0x41 bin 4
    val f = StubDecoder.decode(bytes, hist)
    assert(f.width == 64 + 8 && f.height == 64)
    assert(f.n_frames == 1 && f.sampled_frames == 1)
    assert(f.top_bin == 4 || f.top_bin == 6) // 4 each; argmax keeps first max
    assert(f.top_bin == 4)                   // bin 4 seen first in scan order
    val expected = (0x61 * 4 + 0x41 * 4).toDouble / 8 / 255.0
    assert(math.abs(f.intensity - expected) < 1e-12)
    // empty payload is safe
    val empty = StubDecoder.decode(Array.empty[Byte], hist)
    assert(empty.intensity == 0.0 && empty.n_frames == 1)
  }

  test("m1 metadata: modality cycle, byte lengths match n_chars (ascii corpus)") {
    val rows = Multimodal.m1MultimodalMeta(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mt = r.getAs[String]("media_type")
      assert(mt == Seq("image", "audio", "video")((id % 3).toInt))
      assert(r.getAs[String]("checksum").matches("[0-9a-f]{32}"))
      assert(r.getAs[Int]("byte_len") > 0)
    }
  }

  test("m2 decode features: one row per doc, bounded intensity, " +
       "frame sampling is ceil(n/10)") {
    val rows = Multimodal.m2DecodeFeatures(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val i = r.getAs[Double]("intensity")
      assert(i > 0.0 && i < 1.0) // ascii text bytes
      val n = r.getAs[Int]("n_frames")
      assert(r.getAs[Int]("sampled_frames") == (n + 9) / 10)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 128)
    }
  }

  test("m3 frame sample: per-doc sample count == m2's sampled_frames; " +
       "frame bytes and fingerprints exact on a planted payload") {
    val rows = Multimodal.m3FrameSample(spark, sfDir).collect()
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).map {
      case (id, rs) => id -> rs.length
    }
    val m2 = Multimodal.m2DecodeFeatures(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("sampled_frames")).toMap
    assert(perDoc == m2) // identical frame geometry across the m-family
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 10 == 0)
      assert(r.getAs[Int]("frame_len") <= 100)
      assert(r.getAs[String]("frame_fp").matches("[0-9a-f]{32}"))
    }
    // planted 1050-byte payload: frames 0..10, sampled {0, 10}; frame 10
    // holds the last 50 bytes; fingerprint = md5(lowercase hex of slice)
    import spark.implicits._
    val text = ("x" * 1000) + ("y" * 50)
    val dir = java.nio.file.Files.createTempDirectory("graft-m3").toString
    Seq((7L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val planted = Multimodal.m3FrameSample(spark, dir).collect()
    assert(planted.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 10))
    assert(planted.map(_.getAs[Int]("frame_len")).toSeq == Seq(100, 50))
    def fp(slice: String): String = {
      val hex = slice.getBytes("UTF-8").map("%02x".format(_)).mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(planted(0).getAs[String]("frame_fp") == fp("x" * 100))
    assert(planted(1).getAs[String]("frame_fp") == fp("y" * 50))
  }

  test("m5 resize: 8x8 thumbnail is 64 bytes of hex for every doc, dims " +
       "match m2's, and the sampling map is exact on a planted payload") {
    val rows = Multimodal.m5ResizeThumb(spark, sfDir).collect()
    val m2 = Multimodal.m2DecodeFeatures(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("thumb_hex").length == 128) // 64 bytes
      assert(r.getAs[String]("thumb_hex").matches("[0-9a-f]{128}"))
      assert(r.getAs[String]("thumb_fp").matches("[0-9a-f]{32}"))
      // the resize addresses the same width x height grid m2 reports
      assert(m2(r.getAs[Long]("doc_id")) ==
        (r.getAs[Int]("width"), r.getAs[Int]("height")))
    }
    // planted 64-byte payload: width = 64 + 64%64 = 64, height = 64 + 1%64
    // = 65; target (ty,tx) samples byte ((ty*65 div 8)*64 + (tx*64 div 8))
    // % 64 — replay the index map in plain Scala and compare content
    import spark.implicits._
    val text = ('a' to 'z').mkString * 2 ++ "abcdefghijkl" // 64 ascii bytes
    assert(text.length == 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-m5").toString
    Seq((3L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val planted = Multimodal.m5ResizeThumb(spark, dir).collect()
    assert(planted.length == 1)
    val bytes = text.getBytes("UTF-8")
    val expected = (0 until 64).map { t =>
      val ty = t / 8; val tx = t % 8
      val i = ((ty * 65 / 8) * 64 + (tx * 64 / 8)) % 64
      "%02x".format(bytes(i))
    }.mkString
    assert(planted(0).getAs[String]("thumb_hex") == expected)
  }

  test("m4 modality join: orphans on either side surface under sentinel " +
       "groups; matched rows land in the lang x label grid") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-m4").toString
    Seq((1L, "t", "en", "s0", 1L), (2L, "t", "de", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((2L, Array(0.1f), 7), (3L, Array(0.2f), 7))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Multimodal.m4ModalityJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("<no_doc>", "7", 1L),   // vec 3 lost its document
      ("de", "7", 1L),         // doc 2 <-> vec 2
      ("en", "<no_vec>", 1L))) // doc 1 was never embedded
  }

  test("ahash_chunks == the unrolled ascii-substring composition, " +
       "chunk for chunk, on the whole (ASCII) corpus + planted edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    // edge lengths: 1 byte, exactly 64, one under/over a 64 boundary
    val planted = Seq(
      (90001L, "x"), (90002L, "ab" * 32), (90003L, "q" * 63),
      (90004L, "z" * 65), (90005L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = corpus.unionByName(planted)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val kernel = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchFunctions.ahash_chunks(col("text")).as("ch"))
    val composed = Multimodal.aHashChunksComposed(docs)
      .select(col("doc_id"), array(col("c0"), col("c1"), col("c2"),
        col("c3")).as("ch"))
    val diff = kernel.as("k").join(composed.as("m"), "doc_id")
      .filter(col("k.ch") =!= col("m.ch"))
    assert(diff.count() == 0, s"kernel/composition mismatch:\n${diff.take(5).mkString("\n")}")
    assert(kernel.count() == composed.count())
  }

  test("m6 raises loudly on multi-byte text (the byte- vs char-addressed " +
       "oracle divergence must not be silent)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-m6g").toString
    Seq((1L, "plain ascii text"), (2L, "日本語のテキスト"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("ja")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      Multimodal.m6PhashNearDup(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.contains("byte-addressed") && m.contains("doc_id=2")),
      s"expected the m6 ascii guard to name doc 2, got: ${msgs(e)}")
  }

  test("thumb_hex == the 64-term hex-concat composition on the corpus " +
       "+ planted length edges (byte-addressed: holds for all payloads)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planted = Seq(
      (90001L, "x"), (90002L, "ab" * 32), (90003L, "q" * 63),
      (90004L, "z" * 65))
      .toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").unionByName(planted)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val kernel = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchFunctions.thumb_hex(col("text")).as("th"))
    val diff = kernel.as("k")
      .join(Multimodal.thumbHexComposed(docs).as("m"), "doc_id")
      .filter(col("k.th") =!= col("m.thumb_hex"))
    assert(diff.count() == 0,
      s"kernel/composition mismatch:\n${diff.take(3).mkString("\n")}")
  }

  test("m6 phash near-dup: identical payloads pair at hamming 0 (planted " +
       "dir and the d4b replant); distances bounded and sorted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-m6").toString
    // doc 0 is replanted by the d4b augmentation (0 % 50 == 0); docs 1,2
    // share a payload; 3 is unrelated
    Seq(
      (0L, "alpha beta gamma delta", "en", "s0", 22L),
      (1L, (1 to 40).map(i => s"q$i").mkString(" "), "en", "s0", 1L),
      (2L, (1 to 40).map(i => s"q$i").mkString(" "), "en", "s0", 1L),
      (3L, (1 to 40).map(i => s"z$i").reverse.mkString(" "), "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Multimodal.m6PhashNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.contains((0L, 10000000L, 0)), s"replanted pair missing: ${out.toSeq}")
    assert(out.contains((1L, 2L, 0)), s"identical-payload pair missing: ${out.toSeq}")
    out.foreach { case (_, _, h) => assert(h >= 0 && h <= 10) }
  }

  test("m6 on the corpus: output sorted by distance, shifted-id pairs are " +
       "exactly the planted duplicates at hamming 0") {
    val out = Multimodal.m6PhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty && out.length <= 20)
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(identity).toSeq)
    val planted = out.filter(p => p._2 == p._1 + 10000000L)
    assert(planted.nonEmpty, "no planted duplicate pair surfaced")
    planted.foreach { case (a, _, h) =>
      assert(a % 50 == 0 && h == 0, s"bad planted pair ($a, $h)")
    }
  }

  test("m7 kernel == the hex substr/ascii composition on the corpus " +
       "(every window row identical: energy, rms, peak, silence flag)") {
    import org.apache.spark.sql.functions._
    val kernel = Multimodal.m7AudioEnergy(spark, sfDir)
    val composed = Multimodal.m7AudioEnergyComposed(spark, sfDir)
    assert(kernel.count() == composed.count())
    val diff = kernel.as("k")
      .join(composed.as("c"), Seq("doc_id", "win"))
      .filter(col("k.energy") =!= col("c.energy") ||
        col("k.rms") =!= col("c.rms") || col("k.peak") =!= col("c.peak") ||
        col("k.is_silence") =!= col("c.is_silence"))
    assert(diff.count() == 0,
      s"kernel/composition mismatch:\n${diff.take(3).mkString("\n")}")
  }

  test("m7: planted PCM — a low-amplitude window flags silence with the " +
       "exact hand-computed energy, a loud one does not, and sub-window " +
       "docs emit nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-m7").toString
    // doc 1: 100 bytes of 0x01 -> 50 samples of 0x0101 = 257 (silent);
    // doc 2: 100 'z' bytes -> samples 0x7a7a = 31354 (loud);
    // doc 3: 40 bytes < one window -> no rows
    Seq(
      (1L, "\u0001" * 100, "en", "s0", 100L),
      (2L, "z" * 100, "en", "s0", 100L),
      (3L, "z" * 40, "en", "s0", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.m7AudioEnergy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 0L, 50L * 257L * 257L, 257.0, 257L, true),
      (2L, 0L, 50L * 31354L * 31354L, 31354.0, 31354L, false)))
  }
}
