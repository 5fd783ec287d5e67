package graft

import graft.queries.Pipeline

class PipelineSpec extends SparkSpec {

  test("p1 funnel: every stage discriminates on a planted corpus and " +
       "the totals are the hand-computed ones") {
    import spark.implicits._
    // 10 'the' + 40 unique words: quality = 0.5·1 + 0.3·1 + 0.2·1 = 1.0
    val good = (Seq.fill(10)("the") ++ (1 to 40).map(i => s"w$i")).mkString(" ")
    // one CJK token → predicted zh (langid drop) but quality still passes
    val cjk = (Seq.fill(10)("the") ++ (1 to 39).map(i => s"w$i") :+ "中")
      .mkString(" ")
    // 2 words, no stopwords, 4 punct chars in 9: quality ≈ 0.187 (q drop)
    val junk = "xxxx !!!!"
    val rows = Seq(
      (1L, good, "en", "s0", good.length.toLong),
      (2L, good, "en", "s0", good.length.toLong),  // exact dup of doc 1
      (3L, junk, "en", "s0", junk.length.toLong),
      (4L, cjk, "zh", "s0", cjk.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft-p1").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Pipeline.p1CurationFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a_ingest", 4L, 152L),   // 50 + 50 + 2 + 50 tokens
      ("b_quality", 3L, 150L),  // junk dropped
      ("c_langid", 2L, 100L),   // cjk doc dropped
      ("d_dedup", 1L, 50L)))    // doc 2 loses to doc 1 on the fingerprint
  }
}
