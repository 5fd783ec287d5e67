package graft

import graft.queries.TextAnalysis

/** Merge-count honesty probe for the batched BPE trainer (r20, VERDICT
  * r19 #4): the t26 catalog entry gates 2 rounds x batch 4 = 8 merges,
  * and the 30k-merge production posture was until now ARITHMETIC on the
  * t24 rounds-axis slope (~0.32 s/round / batch width). This probe runs
  * [[TextAnalysis.t26BatchLoop]] — the exact code behind the gated
  * entry, with the (rounds, pool, batch) axes parameterized — at
  * production widths for >= 1k merges, so the rounds/width law is
  * measured where the candidate pool and the conflict anti-join are
  * actually exercised (wide pools, deep vocabularies, late rounds whose
  * candidates are merged symbols of earlier batches).
  *
  * `runMain graft.BpeScaleProbe <dir> <rounds> <pool> <batch> [reps=3] [select=antijoin]`
  * — runs the whole training loop `reps` times in ONE JVM (the r19
  * rounds-axis protocol: graft.Explain's min-of-3, so the first-run
  * JIT/parquet-footer cold cost doesn't pollute the law) and prints one
  * JSON line: selected merge count (batch selection is conservative
  * under conflicts, so selected <= rounds*batch), min/all wall seconds,
  * s/round and s/merge on the min, plus the final vocab size. Results
  * land in measurements/r20/T26_MERGE_SCALE.txt and SCALING.md
  * round-20. */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/zipf10")
    val rounds = args.lift(1).map(_.toInt).getOrElse(64)
    val pool = args.lift(2).map(_.toInt).getOrElse(64)
    val batch = args.lift(3).map(_.toInt).getOrElse(16)
    val reps = args.lift(4).map(_.toInt).getOrElse(3)
    val select = args.lift(5).getOrElse("antijoin")
    val spark =
      BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    var merges = 0
    var vocabEnd = 0L
    val secs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val rows = TextAnalysis
        .t26BatchLoop(spark, dir, rounds, pool, batch, select)
        .collect()
      merges = rows.length
      vocabEnd = rows.map(_.getAs[Long]("vocab_size")).last
      (System.nanoTime() - t0) / 1e9
    }
    val sec = secs.min
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    // selection-rate trend: mean selected-per-round over the first and
    // last quarter of rounds — whether the conflict structure loosens
    // as the vocabulary diversifies decides the long-run merge law
    val lastRows = TextAnalysis
      .t26BatchLoop(spark, dir, rounds, pool, batch, select)
      .groupBy(org.apache.spark.sql.functions.col("round")).count()
      .collect().map(r => r.getAs[Int]("round") -> r.getAs[Long]("count"))
      .toMap
    val q = math.max(1, rounds / 4)
    def rate(rs: Range) = rs.map(lastRows.getOrElse(_, 0L)).sum.toDouble / rs.size
    println(s"""{"metric":"t26_merge_scale","dir":"$dir","rounds":$rounds,""" +
      s""""pool":$pool,"batch":$batch,"select":"$select","merges":$merges,""" +
      s""""vocab_end":$vocabEnd,"sec":${f(sec)},""" +
      s""""all":[${secs.map(f).mkString(",")}],""" +
      s""""sec_per_round":${f(sec / rounds)},""" +
      s""""sec_per_merge":${f(sec / math.max(1, merges))},""" +
      s""""rate_first_q":${f(rate(1 to q))},""" +
      s""""rate_last_q":${f(rate(rounds - q + 1 to rounds))}}""")
    spark.stop()
  }
}
