package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Depth honesty probe for s11's mining tiers (r17, VERDICT r16 #5 —
  * the pricing instrument for the flat tier's per-(source, cell) scan
  * cap): runs [[Similarity.s11Differential]] — an idMix-strided source
  * sample mined by BOTH the exact reference and the blocked tier under
  * `via` against the full target slice — and prints one JSON line of
  * agreement statistics:
  *
  *   - `agree` / `n_src`: blocked best match == exact best match,
  *   - `exact_accepted` / `blocked_accepted`: per-tier accepted counts,
  *   - `acc_overlap_same`: sources accepted by BOTH tiers with the SAME
  *     match (the strict accepted-set overlap),
  *   - `acc_overlap_any`: accepted by both regardless of match,
  *   - `missed`: sources whose probes found no candidate at all (the
  *     −1 sentinel — a loud miss, s11b's convention),
  *   - `regret_mean` / `regret_p90` / `within_1e3`: the cosine REGRET
  *     distribution (exact best cosine − blocked pick cosine, ≥ 0) —
  *     the metric that matters at depth, where match identity is
  *     tie-dominated (10⁵-scale target slices put many candidates
  *     within one 10⁻⁴ cosine quantum of the argmax, so two tiers
  *     ranking the same near-tie family "disagree" on id while mining
  *     equally good pairs). `within_1e3` counts sources whose blocked
  *     pick is within 0.001 cosine of the exact best.
  *
  * `runMain graft.S11Probe <dir> <via> [sampleTarget=500]` — via is
  * `ivf`, `lsh`, `twolevel`, `flat` or `auto` (resolved tier echoed in
  * the output). Run on the skew (clustered) and main ScaleGen corpora
  * at sf30+; results land in SCALING.md's round-17 differential table.
  * sampleTarget <= 0 keeps every source (the verbatim s11b shape —
  * only feasible at harness SFs).
  *
  * `runMain graft.S11Probe <dir> <via> [sampleTarget] sweep` (r18,
  * VERDICT r17 #2) instead runs [[Similarity.s16SweepDifferential]] —
  * the margin-threshold ACCEPTANCE sweep under the same strided-source
  * convention — and prints one JSON line per threshold: per-tier
  * accepted counts, accepted-set overlap (any / same match), and the
  * mean cosine regret over the blocked-accepted set. This is the
  * instrument that CHOOSES the mining tier's operating point at depth;
  * the decision row lands in SCALING.md.
  *
  * `runMain graft.S11Probe <dir> <via> [sampleTarget] truth` (r20,
  * VERDICT r19 #5) runs [[Similarity.s11TruthDifferential]] — the
  * sampled-UNBLOCKED-truth comparison (t-side margin statistics over
  * the FULL source slice) — and prints one JSON line grading BOTH the
  * within-sample exact reference and the blocked tier under `via`
  * directly against truth acceptance: accepted-set recall/precision
  * per tier, the chained blocked-vs-exact recall for comparison (the
  * d13 lesson: chaining misstates a tier), the margin bias of the
  * within-sample protocol, and a pick-mismatch consistency count
  * (structurally 0). Rows land in
  * measurements/r20/S11_TRUTH_PROBE.jsonl. */
object S11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val via = args.lift(1).getOrElse("flat")
    require(Set("ivf", "lsh", "twolevel", "flat", "auto").contains(via),
      s"unknown via '$via' — expected ivf, lsh, twolevel, flat or auto")
    val target = args.lift(2).map(_.toLong).getOrElse(500L)
    val spark =
      BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    if (args.lift(3).contains("sweep")) {
      val t0 = System.nanoTime()
      val rows = Similarity.s16SweepDifferential(spark, dir, via, target)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      def fm(v: Any): String = v match {
        case null      => "null"
        case d: Double => "%.4f".formatLocal(java.util.Locale.ROOT, d)
        case x         => x.toString
      }
      // total_sec, not sec (ADVICE r18): the sweep computes every
      // threshold's row in ONE collect, so the wall-clock is a property
      // of the whole sweep — a field named like per-row timing read as
      // four identical per-threshold measurements in the committed
      // S16_DEPTH_SWEEP rows
      rows.foreach { r =>
        println(
          s"""{"metric":"s16_margin_sweep","dir":"$dir","via":"$via",""" +
          s""""via_resolved":"${r.getAs[String]("via")}",""" +
          s""""sample_target":$target,"thr":${fm(r.getAs[Any]("thr"))},""" +
          s""""n_src":${r.getAs[Long]("n_src")},""" +
          s""""exact_accepted":${r.getAs[Long]("exact_accepted")},""" +
          s""""blocked_accepted":${r.getAs[Long]("blocked_accepted")},""" +
          s""""overlap_any":${r.getAs[Long]("overlap_any")},""" +
          s""""overlap_same":${r.getAs[Long]("overlap_same")},""" +
          s""""mean_acc_regret":${fm(r.getAs[Any]("mean_acc_regret"))},""" +
          s""""total_sec":${"%.4f".formatLocal(java.util.Locale.ROOT, sec)}}""")
      }
      spark.stop()
      return
    }

    if (args.lift(3).contains("truth")) {
      // sampled-truth mode (r20, VERDICT r19 #5 — the d13 lesson at
      // s11): grade BOTH the within-sample exact reference and the
      // blocked tier directly against unblocked truth margins (t-side
      // statistics over the FULL source slice), so the chained
      // protocol's own bias is priced alongside the tier
      val t0 = System.nanoTime()
      val d = Similarity.s11TruthDifferential(spark, dir, via, target)
      val r = d.agg(
        count(lit(1)).as("n_src"),
        sum(when(col("truth_accepted"), 1L).otherwise(0L)).as("truth_acc"),
        sum(when(col("exact_accepted"), 1L).otherwise(0L)).as("exact_acc"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("blocked_acc"),
        sum(when(col("exact_accepted") && col("truth_accepted"), 1L)
          .otherwise(0L)).as("exact_and_truth"),
        sum(when(col("accepted") && col("truth_accepted"), 1L)
          .otherwise(0L)).as("blocked_and_truth"),
        sum(when(col("accepted") && col("exact_accepted"), 1L)
          .otherwise(0L)).as("blocked_and_exact"),
        sum(when(col("agree_truth"), 1L).otherwise(0L)).as("agree_truth"),
        sum(when(col("match_id") === -1L, 1L).otherwise(0L)).as("missed"),
        round(avg(col("exact_margin") - col("truth_margin")), 4)
          .as("margin_bias_mean"),
        round(expr(
          "percentile(abs(exact_margin - truth_margin), 0.9D)"), 4)
          .as("margin_bias_p90"),
        sum(when(col("exact_match") =!= col("truth_match"), 1L)
          .otherwise(0L)).as("pick_mismatch"),
        max(col("via")).as("via_resolved")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = r.getAs[Long]("n_src")
      def f(v: Double): String =
        "%.4f".formatLocal(java.util.Locale.ROOT, v)
      if (n == 0L) {
        // empty sample: the avg/percentile aggregates are null and the
        // getAs[Double] unboxing would NPE (the r17 lesson, same as the
        // differential mode)
        println(
          s"""{"metric":"s11_truth","dir":"$dir","via":"$via",""" +
          s""""sample_target":$target,"n_src":0,"empty_sample":true,""" +
          s""""sec":${f(sec)}}""")
        spark.stop()
        return
      }
      def rat(a: Long, b: Long): String =
        f(if (b == 0L) 1.0 else a.toDouble / b)
      val tA = r.getAs[Long]("truth_acc")
      val eA = r.getAs[Long]("exact_acc")
      val bA = r.getAs[Long]("blocked_acc")
      println(
        s"""{"metric":"s11_truth","dir":"$dir","via":"$via",""" +
        s""""via_resolved":"${r.getAs[String]("via_resolved")}",""" +
        s""""sample_target":$target,"n_src":$n,""" +
        s""""truth_accepted":$tA,"exact_accepted":$eA,""" +
        s""""blocked_accepted":$bA,""" +
        s""""exact_truth_recall":${rat(r.getAs[Long]("exact_and_truth"), tA)},""" +
        s""""exact_truth_precision":${rat(r.getAs[Long]("exact_and_truth"), eA)},""" +
        s""""blocked_truth_recall":${rat(r.getAs[Long]("blocked_and_truth"), tA)},""" +
        s""""blocked_truth_precision":${rat(r.getAs[Long]("blocked_and_truth"), bA)},""" +
        s""""blocked_exact_recall":${rat(r.getAs[Long]("blocked_and_exact"), eA)},""" +
        s""""agree_truth":${r.getAs[Long]("agree_truth")},""" +
        s""""missed":${r.getAs[Long]("missed")},""" +
        s""""margin_bias_mean":${f(r.getAs[Double]("margin_bias_mean"))},""" +
        s""""margin_bias_p90":${f(r.getAs[Double]("margin_bias_p90"))},""" +
        s""""pick_mismatch":${r.getAs[Long]("pick_mismatch")},""" +
        s""""sec":${f(sec)}}""")
      // TRUTH-ANCHORED operating-point sweep (the r18 s16 sweep chose
      // the blocked 1.02 threshold against the within-sample exact
      // reference, which this probe shows over-accepts wholesale at
      // depth): per candidate threshold, the blocked tier's accepted
      // set graded against TRUTH acceptance — recall, precision, F1 —
      // so the operating point can be re-chosen against an unbiased
      // anchor. One extra aggregation over the same differential rows.
      val sw = d.select(col("truth_accepted"), col("blocked_margin"),
          explode(array(Similarity.S16Thresholds.map(lit(_)): _*))
            .as("thr"))
        .withColumn("bacc",
          coalesce(col("blocked_margin") >= col("thr"), lit(false)))
        .groupBy(col("thr"))
        .agg(
          sum(when(col("bacc"), 1L).otherwise(0L)).as("blocked_acc"),
          sum(when(col("bacc") && col("truth_accepted"), 1L).otherwise(0L))
            .as("both"),
          sum(when(col("truth_accepted"), 1L).otherwise(0L)).as("truth_acc"))
        .orderBy(col("thr")).collect()
      sw.foreach { row =>
        val thr = row.getAs[Double]("thr")
        val ba = row.getAs[Long]("blocked_acc")
        val both = row.getAs[Long]("both")
        val ta = row.getAs[Long]("truth_acc")
        val rec = if (ta == 0) 1.0 else both.toDouble / ta
        val prec = if (ba == 0) 1.0 else both.toDouble / ba
        val f1 = if (rec + prec == 0) 0.0 else 2 * rec * prec / (rec + prec)
        println(
          s"""{"metric":"s11_truth_sweep","dir":"$dir","via":"$via",""" +
          s""""thr":${f(thr)},"blocked_accepted":$ba,""" +
          s""""truth_recall":${f(rec)},"truth_precision":${f(prec)},""" +
          s""""f1":${f(f1)}}""")
      }
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val d = Similarity.s11Differential(spark, dir, via, target)
    val r = d.agg(
      count(lit(1)).as("n_src"),
      sum(when(col("agree"), 1L).otherwise(0L)).as("agree"),
      sum(when(col("exact_accepted"), 1L).otherwise(0L)).as("exact_acc"),
      sum(when(col("accepted"), 1L).otherwise(0L)).as("blocked_acc"),
      sum(when(col("exact_accepted") && col("accepted") && col("agree"),
        1L).otherwise(0L)).as("acc_same"),
      sum(when(col("exact_accepted") && col("accepted"), 1L).otherwise(0L))
        .as("acc_any"),
      sum(when(col("match_id") === -1L, 1L).otherwise(0L)).as("missed"),
      round(avg(col("regret")), 4).as("regret_mean"),
      round(expr("percentile(regret, 0.9D)"), 4).as("regret_p90"),
      sum(when(col("regret") <= 0.001, 1L).otherwise(0L)).as("within_1e3"),
      max(col("via")).as("via_resolved")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val n = r.getAs[Long]("n_src")
    // Empty sample (empty lang slice or over-strided sampleTarget):
    // every avg/percentile aggregate is null and the getAs[Double]
    // unboxing below would NPE (ADVICE r17) — print an explicit
    // empty-sample line instead of a stack trace.
    if (n == 0L) {
      println(
        s"""{"metric":"s11_differential","dir":"$dir","via":"$via",""" +
        s""""sample_target":$target,"n_src":0,"empty_sample":true,""" +
        s""""sec":${"%.4f".formatLocal(java.util.Locale.ROOT, sec)}}""")
      spark.stop()
      return
    }
    val agree = r.getAs[Long]("agree")
    def f(v: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(
      s"""{"metric":"s11_differential","dir":"$dir","via":"$via",""" +
      s""""via_resolved":"${r.getAs[String]("via_resolved")}",""" +
      s""""sample_target":$target,"n_src":$n,"agree":$agree,""" +
      s""""agree_rate":${f(agree.toDouble / math.max(1L, n))},""" +
      s""""exact_accepted":${r.getAs[Long]("exact_acc")},""" +
      s""""blocked_accepted":${r.getAs[Long]("blocked_acc")},""" +
      s""""acc_overlap_same":${r.getAs[Long]("acc_same")},""" +
      s""""acc_overlap_any":${r.getAs[Long]("acc_any")},""" +
      s""""missed":${r.getAs[Long]("missed")},""" +
      s""""regret_mean":${f(r.getAs[Double]("regret_mean"))},""" +
      s""""regret_p90":${f(r.getAs[Double]("regret_p90"))},""" +
      s""""within_1e3":${r.getAs[Long]("within_1e3")},""" +
      s""""sec":${f(sec)}}""")
    spark.stop()
  }
}
