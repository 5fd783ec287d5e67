package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Similarity}
import graft.sources.Tables

/** Honest-recall probe for the d13 assignment seam (r14, VERDICT r13
  * #3; generalized r15 to every seam value): on a given embeddings dir,
  * compares the EXACT N·C cell assignment against an APPROXIMATE
  * production path three ways —
  *   1. assignment agreement (same cell per vector) + miss count,
  *   2. d13 drop-set recall/precision of the approximate path vs the
  *      exact path's drop set (the number that matters: a "drop" is the
  *      operator's decision, cells are just its blocking),
  *   3. drop counts on both paths.
  * `runMain graft.D13LshProbe [dir] [via]` — via is `lsh` (default,
  * [[Similarity.lshCellAssigned]]), `lshcap`
  * ([[Similarity.lshCapCellAssigned]], the occupancy-capped linear
  * tier) or `twolevel`
  * ([[Similarity.twoLevelCellAssigned]]); prints one JSON line. Run it
  * on the skew (clustered) ScaleGen corpus for the trained-embedding
  * geometry the approximate defaults target, and on the main series
  * for the adversarial near-orthogonal floor. Results land in
  * SCALING.md.
  *
  * `runMain graft.D13LshProbe [dir] margin` instead prints the sampled
  * top1−top2 assignment-margin statistic
  * ([[Similarity.assignMarginProbe]], VERDICT r14 #3) — the cheap
  * pre-flight that PICKS the seam value per corpus; its decision rule
  * is calibrated in SCALING.md against the recall numbers this same
  * main measures. */
object D13LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val via = args.lift(1).getOrElse("lsh")
    // fail loudly on anything else: an unknown via (including the seam's
    // legal "exact", which this probe has no approximate side for) would
    // otherwise compare MISMATCHED paths — assignment stats on one
    // fallback, drop sets on another — and print a self-inconsistent
    // honesty artifact under the typo'd label
    require(Set("lsh", "lshcap", "lshflat", "twolevel", "margin").contains(via),
      s"unknown via '$via' — expected lsh, lshcap, lshflat, twolevel or margin")
    val spark = BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))

    if (via == "margin") {
      val r = Similarity.assignMarginProbe(e).collect()(0)
      println(
        s"""{"metric":"d13_margin_probe","dir":"$dir",""" +
        s""""n_sampled":${r.getAs[Long]("n_sampled")},""" +
        s""""mean_margin":${r.getAs[Double]("mean_margin")},""" +
        s""""median_margin":${r.getAs[Double]("median_margin")},""" +
        s""""p25_margin":${r.getAs[Double]("p25_margin")},""" +
        s""""mean_top1":${r.getAs[Double]("mean_top1")},""" +
        s""""median_top1":${r.getAs[Double]("median_top1")}}""")
      spark.stop()
      return
    }

    val approxCells = via match {
      case "twolevel" => Similarity.twoLevelCellAssigned(e)
      case "lshcap"   => Similarity.lshCapCellAssigned(e)
      case "lshflat"  => Similarity.lshFlatCellAssigned(e)
      case "lsh"      => Similarity.lshCellAssigned(e)
    }
    val exactCells = Similarity.cellAssigned(e)
      .select(col("vec_id"), col("cell").as("c_exact"))
    val agg = exactCells
      .join(approxCells.select(col("vec_id"), col("cell").as("c_appr")), "vec_id")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("c_exact") === col("c_appr"), 1L).otherwise(0L)).as("agree"),
        sum(when(col("c_appr") < 0, 1L).otherwise(0L)).as("miss"))
      .collect()(0)
    val (n, agree, miss) =
      (agg.getAs[Long]("n"), agg.getAs[Long]("agree"), agg.getAs[Long]("miss"))

    def dropSet(v: String): Set[Long] = {
      System.setProperty("graft.d13.assignVia", v)
      try Dedup.d13SemanticDedup(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      finally System.clearProperty("graft.d13.assignVia")
    }
    val exactDrops = dropSet("exact")
    val apprDrops = dropSet(via)
    val common = (exactDrops & apprDrops).size
    val recall =
      if (exactDrops.isEmpty) 1.0 else common.toDouble / exactDrops.size
    val precision =
      if (apprDrops.isEmpty) 1.0 else common.toDouble / apprDrops.size
    // r19: both paths additionally read against the sampled UNBLOCKED
    // truth (RefineProbe.sampledUnblockedDrops — d13's rule with no
    // cell blocking, an idMix-strided ~2000-vector sample against the
    // full corpus), so the approximate tier's loss is measured against
    // the IDEAL, not only against the exact-blocked path it chains
    // through
    val (sampleIds, truth) = RefineProbe.sampledUnblockedDrops(e, 2000)
    def truthRecall(drops: Set[Long]): Double =
      if (truth.isEmpty) 1.0 else (truth & drops).size.toDouble / truth.size
    def truthPrec(drops: Set[Long]): Double = {
      val inS = (drops & sampleIds).size
      if (inS == 0) 1.0 else (truth & drops).size.toDouble / inS
    }
    println(
      f"""{"metric":"d13_assign_probe","via":"$via","dir":"$dir","vectors":$n,""" +
      f""""assign_agree":$agree,"assign_miss":$miss,""" +
      f""""agree_pct":${100.0 * agree / n}%.1f,""" +
      f""""exact_drops":${exactDrops.size},"approx_drops":${apprDrops.size},""" +
      f""""drop_recall":$recall%.4f,"drop_precision":$precision%.4f,""" +
      f""""sample_n":${sampleIds.size},"truth_drops_sample":${truth.size},""" +
      f""""truth_recall_exact":${truthRecall(exactDrops)}%.4f,""" +
      f""""truth_recall_approx":${truthRecall(apprDrops)}%.4f,""" +
      f""""truth_precision_exact":${truthPrec(exactDrops)}%.4f,""" +
      f""""truth_precision_approx":${truthPrec(apprDrops)}%.4f}""")
    spark.stop()
  }
}
