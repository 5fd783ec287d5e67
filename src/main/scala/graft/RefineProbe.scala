package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Codebook-refinement honesty probe (r18, VERDICT r17 #3): measures
  * what ONE Lloyd iteration buys on a given corpus —
  *
  *   - mean recall@10 of the s2 IVF search under the seed codebook vs
  *     the refined one (s17's path), same probe budget, and
  *   - both full s10 probe-budget curves (mean recall at every probe
  *     count), so the lift is visible across the whole
  *     recall-vs-scan-cost trade, not at one operating point.
  *
  * Prints one JSON line; numbers land in SCALING.md's round-18 codebook
  * table. `runMain graft.RefineProbe [dir]`. The flat tier's refine
  * delta is measured separately by [[D13LshProbe]] under
  * SPARK_GRAFT_CODEBOOK_REFINE=1 (drop recall/precision vs the exact
  * path — the d13 deliverable). */
object RefineProbe {

  /** Sampled UNBLOCKED drop truth (r19): an idMix-strided `target`-
    * vector sample scored against the FULL corpus under exactly d13's
    * unblocked rule — sampled vector v is a truth-drop iff some u < v
    * anywhere in the corpus has rounded cosine ≥ D13Threshold. Sample
    * × N cosines, linear in N; returns (sample ids, truth-drop ids ⊆
    * sample). Shared with [[D13LshProbe]], which reads the production
    * assignment tiers against the same truth. Probe-only (driver
    * collects two small id sets). */
  private[graft] def sampledUnblockedDrops(
      e: org.apache.spark.sql.DataFrame, target: Int): (Set[Long], Set[Long]) = {
    import graft.queries.{Dedup, Similarity}
    import graft.functions.VectorFunctions.cosine_sim
    val s = e.orderBy(Similarity.idMixOf(col("vec_id")), col("vec_id"))
      .limit(target)
      .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"))
    val sIds = s.select(col("s_id")).collect().map(_.getLong(0)).toSet
    val truth = broadcast(s)
      .join(e, col("vec_id") < col("s_id"))
      .filter(round(cosine_sim(col("s_emb"), col("embedding")), 4)
        >= Dedup.D13Threshold)
      .select(col("s_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    (sIds, truth)
  }

  /** Runs `body` with the refine seam pinned to `n` iterations,
    * restoring the prior value after — the probe's only mutation. */
  private def withRefine[T](n: Int)(body: => T): T = {
    val prev = sys.props.get("graft.codebook.refine")
    System.setProperty("graft.codebook.refine", n.toString)
    try body
    finally prev match {
      case Some(v) => System.setProperty("graft.codebook.refine", v)
      case None    => System.clearProperty("graft.codebook.refine")
    }
  }

  /** `runMain graft.RefineProbe <dir> sqrt` (r19, VERDICT r18 #5):
    * measures what the seam buys on the SQRT-codebook consumers it now
    * reaches —
    *
    *   - s7 (IVF-PQ) mean recall@10, seed vs one exact-Lloyd iteration
    *     of its fixed codebook;
    *   - the d13 `exact` tier's drop set, seed vs refined: counts,
    *     intersection, and drop recall/precision of EACH against the
    *     UNBLOCKED brute drop set (a vector drops iff it has a
    *     lower-id neighbor at cosine ≥ D13Threshold, no cell
    *     blocking) — the ideal the blocking approximates, so the
    *     refine delta is read against ground truth, not just as a
    *     set shift. Small corpora get the full N² reference; depth
    *     corpora get an idMix-strided ~2000-vector sample scored
    *     against the FULL corpus (linear in N), reported under the
    *     sample_* fields.
    *
    * Prints one JSON line; rows land in measurements/r19/. */
  private def sqrtMode(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import graft.queries.Dedup
    import graft.functions.VectorFunctions.cosine_sim
    import graft.sources.Tables
    val t0 = System.nanoTime()
    def meanRecall(n: Int): Double = withRefine(n) {
      Similarity.queries("s7_ann_ivfpq")(spark, dir)
        .agg(avg(col("recall_at_10"))).head().getDouble(0)
    }
    val s7Seed = meanRecall(0)
    val s7Ref = meanRecall(1)
    def d13Drops(n: Int): Set[Long] = withRefine(n) {
      Dedup.d13SemanticDedup(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }
    val seedDrops = d13Drops(0)
    val refDrops = d13Drops(1)
    val common = (seedDrops & refDrops).size
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    // Full N² reference where computable (the harness corpora). At
    // ScaleGen depths the truth is instead measured on an idMix-strided
    // SAMPLE of ~2000 vectors against the FULL corpus (sample × N
    // cosines — linear in N), so the depth rows carry a real sampled
    // drop-recall instead of a bare set shift: for a sampled vector v,
    // truth-drop(v) = exists u < v in the WHOLE corpus at cosine ≥
    // threshold — exactly d13's unblocked rule restricted to S. Both
    // fields are reported (the full one null at depth, the sampled one
    // null at harness where the full reference supersedes it).
    val SampleTarget = 2000L
    val full = n <= 30000L
    val brute: Option[Set[Long]] =
      if (!full) None
      else Some {
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        a.join(b, col("a_id") < col("b_id"))
          .filter(round(cosine_sim(col("a_emb"), col("b_emb")), 4)
            >= Dedup.D13Threshold)
          .select(col("b_id")).distinct()
          .collect().map(_.getLong(0)).toSet
      }
    val (sampleIds, bruteSample): (Option[Set[Long]], Option[Set[Long]]) =
      if (full) (None, None)
      else {
        val (s, t) = sampledUnblockedDrops(e, SampleTarget.toInt)
        (Some(s), Some(t))
      }
    val sec = (System.nanoTime() - t0) / 1e9
    def f(v: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def ratio(num: Int, den: Int): String =
      if (den == 0) f(1.0) else f(num.toDouble / den)
    def rec(drops: Set[Long]): String = brute match {
      case Some(bd) => ratio((bd & drops).size, bd.size)
      case None     => "null"
    }
    def prec(drops: Set[Long]): String = brute match {
      case Some(bd) => ratio((bd & drops).size, drops.size)
      case None     => "null"
    }
    def recS(drops: Set[Long]): String = bruteSample match {
      case Some(bt) => ratio((bt & drops).size, bt.size)
      case None     => "null"
    }
    // sampled precision: of the path's drops WITHIN the sample, how
    // many are truth drops (path drops outside S have no truth bit)
    def precS(drops: Set[Long]): String = (bruteSample, sampleIds) match {
      case (Some(bt), Some(s)) => ratio((bt & drops).size, (drops & s).size)
      case _                   => "null"
    }
    println(
      s"""{"metric":"codebook_refine_sqrt","dir":"$dir","vectors":$n,""" +
      s""""s7_seed_recall":${f(s7Seed)},"s7_refined_recall":${f(s7Ref)},""" +
      s""""d13_exact_drops_seed":${seedDrops.size},""" +
      s""""d13_exact_drops_refined":${refDrops.size},""" +
      s""""drops_common":$common,""" +
      s""""brute_drops":${brute.map(_.size.toString).getOrElse("null")},""" +
      s""""drop_recall_seed":${rec(seedDrops)},""" +
      s""""drop_recall_refined":${rec(refDrops)},""" +
      s""""drop_precision_seed":${prec(seedDrops)},""" +
      s""""drop_precision_refined":${prec(refDrops)},""" +
      s""""sample_n":${sampleIds.map(_.size.toString).getOrElse("null")},""" +
      s""""brute_drops_sample":${bruteSample.map(_.size.toString).getOrElse("null")},""" +
      s""""sample_drop_recall_seed":${recS(seedDrops)},""" +
      s""""sample_drop_recall_refined":${recS(refDrops)},""" +
      s""""sample_drop_precision_seed":${precS(seedDrops)},""" +
      s""""sample_drop_precision_refined":${precS(refDrops)},""" +
      s""""sec":${f(sec)}}""")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark =
      BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    if (args.lift(1).contains("sqrt")) {
      sqrtMode(spark, dir)
      spark.stop()
      return
    }
    val t0 = System.nanoTime()
    def mean(df: DataFrame): Double =
      df.agg(avg(col("recall_at_10"))).head().getDouble(0)
    def curve(df: DataFrame): Seq[Double] =
      df.groupBy(col("probed_cells"))
        .agg(avg(col("recall_at_10")).as("r"))
        .orderBy(col("probed_cells"))
        .collect().map(_.getAs[Double]("r")).toSeq
    val seedMean = mean(Similarity.s2AnnIvf(spark, dir))
    val refinedMean = mean(Similarity.s17IvfRefined(spark, dir))
    val seedCurve = curve(Similarity.s10ProbeSweep(spark, dir))
    val refinedCurve = curve(Similarity.s10ProbeSweepRefined(spark, dir))
    val sec = (System.nanoTime() - t0) / 1e9
    def f(v: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def arr(c: Seq[Double]): String = c.map(f).mkString("[", ",", "]")
    println(
      s"""{"metric":"codebook_refine","dir":"$dir",""" +
      s""""seed_recall":${f(seedMean)},""" +
      s""""refined_recall":${f(refinedMean)},""" +
      s""""seed_curve":${arr(seedCurve)},""" +
      s""""refined_curve":${arr(refinedCurve)},""" +
      s""""sec":${f(sec)}}""")
    spark.stop()
  }
}
