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
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark =
      BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
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
