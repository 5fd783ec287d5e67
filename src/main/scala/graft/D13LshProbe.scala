package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Similarity}
import graft.sources.Tables

/** Honest-recall probe for the d13 assignment seam (r14, VERDICT r13
  * #3): on a given embeddings dir, compares the EXACT N·C cell
  * assignment against the LSH-assisted production path
  * ([[Similarity.lshCellAssignedAgainst]]) three ways —
  *   1. assignment agreement (same cell per vector) + miss count,
  *   2. d13 drop-set recall/precision of the lsh path vs the exact
  *      path's drop set (the number that matters: a "drop" is the
  *      operator's decision, cells are just its blocking),
  *   3. drop counts on both paths.
  * `runMain graft.D13LshProbe [dir]` — prints one JSON line; run it on
  * the skew (clustered) ScaleGen corpus for the trained-embedding
  * geometry the lsh default targets, and on the main series for the
  * adversarial near-orthogonal floor. Results land in SCALING.md. */
object D13LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val exactCells = Similarity.cellAssigned(e)
      .select(col("vec_id"), col("cell").as("c_exact"))
    val lshCells = Similarity.lshCellAssigned(e)
      .select(col("vec_id"), col("cell").as("c_lsh"))
    val agg = exactCells.join(lshCells, "vec_id")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("c_exact") === col("c_lsh"), 1L).otherwise(0L)).as("agree"),
        sum(when(col("c_lsh") < 0, 1L).otherwise(0L)).as("miss"))
      .collect()(0)
    val (n, agree, miss) =
      (agg.getAs[Long]("n"), agg.getAs[Long]("agree"), agg.getAs[Long]("miss"))

    def dropSet(via: String): Set[Long] = {
      System.setProperty("graft.d13.assignVia", via)
      try Dedup.d13SemanticDedup(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      finally System.clearProperty("graft.d13.assignVia")
    }
    val exactDrops = dropSet("exact")
    val lshDrops = dropSet("lsh")
    val common = (exactDrops & lshDrops).size
    val recall =
      if (exactDrops.isEmpty) 1.0 else common.toDouble / exactDrops.size
    val precision =
      if (lshDrops.isEmpty) 1.0 else common.toDouble / lshDrops.size
    println(
      f"""{"metric":"d13_lsh_probe","dir":"$dir","vectors":$n,""" +
      f""""assign_agree":$agree,"assign_miss":$miss,""" +
      f""""agree_pct":${100.0 * agree / n}%.1f,""" +
      f""""exact_drops":${exactDrops.size},"lsh_drops":${lshDrops.size},""" +
      f""""drop_recall":$recall%.4f,"drop_precision":$precision%.4f}""")
    spark.stop()
  }
}
