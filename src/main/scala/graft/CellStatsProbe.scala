package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Similarity}
import graft.sources.Tables

/** Cell-population diagnostics for the d13 assignment seam (r15): for a
  * given embeddings dir and seam value, reports the populated cell
  * count, the max cell size, Σ|cell|² (the pair-stage volume driver)
  * and Σ|sub|² AFTER the bounded sub-cell split (the volume the pair
  * join actually runs). Built to falsify/confirm the concentration
  * hypothesis behind SCALE_300X_D13TL's 322 s sf30 read: a two-level
  * argmax restricted to 2 probed super-cells can shrink the set of
  * winnable cells on a NEAR-UNIFORM corpus, pushing Σ|cell|² toward
  * the N×bound cap that balanced assignment stays far under.
  * `runMain graft.CellStatsProbe [dir] [via]` — one JSON line. */
object CellStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/sf1")
    val via = args.lift(1).getOrElse("exact")
    // the JSON echoes via verbatim, so an unknown value must fail here
    // rather than silently running the exact path under the typo'd label
    require(Set("exact", "twolevel", "lsh", "lshcap", "lshflat").contains(via),
      s"unknown via '$via' — expected exact, twolevel, lsh, lshcap or lshflat")
    val spark = BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cells = via match {
      case "twolevel" => Similarity.twoLevelCellAssigned(e)
      case "lsh"      => Similarity.lshCellAssigned(e)
      case "lshcap"   => Similarity.lshCapCellAssigned(e)
      case "lshflat"  => Similarity.lshFlatCellAssigned(e)
      case _          => Similarity.cellAssigned(e)
    }
    val byCell = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val agg = byCell.agg(
      count(lit(1)).as("n_cells"),
      max(col("n")).as("max_cell"),
      sum(col("n") * col("n")).as("sum_sq")).collect()(0)
    val subAgg = Dedup.boundedSubCells(cells, Dedup.subCapFor(via))
      .groupBy(col("cell"), col("sub")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("sub_sum_sq"),
        max(col("n")).as("max_sub")).collect()(0)
    println(
      s"""{"metric":"d13_cell_stats","dir":"$dir","via":"$via",""" +
      s""""n_cells":${agg.getAs[Long]("n_cells")},""" +
      s""""max_cell":${agg.getAs[Long]("max_cell")},""" +
      s""""sum_sq":${agg.getAs[Long]("sum_sq")},""" +
      s""""max_sub":${subAgg.getAs[Long]("max_sub")},""" +
      s""""sub_sum_sq":${subAgg.getAs[Long]("sub_sum_sq")}}""")
    spark.stop()
  }
}
