package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame equality — the reference's `all_equal` harness operator
  * (SURVEY.md §2.8), in both flavors the reference toggles between:
  * order-insensitive (Ex1/Ex6) and order-sensitive (Ex2–Ex5).
  *
  * The multiset comparison is DISTRIBUTED (groupBy-all-columns + null-safe
  * full-outer join on counts) so it works on results too large to
  * collect — `a.except(b)` alone would miss duplicate-multiplicity
  * differences, and collect-and-sort doesn't scale. */
object Comparator {

  /** Number of rows whose multiset multiplicity differs between a and b
    * (0 ⇔ same multiset of rows). Null-safe on every column. */
  def unorderedDiffCount(a: DataFrame, b: DataFrame): Long = {
    require(a.columns.sameElements(b.columns),
      s"schema mismatch: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cnt_a"))
    val cb = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cnt_b"))
    val cond = cols.map(c => ca(c) <=> cb(c)).reduce(_ && _)
    ca.join(cb, cond, "full_outer")
      .filter(!(coalesce(col("__cnt_a"), lit(0L)) <=>
        coalesce(col("__cnt_b"), lit(0L))))
      .count()
  }

  /** Order-insensitive equality (`all_equal(..., ignore_row_order=TRUE)`,
    * RDataFramesSQL.Rmd:48-50). */
  def equalUnordered(a: DataFrame, b: DataFrame): Boolean =
    unorderedDiffCount(a, b) == 0

  /** Order-sensitive equality (`all_equal` default, RDataFramesSQL
    * .Rmd:272-274): collected sequence compare — only valid for results
    * that fit the driver, which is what an ORDER BY + LIMIT query is. */
  def equalOrdered(a: DataFrame, b: DataFrame): Boolean = {
    val ra = a.collect().toSeq
    val rb = b.collect().toSeq
    a.columns.sameElements(b.columns) && ra == rb
  }
}
