package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interleaved A/B harness for the q6 headroom question (VERDICT r16
  * #4: three rounds at <8% inside the 2× bar; the r16 exchange-fusion
  * attempt was measured 1.6× WORSE and reverted, so the remaining
  * lever — if any — must be found, or the constant pinned as
  * irreducible).
  *
  * Variants, all oracle-equivalent to q6_semijoin_having_distinct:
  *   - `shipped`: the committed shape (distinct before the dim join,
  *     two exchanges);
  *   - `noaqe`: the SAME plan executed with adaptive query execution
  *     off — q6 is a sub-second 6-stage query, so per-exchange AQE
  *     re-planning is a candidate for the fixed constant;
  *   - `suppset`: the distinct re-expressed as
  *     groupBy(l_suppkey).agg(collect_set(p_brand)) + explode — the
  *     exchange keys on the supplier alone (≤ |suppliers| groups vs
  *     brands×suppliers), trading shuffle width for set state;
  *   - `threeway`: distinct AFTER the supplier join (the r13-rejected
  *     order, re-measured so the negative result stays current).
  *
  * Interleaved rounds in one warm JVM (the AbQ4 convention) so host
  * regime drift cannot masquerade as a plan difference. */
object AbQ6 {

  def shipped(s: SparkSession, dir: String): DataFrame =
    graft.queries.RelationalQueries.q6SemiJoinHavingDistinct(s, dir)

  private def midParts(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val midBrands = part.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p_brand").asc)
      .offset(2).limit(10)
      .select(col("p_brand"))
    part.join(midBrands, Seq("p_brand"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
  }

  def suppSet(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    li.join(midParts(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(collect_set(col("p_brand")).as("brands"))
      .select(col("l_suppkey"), explode(col("brands")).as("p_brand"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_brand"), col("s_suppkey"), col("s_name"))
      .orderBy(col("p_brand").asc, col("s_suppkey").asc)
  }

  def threeWay(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    li.join(midParts(s, dir), col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_brand"), col("s_suppkey"), col("s_name"))
      .distinct()
      .orderBy(col("p_brand").asc, col("s_suppkey").asc)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSupport.session(cpus)

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "shipped" -> (shipped _), "noaqe" -> (shipped _),
      "suppset" -> (suppSet _), "threeway" -> (threeWay _))

    def once(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val aqeOff = name == "noaqe"
      if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      } finally {
        if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    // parity gate first: every variant must return the shipped rows
    val ref = shipped(spark, sfDir).collect().toSeq
    variants.drop(1).foreach { case (n, fn) =>
      val got = (if (n == "noaqe") shipped(spark, sfDir)
                 else fn(spark, sfDir)).collect().toSeq
      require(got == ref, s"variant $n diverged from shipped (${got.size} vs ${ref.size} rows)")
    }
    variants.foreach { case (n, fn) => once(n, fn) } // warmup
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      variants.foreach { case (n, fn) => samples(n) = samples(n) :+ once(n, fn) }
    }
    variants.foreach { case (n, _) =>
      val v = samples(n).sorted
      println(f"[ab] cpus=$cpus%s $n%-9s min=${v.head}%.3f median=${v(v.size / 2)}%.3f max=${v.last}%.3f  all=${v.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
