package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interleaved A/B harness for the q4 plan-shape question (VERDICT r13 #1).
  *
  * Two oracle-equivalent formulations of q4_derived_diff_filter:
  *   - `window`: one scan, partition-window max over l_orderkey (the r13
  *     shape) — exchange + full per-partition SORT of lineitem;
  *   - `aggjoin`: grouped max + join back on l_orderkey (the r12 shape,
  *     keeping the r13 RI join elimination) — two scans, but the sort
  *     inputs are the 1-row-per-order aggregate and the line-1 subset.
  *
  * Variants run INTERLEAVED in one warm JVM (A,B,A,B,…) so the host's
  * fast/slow regime drift cannot masquerade as a plan difference (the
  * r12→r13 lesson; see memory host-perf-regimes). Reports per-variant
  * min/median/max. Run under both cpu profiles:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.AbQ4"   (bench profile)
  *   SPARK_GRAFT_CPUS=4  sbt "runMain graft.AbQ4"   (driver/Verify profile)
  */
object AbQ4 {

  def windowShape(s: SparkSession, dir: String): DataFrame =
    graft.queries.RelationalQueries.q4DerivedDiffFilter(s, dir)

  def aggJoinShape(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val mx = li.groupBy(col("l_orderkey"))
      .agg(max(col("l_extendedprice")).as("max_price"))
    val first = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_extendedprice").as("first_price"))
    first.join(mx, Seq("l_orderkey"))
      .withColumn("price_gap", col("max_price") - col("first_price"))
      .filter(col("price_gap") > 50000)
      .select(
        col("l_orderkey").as("o_orderkey"),
        round(col("max_price"), 2).as("max_price"),
        round(col("first_price"), 2).as("first_price"),
        round(col("price_gap"), 2).as("price_gap"))
      .orderBy(col("price_gap").desc, col("o_orderkey").asc)
  }

  /** Shape C: one scan, one exchange, NO sort — the grouped agg computes
    * the per-order max alongside the collect_list of line-1 prices (null
    * conditionals are dropped by collect_list), and explode restores the
    * line-1 fan-out multiplicity. */
  def aggExplodeShape(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    li.groupBy(col("l_orderkey"))
      .agg(
        max(col("l_extendedprice")).as("max_price"),
        collect_list(when(col("l_linenumber") === 1, col("l_extendedprice")))
          .as("firsts"))
      .select(col("l_orderkey"), col("max_price"),
        explode(col("firsts")).as("first_price"))
      .withColumn("price_gap", col("max_price") - col("first_price"))
      .filter(col("price_gap") > 50000)
      .select(
        col("l_orderkey").as("o_orderkey"),
        round(col("max_price"), 2).as("max_price"),
        round(col("first_price"), 2).as("first_price"),
        round(col("price_gap"), 2).as("price_gap"))
      .orderBy(col("price_gap").desc, col("o_orderkey").asc)
  }

  /** Shape D: agg+join but with a SHUFFLE_HASH hint on the 1-row-per-order
    * aggregate side, so the join is a shuffled hash join (no SMJ sorts). */
  def aggHashJoinShape(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val mx = li.groupBy(col("l_orderkey"))
      .agg(max(col("l_extendedprice")).as("max_price"))
      .hint("shuffle_hash")
    val first = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_extendedprice").as("first_price"))
    first.join(mx, Seq("l_orderkey"))
      .withColumn("price_gap", col("max_price") - col("first_price"))
      .filter(col("price_gap") > 50000)
      .select(
        col("l_orderkey").as("o_orderkey"),
        round(col("max_price"), 2).as("max_price"),
        round(col("first_price"), 2).as("first_price"),
        round(col("price_gap"), 2).as("price_gap"))
      .orderBy(col("price_gap").desc, col("o_orderkey").asc)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(7)
    // "prime": first run the heavy pipeline/dedup entries once via
    // BenchSupport.once, replicating the full-bench JVM context (pinned
    // SharedStage blocks + accumulated heap state) in which the driver's
    // r13 capture measured q4 at 1.502 s while a fresh JVM reads ~0.6 s.
    val prime = args.lift(2).contains("prime")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSupport.session(cpus)
    if (prime) {
      val heavy = Seq("p1_curation_funnel", "p2_funnel_neardup",
        "p3_curation_v2", "p4_policy_savings", "p5_semantic_curation",
        "p6_pretrain_pipeline", "d6_dup_clusters", "d7_cleaned_corpus",
        "d13_semantic_dedup", "d13_semantic_dedup_skew", "t16_split_leakage")
        .filter(SparkEntry.queries.contains)
      heavy.foreach(BenchSupport.once(spark, _, sfDir))
      println(s"[ab] primed ${heavy.size} heavy queries; pinned=${SharedStage.pinnedIds.size} rdds")
    }
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("window" -> (windowShape _), "aggjoin" -> (aggJoinShape _),
        "aggexplode" -> (aggExplodeShape _), "agghashjoin" -> (aggHashJoinShape _))

    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // warmup both
    variants.foreach { case (_, fn) => once(fn) }
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      variants.foreach { case (n, fn) => samples(n) = samples(n) :+ once(fn) }
    }
    variants.foreach { case (n, _) =>
      val v = samples(n).sorted
      println(f"[ab] cpus=$cpus%s $n%-8s min=${v.head}%.3f median=${v(v.size / 2)}%.3f max=${v.last}%.3f  all=${v.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
