package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interleaved, CALIBRATION-NORMALIZED A/B harness for the q4 bar
  * question (VERDICT r17 #1: gated A/B norm read 2.59× the sqldf
  * baseline — raw 1.79× — for the second round; the ask is an
  * exhaustive sweep of every remaining oracle-equivalent formulation,
  * each sample normalized by the pass's own calibration, ending in a
  * ≤2.0× shape or an irreducibility pin).
  *
  * Variants, all row-identical to q4_derived_diff_filter (parity-gated
  * at startup):
  *   - `shipped`: the committed shape — grouped max + SHUFFLE_HASH
  *     join back on l_orderkey (sort-free, two scans);
  *   - `noaqe`: the SAME plan with adaptive query execution off (the
  *     AbQ6 probe: is per-exchange AQE re-planning part of the fixed
  *     constant? q6 measured +35% WITHOUT AQE);
  *   - `window`: one scan, partition-window max (the r13 shape —
  *     exchange + full sort of lineitem);
  *   - `aggjoin`: grouped max + unhinted join (Spark picks SMJ);
  *   - `aggbcast`: grouped max + BROADCAST hint on the aggregate side
  *     — the 1-narrow-row-per-order frame is |orders|·16 B (2.4 MB at
  *     sf0.1), so the line-1 side joins with NO exchange at all; the
  *     price is the driver collect + rebroadcast of the agg output;
  *   - `aggexplode`: ONE scan, one exchange, no sort — per-order max
  *     alongside collect_list of line-1 prices, explode restores the
  *     line-1 fan-out;
  *   - `sqlfront`: the shipped shape submitted as SQL text over temp
  *     views (spark.sql front end) — catches any DSL-vs-SQL plan gap.
  *
  * Methodology: variants run INTERLEAVED in one warm JVM (A,B,…,A,B,…)
  * so host regime drift cannot masquerade as a plan difference, and —
  * new in r18, the judge's "normalized by the pass's own calibration" —
  * every timed sample is PAIRED with the Bench calibration kernel run
  * seconds before it. Per variant the report carries raw min/median/max
  * plus `norm` = raw · ref / calib from the min-raw STEADY pair (the
  * exact BENCH_SELF "ab" row convention: steady = calib ≤ 1.15 × the
  * pinned 0.060 s reference level), so the sweep's verdict reads in the
  * same units as the bar. Run under both cpu profiles:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.AbQ4"   (bench profile)
  *   SPARK_GRAFT_CPUS=4  sbt "runMain graft.AbQ4"   (driver profile)
  */
object AbQ4 {

  def windowShape(s: SparkSession, dir: String): DataFrame =
    graft.queries.RelationalQueries.q4DerivedDiffFilter(s, dir)

  /** Shared post-join tail: gap arithmetic, filter, projection, sort. */
  private def q4Tail(joined: DataFrame): DataFrame =
    joined
      .withColumn("price_gap", col("max_price") - col("first_price"))
      .filter(col("price_gap") > 50000)
      .select(
        col("l_orderkey").as("o_orderkey"),
        round(col("max_price"), 2).as("max_price"),
        round(col("first_price"), 2).as("first_price"),
        round(col("price_gap"), 2).as("price_gap"))
      .orderBy(col("price_gap").desc, col("o_orderkey").asc)

  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  private def mx(s: SparkSession, dir: String): DataFrame =
    li(s, dir).groupBy(col("l_orderkey"))
      .agg(max(col("l_extendedprice")).as("max_price"))

  private def first(s: SparkSession, dir: String): DataFrame =
    li(s, dir).filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_extendedprice").as("first_price"))

  def aggJoinShape(s: SparkSession, dir: String): DataFrame =
    q4Tail(first(s, dir).join(mx(s, dir), Seq("l_orderkey")))

  def aggHashJoinShape(s: SparkSession, dir: String): DataFrame =
    q4Tail(first(s, dir).join(mx(s, dir).hint("shuffle_hash"), Seq("l_orderkey")))

  def aggBcastShape(s: SparkSession, dir: String): DataFrame =
    q4Tail(first(s, dir).join(broadcast(mx(s, dir)), Seq("l_orderkey")))

  /** One scan, one exchange, NO sort — the grouped agg computes the
    * per-order max alongside the collect_list of line-1 prices (null
    * conditionals are dropped by collect_list), and explode restores the
    * line-1 fan-out multiplicity. */
  def aggExplodeShape(s: SparkSession, dir: String): DataFrame =
    q4Tail(
      li(s, dir).groupBy(col("l_orderkey"))
        .agg(
          max(col("l_extendedprice")).as("max_price"),
          collect_list(when(col("l_linenumber") === 1, col("l_extendedprice")))
            .as("firsts"))
        .select(col("l_orderkey"), col("max_price"),
          explode(col("firsts")).as("first_price")))

  /** The shipped shape as SQL text over temp views (spark.sql front
    * end). Same RI-eliminated orders join, same SHUFFLE_HASH hint. */
  def sqlFrontShape(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("ab_lineitem")
    s.sql(
      """WITH mx AS (
        |  SELECT /*+ SHUFFLE_HASH(li) */ l_orderkey, max(l_extendedprice) AS max_price
        |  FROM ab_lineitem li GROUP BY 1
        |), fst AS (
        |  SELECT l_orderkey, l_extendedprice AS first_price
        |  FROM ab_lineitem WHERE l_linenumber = 1
        |)
        |SELECT fst.l_orderkey AS o_orderkey,
        |       round(mx.max_price, 2) AS max_price,
        |       round(fst.first_price, 2) AS first_price,
        |       round(mx.max_price - fst.first_price, 2) AS price_gap
        |FROM fst JOIN mx ON fst.l_orderkey = mx.l_orderkey
        |WHERE mx.max_price - fst.first_price > 50000
        |ORDER BY price_gap DESC, o_orderkey ASC
        |""".stripMargin)
  }

  /** The Bench calibration kernel, one sample: hash-reduce 2^26 ids —
    * CPU-bound, no IO, one stage. min-of-3 after an explicit GC (the
    * Bench convention, trimmed from min-of-5 to keep a 7-variant sweep
    * inside one host regime window). */
  private def calib(spark: SparkSession): Double = {
    System.gc()
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1L << 26).select(xxhash64(col("id")).as("h"))
        .agg(expr("bit_xor(h)")).head()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Stage-ladder decomposition for the irreducibility pin: times each
    * prefix of the shipped pipeline (scan→agg, scan→filter, join, +sort)
    * interleaved with calibration, so the fixed constant each rung adds
    * is measurable in the same units as the sweep. */
  private def ladder(spark: SparkSession, sfDir: String, rounds: Int,
      calibRef: Double): Unit = {
    val rungs: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => li(spark, sfDir)),
      "agg_mx" -> (() => mx(spark, sfDir)),
      "filter_line1" -> (() => first(spark, sfDir)),
      "join_nosort" -> (() =>
        first(spark, sfDir).join(mx(spark, sfDir).hint("shuffle_hash"),
            Seq("l_orderkey"))
          .withColumn("price_gap", col("max_price") - col("first_price"))
          .filter(col("price_gap") > 50000)
          .select(col("l_orderkey").as("o_orderkey"),
            round(col("max_price"), 2).as("max_price"),
            round(col("first_price"), 2).as("first_price"),
            round(col("price_gap"), 2).as("price_gap"))),
      "full" -> (() => aggHashJoinShape(spark, sfDir)))
    rungs.foreach { case (_, fn) =>
      fn().write.format("noop").mode("overwrite").save() } // warmup
    val samples = collection.mutable.Map
      .empty[String, Vector[(Double, Double)]].withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      rungs.foreach { case (n, fn) =>
        val c = calib(spark)
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        samples(n) = samples(n) :+ (c, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
      }
    }
    rungs.foreach { case (n, _) =>
      val pairs = samples(n)
      val raws = pairs.map(_._2).sorted
      val (c, t) = pairs.minBy(_._2)
      println(f"[ladder] $n%-13s min=${raws.head}%.3f median=${raws(raws.size / 2)}%.3f norm=${t * calibRef / c}%.3f  all=${raws.map(x => f"$x%.3f").mkString(",")}")
    }
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
    val calibRef = sys.env.getOrElse("SPARK_GRAFT_CALIB_REF", "0.060").toDouble
    val steadyLevel = calibRef * 1.15
    val spark = BenchSupport.session(cpus)
    if (args.lift(2).contains("ladder")) {
      ladder(spark, sfDir, rounds, calibRef)
      spark.stop()
      return
    }
    if (prime) {
      val heavy = Seq("p1_curation_funnel", "p2_funnel_neardup",
        "p3_curation_v2", "p4_policy_savings", "p5_semantic_curation",
        "p6_pretrain_pipeline", "d6_dup_clusters", "d7_cleaned_corpus",
        "d13_semantic_dedup", "d13_semantic_dedup_skew", "t16_split_leakage")
        .filter(SparkEntry.queries.contains)
      heavy.foreach(BenchSupport.once(spark, _, sfDir))
      println(s"[ab] primed ${heavy.size} heavy queries; pinned=${SharedStage.pinnedIds.size} rdds")
    }
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "shipped" -> (aggHashJoinShape _), "noaqe" -> (aggHashJoinShape _),
      "window" -> (windowShape _), "aggjoin" -> (aggJoinShape _),
      "aggbcast" -> (aggBcastShape _), "aggexplode" -> (aggExplodeShape _),
      "sqlfront" -> (sqlFrontShape _))

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
    val ref = aggHashJoinShape(spark, sfDir).collect().toSeq
    variants.foreach { case (n, fn) =>
      val got = fn(spark, sfDir).collect().toSeq
      require(got == ref,
        s"variant $n diverged from shipped (${got.size} vs ${ref.size} rows)")
    }
    variants.foreach { case (n, fn) => once(n, fn) } // warmup
    val samples = collection.mutable.Map
      .empty[String, Vector[(Double, Double)]] // (calib, raw)
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      variants.foreach { case (n, fn) =>
        val c = calib(spark)
        samples(n) = samples(n) :+ (c, once(n, fn))
      }
    }
    variants.foreach { case (n, _) =>
      val pairs = samples(n)
      val raws = pairs.map(_._2).sorted
      val steadyPairs = pairs.filter(_._1 <= steadyLevel)
      val pool = if (steadyPairs.nonEmpty) steadyPairs else pairs
      val (c, t) = pool.minBy(_._2)
      val norm = t * calibRef / c
      println(f"[ab] cpus=$cpus%s $n%-10s min=${raws.head}%.3f median=${raws(raws.size / 2)}%.3f max=${raws.last}%.3f norm=$norm%.3f n_steady=${steadyPairs.size}/${pairs.size}  all=${raws.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
