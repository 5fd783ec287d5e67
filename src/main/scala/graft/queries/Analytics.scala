package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Analytics breadth beyond strict reference parity: the operator
  * families SURVEY.md §2.5/§2.7 marks "absent from reference, available
  * for free later" — multi-level aggregation (ROLLUP), set operations,
  * and sketch-based approximate aggregation. Each matters at 100 TB:
  * rollup computes all levels in one shuffle instead of N passes, set ops
  * are hash-partition joins, and the HLL sketch replaces an exact
  * shuffle-heavy distinct with a mergeable fixed-size state.
  */
object Analytics {

  /** x1 — ROLLUP over (priority, status): every aggregation level in one
    * pass. Subtotal rows carry NULL group keys; ordering coalesces them
    * to a high sentinel so both engines sort identically. */
  def x1Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(
        coalesce(col("o_orderpriority"), lit("~")),
        coalesce(col("o_orderstatus"), lit("~")))

  /** x2 — set operations: customers ordering in both 1995 and 1996
    * (INTERSECT), either-but-not-both (symmetric EXCEPTs unioned), and
    * the union (UNION/DISTINCT) — reported as labeled counts.
    *
    * Multi-branch reuse WITHOUT cache: both cohorts are filters over ONE
    * per-customer year-flag aggregate, so every set-op branch contains
    * the same exchange subtree and Spark's exchange reuse executes the
    * scan+shuffle once (PlanSpec pins the ReusedExchange). r4 cached two
    * distinct-key tables here with no unpersist point — a session-
    * lifetime leak this formulation removes entirely. */
  def x2SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy").as("y"))
      .filter(col("y").isin("1995", "1996"))
    val flags = o.groupBy(col("o_custkey"))
      .agg(bool_or(col("y") === "1995").as("in95"),
        bool_or(col("y") === "1996").as("in96"))
    val a = flags.filter(col("in95")).select(col("o_custkey"))
    val b = flags.filter(col("in96")).select(col("o_custkey"))
    def labeled(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    labeled("both_years", a.intersect(b))
      .unionAll(labeled("only_1995", a.except(b)))
      .unionAll(labeled("only_1996", b.except(a)))
      .unionAll(labeled("either_year", a.union(b).distinct()))
      .orderBy(col("op"))
  }

  /** x3 — sketch aggregation: HyperLogLog++ distinct-customer estimate
    * per order status vs the exact count, with the relative error.
    * The sketch's fixed-size mergeable state is THE scale story: exact
    * distinct shuffles every key, the sketch shuffles ~KB per group.
    *
    * WHY THERE IS NO HASH ORACLE (the catalog's one remaining rows-only
    * entry; VERDICT r14 #6 asked for this proof or a flip): the
    * estimate value is a function of (hash function, register layout,
    * bias-correction table), and the two engines agree on none of the
    * three. Spark's `approx_count_distinct` hashes each key with
    * 64-bit xxHash64 (seed 42H mixed per type), keeps 2^p 6-bit
    * registers selected by rsd→p (0.02 → p=12), and applies the HLL++
    * empirical bias table from the Heule et al. 2013 paper's appendix;
    * DuckDB's `approx_count_distinct` runs its own HyperLogLog over
    * duckdb's 64-bit hash (a different finalizer), with a different
    * fixed p and its own correction curve. Replaying Spark's estimate
    * in DuckDB SQL would mean reimplementing xxHash64-with-seed-42 over
    * the typed binary encoding of each key, the register argmax, AND
    * the bias interpolation table — at which point the "oracle" is a
    * second copy of the engine, not an independent check (the t5/d4
    * replays were accepted precisely because their primitives —
    * polynomial mod-P, XXH64 over raw bytes — are common ground; HLL's
    * bias table is not). The honest gate is therefore split: x3b
    * hash-gates the EXACT counts plus a 5-sigma boolean bound on the
    * estimate (DuckDB states the bound as a literal), and
    * AnalyticsSpec asserts the 2%-rsd contract numerically. */
  def x3ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    // Dedupe (status, custkey) BEFORE aggregating. Asking for
    // countDistinct and approx_count_distinct in ONE aggregate makes
    // Spark key the partial aggregate by (status, custkey) — one HLL
    // sketch PER DISTINCT CUSTOMER (~4 KB each at rsd 0.02; hundreds of
    // GB of sketch state at 100 TB). HLL is duplicate-insensitive, so
    // sketching the deduped keys gives the bit-identical estimate while
    // only ever materializing one sketch per status (3 here). Same two
    // exchanges the fused plan had; the second moves 3 rows. Measured
    // 1.449 s → 0.632 s at sf0.1 (BENCH_r07.json vs BENCH_r08.json).
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_custkey")).distinct()
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("exact_custs"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
      .withColumn("rel_err",
        round(abs(col("approx_custs") - col("exact_custs"))
          .cast("double") / col("exact_custs"), 4))
      .orderBy(col("o_orderstatus"))

  /** x3b — the oracle-checkable slice of x3 (same trick as d4b/t5b): the
    * exact distinct count is engine-independent, and the HLL estimate's
    * 2%-rsd contract is asserted as a generous boolean bound (5 sigma)
    * DuckDB states as a literal. A sketch regression that drifts past the
    * bound flips the boolean and hash-mismatches the oracle; the estimate
    * VALUES themselves stay engine-specific in x3. Being x3 plus a
    * projection, it is excluded from Bench ([[graft.SparkEntry.benchExclude]])
    * so the exact countDistinct isn't timed twice. */
  def x3bApproxDistinctBounded(s: SparkSession, dir: String): DataFrame =
    x3ApproxDistinct(s, dir)
      .select(col("o_orderstatus"), col("exact_custs"),
        (col("rel_err") <= 0.10).as("approx_ok"))

  /** x4 — salted two-stage aggregation for skewed keys: `event_type` has
    * only 5 values, so a direct groupBy reduces on 5 tasks no matter how
    * many cores exist (the textbook skew case). Stage 1 groups by
    * (key, salt) — 5×16 groups spread across the cluster — stage 2
    * re-aggregates the partials by key. Value totals run in exact integer
    * cents so the two-stage result is bit-identical to the direct one
    * (the DuckDB oracle computes it directly — same answer is the point).
    */
  def x4SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val salted = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        pmod(col("event_id"), lit(16)).as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pcents"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        round(sum(col("pcents")).cast("double") / 100.0, 2).as("value_sum"))
      .orderBy(col("event_type"))
  }

  /** x5 — pivot (long→wide): hour-of-day × event-type counts as one row
    * per hour with a column per type. The value list is EXPLICIT — an
    * unlisted pivot triggers an extra distinct-collection job and makes
    * the output schema data-dependent, both wrong at scale. */
  def x5Pivot(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
    raw
      .select(hour(timestamp_micros(Tables.eventsTsUs(raw))).as("hour"),
        col("event_type"))
      .groupBy(col("hour"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy(col("hour"))
  }

  /** x6 — exact interpolated percentiles (median/p90) of order value per
    * priority. Spark's `percentile` and DuckDB's `quantile_cont` share
    * the same linear-interpolation definition on identical sorted data,
    * so this is oracle-checkable where t-digest/approx sketches are not.
    * At 100 TB this is the op to replace with approx_percentile — exact
    * percentile materializes each group's values. */
  def x6Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90"))
      .orderBy(col("o_orderpriority"))

  /** x7 — approx percentiles, held to an oracle-checkable bound. x6's
    * exact `percentile` buffers every group value (fine for a report,
    * not for a 100 TB profile pass); `percentile_approx` is the
    * mergeable-sketch path whose state is O(accuracy) per group
    * regardless of data size. This query computes BOTH and emits
    * booleans pinning the approx within 2% relative of the exact — the
    * DuckDB oracle states the booleans as literals (the x3b/t5b
    * pattern), so a sketch regression past the bound flips a column and
    * hash-fails. The exact values double as the x6-style answer; at
    * accuracy 10000 the sketch's rank error is ≤ n/10000 — orders of
    * magnitude inside the bound at every harness SF. */
  def x7ApproxPercentileBound(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"))
      .select(col("o_orderpriority"), col("n"), col("p50"), col("p90"),
        (abs(col("a50") - col("p50")) <= col("p50") * 0.02).as("p50_ok"),
        (abs(col("a90") - col("p90")) <= col("p90") * 0.02).as("p90_ok"))
      .orderBy(col("o_orderpriority"))

  /** x8 — explicit GROUPING SETS: the general multi-level-aggregation
    * operator ROLLUP (x1) and CUBE are sugar for. The set list here —
    * (priority, status), (priority), (status) — is a cube minus the
    * grand total, a shape neither rollup nor cube can express alone.
    * Like x1, every level computes in ONE exchange (a single Expand +
    * hash aggregate), not one pass per set. `grouping()` flags
    * disambiguate a subtotal's NULL from a data NULL — the portable
    * contract (DuckDB's GROUPING() matches) — and double as the
    * deterministic sort keys. */
  def x8GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).as("g_pri"),
        grouping(col("o_orderstatus")).as("g_stat"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("g_pri"), col("g_stat"),
        coalesce(col("o_orderpriority"), lit("~")),
        coalesce(col("o_orderstatus"), lit("~")))

  /** x9 — heavy hitters: the frequent-items sketch (`approx_top_k`,
    * a datasketches ItemsSketch aggregate — mergeable fixed-size state,
    * the same scale argument as x3's HLL) gated against the exact
    * token-frequency top-20. The sketch is sized OVER the domain
    * (capacity 1000 ≫ the corpus's 31-token vocab), where the
    * datasketches frequent-items algorithm is EXACT — no item ever
    * evicts, so every estimate equals the true count deterministically.
    * That under-capacity exactness is the pinned contract
    * (`sketch_exact` must be TRUE row for row; the DuckDB oracle states
    * it as a literal over the exact counts): an eviction bug, a merge
    * bug, or a capacity regression flips a boolean and hash-mismatches.
    * Over-capacity behavior (estimates become upper bounds) is the
    * documented production regime — there the gate would move to
    * x7-style bound booleans.
    *
    * Scale shape: both branches are one exchange each off the exploded
    * scan — the sketch side aggregates to ONE mergeable state (partial
    * sketches merge map-side, like any partial agg), the exact side is
    * a 31-group token count. */
  /** x9's sketch item count. The exactness contract requires the
    * corpus vocabulary to fit inside it (otherwise the exact top-20's
    * boundary ties need not appear among the sketch's returned items);
    * the query ASSERTS that instead of assuming it, so a generator
    * vocabulary grown past this surfaces as an explicit raise, not an
    * opaque oracle hash mismatch (ADVICE r10). */
  /** Env-overridable (SPARK_GRAFT_X9_K) for the Zipf scale series ONLY:
    * a 10,000-type vocabulary needs a resized sketch or the guard below
    * fires — which is the guard doing its job, but leaves no slope to
    * measure. The driver's Verify/Bench never set the env, so the gated
    * entry and its oracle always run at the pinned default. */
  private val X9K: Int =
    sys.env.get("SPARK_GRAFT_X9_K").map { v =>
      v.trim.toIntOption.filter(_ > 0).getOrElse(sys.error(
        s"invalid SPARK_GRAFT_X9_K '$v': need a positive integer"))
    }.getOrElse(31)

  def x9HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sk = tok
      .agg(expr(s"approx_top_k(tok, $X9K, ${math.max(1000, X9K)})").as("tops"))
      .select(explode(col("tops")).as("e"))
      .select(col("e.item").as("tok"), col("e.count").as("est"))
    // the vocab-size guard rides the SAME grouped-counts pass as the
    // top-20 rank: an unpartitioned count window over the post-agg rows
    // (vocab-sized — tens of rows, one tiny exchange), not a second
    // aggregate consumer + Materialize + broadcast (that shape cost x9
    // 1.64x in r11's bench — VERDICT r11 item 4)
    // pmod(n, n) = 0 on every row (n >= 1 — it's a count): a constant
    // single-partition key the optimizer can't fold away, so WindowExec
    // doesn't log its global-window warning once per run
    val grouped = tok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("vocab_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("n"), col("n")))))
    grouped
      .orderBy(col("n").desc, col("tok").asc).limit(20)
      .join(sk, Seq("tok"), "left")
      .select(col("tok"), col("n"),
        when(
          assert_true(col("vocab_n") <= X9K,
            concat(lit(s"x9: vocabulary has "), col("vocab_n"),
              lit(s" types > sketch k=$X9K; under-capacity exactness "),
              lit("no longer holds — resize the sketch"))).isNull,
          coalesce(col("est"), lit(-1L)) === col("n")).as("sketch_exact"))
      .orderBy(col("n").desc, col("tok"))
  }

  /** x10 — the window-function gallery: the analytic-window surface the
    * reference never touches (SURVEY.md §2.6 — its only window shape is
    * top-1-per-group) exercised in one query over two DIFFERENT window
    * specs: per-customer order sequencing (row_number / lag-gap-days /
    * lead-delta over the event-time order) and per-priority distribution
    * ranks (ntile quartile, percent_rank, cume_dist over the price
    * order). Money in exact cents, dates in integer micro-days, and
    * both window orders are TOTAL (tie-broken by o_orderkey), so rank
    * functions are deterministic and DuckDB replays every value —
    * percent_rank/cume_dist included, because with no ties they are
    * pure integer-ratio divisions rounded once.
    *
    * Scale shape: two window exchanges (one per partition key) and
    * nothing else — the filter prunes at the scan. The two specs
    * deliberately differ: sequencing windows shuffle on the
    * high-cardinality customer key, distribution windows on the 5-value
    * priority key — the latter is the shape that needs range
    * partitioning at 100 TB (a 5-partition sort would bottleneck;
    * Spark's window exec sorts within hash partitions, so the knob is a
    * pre-repartitionByRange on (priority, cents), noted not needed at
    * harness scale). */
  def x10WindowGallery(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        // o_orderdate is TIMESTAMP_NTZ (micros; only events carries the
        // nanos-as-long contract); the UTC session makes the cast a pure
        // wall-clock reinterpretation, matching DuckDB's epoch_us
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("od_us"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("od_us"), col("o_orderkey"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    base
      .withColumn("order_idx", row_number().over(wSeq))
      .withColumn("gap_days",
        expr(s"(od_us - lag(od_us, 1) OVER (PARTITION BY o_custkey ORDER BY od_us, o_orderkey)) div 86400000000"))
      .withColumn("next_cents_delta",
        lead(col("cents"), 1).over(wSeq) - col("cents"))
      .withColumn("quartile", ntile(4).over(wRank))
      .withColumn("pct_rank", round(percent_rank().over(wRank), 4))
      .withColumn("cume", round(cume_dist().over(wRank), 4))
      .select(col("o_orderkey"), col("o_custkey"), col("order_idx"),
        col("gap_days"), col("next_cents_delta"), col("quartile"),
        col("pct_rank"), col("cume"))
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_rollup"          -> x1Rollup _,
    "x2_setops"          -> x2SetOps _,
    "x3_approx_distinct" -> x3ApproxDistinct _,
    "x3_approx_distinct_bounded" -> x3bApproxDistinctBounded _,
    "x4_salted_agg"      -> x4SaltedAgg _,
    "x5_pivot"           -> x5Pivot _,
    "x6_percentiles"     -> x6Percentiles _,
    "x7_approx_percentile_bound" -> x7ApproxPercentileBound _,
    "x8_grouping_sets"   -> x8GroupingSets _,
    "x9_heavy_hitters"   -> x9HeavyHitters _,
    "x10_window_gallery" -> x10WindowGallery _,
  )

  val oracleSql: Map[String, String] = Map(
    "x1_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY coalesce(o_orderpriority, '~'), coalesce(o_orderstatus, '~')""".stripMargin,
    "x2_setops" ->
      """WITH o AS (
        |  SELECT o_custkey, strftime(o_orderdate, '%Y') AS y FROM orders
        |), a AS (SELECT DISTINCT o_custkey FROM o WHERE y = '1995'),
        |     b AS (SELECT DISTINCT o_custkey FROM o WHERE y = '1996')
        |SELECT 'both_years' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'only_1995', count(*) FROM (
        |  SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'only_1996', count(*) FROM (
        |  SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
        |UNION ALL
        |SELECT 'either_year', count(*) FROM (
        |  SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
        |ORDER BY op""".stripMargin,
    "x3_approx_distinct_bounded" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS exact_custs,
        |       TRUE AS approx_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "x4_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |             / 100.0, 2) AS value_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x5_pivot" ->
      """SELECT hour(ts) AS hour,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "x6_percentiles" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "x7_approx_percentile_bound" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |       TRUE AS p50_ok, TRUE AS p90_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "x8_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |       GROUPING(o_orderpriority) AS g_pri,
        |       GROUPING(o_orderstatus) AS g_stat,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |                        (o_orderpriority), (o_orderstatus))
        |ORDER BY g_pri, g_stat, coalesce(o_orderpriority, '~'),
        |         coalesce(o_orderstatus, '~')""".stripMargin,
    // the sketch runs under capacity (vocab 31 ≪ 1000), where the
    // frequent-items algorithm is exact — so sketch_exact is TRUE by
    // contract, stated as a literal over the exact counts
    "x9_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |)
        |SELECT tok, count(*) AS n, TRUE AS sketch_exact
        |FROM t GROUP BY tok
        |ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    "x10_window_gallery" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_custkey, o_orderpriority,
        |         epoch_us(o_orderdate) AS od_us,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey < 100
        |)
        |SELECT o_orderkey, o_custkey,
        |       CAST(row_number() OVER wseq AS INT) AS order_idx,
        |       (od_us - lag(od_us) OVER wseq) // 86400000000 AS gap_days,
        |       lead(cents) OVER wseq - cents AS next_cents_delta,
        |       CAST(ntile(4) OVER wrank AS INT) AS quartile,
        |       round(percent_rank() OVER wrank, 4) AS pct_rank,
        |       round(cume_dist() OVER wrank, 4) AS cume
        |FROM b
        |WINDOW wseq AS (PARTITION BY o_custkey ORDER BY od_us, o_orderkey),
        |       wrank AS (PARTITION BY o_orderpriority
        |                 ORDER BY cents, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
