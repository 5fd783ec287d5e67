package graft

import java.nio.file.Files

import graft.queries.EventQueries

class EventQueriesSpec extends SparkSpec {

  /** Planted event log (ts in NANOS, as the harness parquet stores it):
    * user 1 has two 2-event sessions separated by 31 minutes; user 2 has
    * one event. */
  lazy val plantedDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-events").toString
    def ns(sec: Long) = sec * 1000000000L
    Seq(
      (0L, ns(0), 1L, "view", 1.10, "{}"),
      (1L, ns(10), 1L, "click", 2.25, "{}"),
      (2L, ns(10 + 31 * 60), 1L, "view", 4.00, "{}"),
      (3L, ns(20 + 31 * 60), 1L, "purchase", 8.50, "{}"),
      (4L, ns(5), 2L, "signup", 0.75, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("e3 sessionize: 30-minute gap splits sessions; summaries exact") {
    val rows = EventQueries.e3Sessionize(spark, plantedDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
    assert(rows.toSeq == Seq((1L, 1L, 2L, 10L), (1L, 2L, 2L, 10L), (2L, 1L, 1L, 0L)))
  }

  test("e1 user journey: lag gaps and first/last types") {
    val rows = EventQueries.e1UserJourney(spark, plantedDir).collect()
    val u1 = rows.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.getAs[Long]("n_events") == 4)
    assert(u1.getAs[String]("first_type") == "view")
    assert(u1.getAs[String]("last_type") == "purchase")
    // gaps: 10s, 1860s, 10s -> avg 1880/3 = 626.667s, max 1860s
    assert(math.abs(u1.getAs[Double]("avg_gap_s") - 626.667) < 1e-9)
    assert(u1.getAs[Double]("max_gap_s") == 1860.0)
    val u2 = rows.find(_.getAs[Long]("user_id") == 2L).get
    assert(u2.isNullAt(u2.fieldIndex("avg_gap_s"))) // single event: no gaps
  }

  test("e2 rolling 4-row sum in exact cents") {
    val rows = EventQueries.e2RollingValue(spark, plantedDir).collect()
      .filter(_.getAs[Long]("user_id") == 1L)
      .map(_.getAs[Double]("rolling_sum"))
    // cumulative over 1.10, 2.25, 4.00, 8.50 with 4-row frame
    assert(rows.toSeq == Seq(1.10, 3.35, 7.35, 15.85))
  }

  test("e3 agrees with Spark's built-in session_window on harness data") {
    import org.apache.spark.sql.functions._
    // two INDEPENDENT sessionizations: e3's lag+cumulative-sum vs the
    // native session_window operator. Boundary note: session_window merges
    // on gap < 30min (strict) while e3 merges on gap <= 30min — identical
    // unless a gap is EXACTLY 30min, impossible-in-practice with ns data.
    val rawEv = graft.sources.Tables.events(spark, sfDir)
    val builtIn = rawEv
      .withColumn("ts_us", graft.sources.Tables.eventsTsUs(rawEv))
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ours = graft.queries.EventQueries.e3Sessionize(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(ours == builtIn,
      s"only-in-ours=${(ours -- builtIn).take(3)} only-in-builtin=${(builtIn -- ours).take(3)}")
  }

  test("e7 range join: widened windows capture events from neighbor " +
       "buckets through the residual filter; counts hand-verified") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e7").toString
    // ts column is long nanos; buckets are 600s of micros. Bucket 100
    // holds 5 events, bucket 101 holds 2, bucket 105 holds 1 — fewer
    // than the limit-12, so every bucket becomes a window.
    def ns(bkt: Long, offSec: Long) = (bkt * 600L + offSec) * 1000000000L
    val rows = Seq(
      (0L, ns(100, 0), 1L, "a", 0.0, "{}"),
      (1L, ns(100, 100), 1L, "b", 0.0, "{}"),
      (2L, ns(100, 200), 2L, "a", 0.0, "{}"),
      (3L, ns(100, 300), 3L, "a", 0.0, "{}"),   // in win(101)'s lead-in too
      (4L, ns(100, 400), 3L, "c", 0.0, "{}"),   // in win(101)'s lead-in too
      (5L, ns(101, 0), 4L, "a", 0.0, "{}"),     // in win(100)'s tail too
      (6L, ns(101, 100), 4L, "b", 0.0, "{}"),   // in win(100)'s tail too
      (7L, ns(105, 50), 9L, "z", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.e7RangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (100L, 7L, 4L, 3L),   // own 5 + first 300s of bucket 101
      (101L, 4L, 2L, 3L),   // own 2 + last 300s of bucket 100
      (105L, 1L, 1L, 1L)))
  }

  test("e8 funnel: stages must advance strictly in order — a click " +
       "BEFORE the first view cannot convert; the planted log shows " +
       "view->click->purchase only for the user who did them in order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e8").toString
    def ns(sec: Long) = sec * 1000000000L
    Seq(
      // user 1: full ordered funnel -> reached 3
      (0L, ns(0), 1L, "view", 0.0, "{}"),
      (1L, ns(10), 1L, "click", 0.0, "{}"),
      (2L, ns(20), 1L, "purchase", 0.0, "{}"),
      // user 2: click precedes the only view -> stuck at 1 despite
      // having all three types (the per-type-min wrong answer says 3)
      (3L, ns(0), 2L, "click", 0.0, "{}"),
      (4L, ns(10), 2L, "purchase", 0.0, "{}"),
      (5L, ns(20), 2L, "view", 0.0, "{}"),
      // user 3: view then purchase, never a click -> 1
      (6L, ns(0), 3L, "view", 0.0, "{}"),
      (7L, ns(10), 3L, "purchase", 0.0, "{}"),
      // user 4: no view at all -> 0
      (8L, ns(0), 4L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.e8Funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1L, 3), (2L, 1), (3L, 1), (4L, 0)))
  }

  test("e9 cohort retention: offsets from each user's first-seen day; " +
       "offset-0 cell counts the whole cohort") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e9").toString
    def dayNs(d: Long, sec: Long) = (d * 86400L + sec) * 1000000000L
    Seq(
      // cohort day 0: users 1,2; user 1 returns day 1 and 3, user 2 never
      (0L, dayNs(0, 10), 1L, "view", 0.0, "{}"),
      (1L, dayNs(0, 99), 1L, "click", 0.0, "{}"), // same day, 1 row after DISTINCT
      (2L, dayNs(1, 5), 1L, "view", 0.0, "{}"),
      (3L, dayNs(3, 5), 1L, "view", 0.0, "{}"),
      (4L, dayNs(0, 20), 2L, "view", 0.0, "{}"),
      // cohort day 2: user 3, returns day 3
      (5L, dayNs(2, 0), 3L, "view", 0.0, "{}"),
      (6L, dayNs(3, 0), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.e9CohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (2L, 0L, 1L), (2L, 1L, 1L)))
  }

  test("e8 on a randomized log: the engine funnel equals a driver-side " +
       "fold over each user's time-sorted events (200 users, seed 1234)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = (0 until 2000).map { i =>
      (i.toLong, rnd.nextLong(1000000L) * 1000000000L,
        rnd.nextInt(200).toLong, types(rnd.nextInt(types.length)), 0.0, "{}")
    }
    val dir = Files.createTempDirectory("graft-e8-rand").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val expected = rows
      .groupBy(_._3).view.mapValues { evs =>
        evs.sortBy(e => (e._2 / 1000, e._1)) // (ts_us, event_id) order
          .foldLeft(0) { (st, e) =>
            (st, e._4) match {
              case (0, "view") => 1
              case (1, "click") => 2
              case (2, "purchase") => 3
              case _ => st
            }
          }
      }.toMap
    val got = EventQueries.e8Funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == expected)
  }

  test("e10 rolling active: WAU counts a user once per trailing window, " +
       "DAU/WAU on a hand-computed log") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e10").toString
    def dayNs(d: Long, sec: Long) = (d * 86400L + sec) * 1000000000L
    Seq(
      (0L, dayNs(0, 1), 1L, "view", 0.0, "{}"),
      (1L, dayNs(0, 2), 1L, "view", 0.0, "{}"), // same user+day: counts once
      (2L, dayNs(0, 3), 2L, "view", 0.0, "{}"),
      (3L, dayNs(1, 1), 1L, "view", 0.0, "{}"),
      (4L, dayNs(8, 1), 3L, "view", 0.0, "{}")) // outside day 1's window
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.e10RollingActive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, 1.0),   // window [-6..0] = {1,2}
      (1L, 1L, 2L, 0.5),   // window [-5..1] = {1,2}, active today: {1}
      (8L, 1L, 1L, 1.0)))  // day 8's window misses days 0-1 entirely
  }

  test("e4 hourly mix shares sum to 1 per hour on harness data") {
    val rows = EventQueries.e4HourlyMix(spark, sfDir).collect()
    val byHour = rows.groupBy(_.getAs[Int]("hour"))
    byHour.foreach { case (h, rs) =>
      val total = rs.map(_.getAs[Double]("hour_share")).sum
      assert(math.abs(total - 1.0) < 0.01, s"hour $h shares sum to $total")
    }
  }

  test("e11 transition matrix: hand-computed counts and row-normalized " +
       "probabilities; first events excluded") {
    val rows = EventQueries.e11TransitionMatrix(spark, plantedDir).collect()
      .map(r => (r.getAs[String]("prev"), r.getAs[String]("next"),
        r.getAs[Long]("n_trans"), r.getAs[Long]("n_from"),
        r.getAs[Double]("p_trans")))
    // user 1: view->click->view->purchase; user 2: signup only (no
    // transitions). From "view": click and purchase, 1 each of 2.
    assert(rows.toSeq == Seq(
      ("click", "view", 1L, 1L, 1.0),
      ("view", "click", 1L, 2L, 0.5),
      ("view", "purchase", 1L, 2L, 0.5)))
  }

  test("e12 journey entropy: hand-computed quantized bits; transitionless " +
       "users excluded; a deterministic journey scores zero") {
    val rows = EventQueries.e12JourneyEntropy(spark, plantedDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_trans"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("bits_sum"),
        r.getAs[Double]("mean_bits")))
    // user 1 (view->click->view->purchase): from "view" two equally
    // likely nexts (1 bit each), from "click" one (0 bits) ->
    // bits_sum 2 over 3 transitions; user 2 (signup only) has no
    // transitions and no row
    assert(rows.toSeq == Seq((1L, 3L, 3L, 2L, 0.6667)))

    // a strictly alternating bot: every prev has exactly one next
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e12-bot").toString
    (0L to 5L).map(i =>
      (i, i * 1000000000L, 9L, if (i % 2 == 0) "ping" else "pong", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bot = EventQueries.e12JourneyEntropy(spark, dir).collect()
    assert(bot.length == 1 && bot.head.getAs[Long]("n_trans") == 5L &&
      bot.head.getAs[Long]("bits_sum") == 0L &&
      bot.head.getAs[Double]("mean_bits") == 0.0)
  }
}
