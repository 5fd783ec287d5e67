package graft

import org.apache.spark.sql.DataFrame

import graft.queries.StackExchangeQueries._
import graft.sources.StackExchange.Data

/** Minimal Stack Exchange row shapes for the golden fixtures (field names
  * = the reference CSV column names, so `toDF` yields query-compatible
  * frames; types mirror graft.sources.StackExchange's explicit schemas). */
private[graft] object GoldenFixtures {
  case class Post(Id: Int, PostTypeId: Int, ParentId: Option[Int] = None,
      AcceptedAnswerId: Option[Int] = None, OwnerUserId: Option[Int] = None,
      Score: Option[Int] = None, FavoriteCount: Option[Int] = None,
      AnswerCount: Option[Int] = None, Title: Option[String] = None,
      CreationDate: Option[String] = None)
  case class Vote(Id: Int, PostId: Int, VoteTypeId: Int, CreationDate: String)
  case class User(Id: Int, DisplayName: String, Reputation: Int,
      Age: Option[Int], Location: Option[String])
  case class Comment(Id: Int, PostId: Int, UserId: Int, Score: Int)
  case class Badge(Id: Int, UserId: Int, Name: String, Class: Int)
}

/** The reference's RENDERED result rows — the paged-table JSON the
  * knitted HTML embeds for each exercise (RDataFramesSQL.html:1698 ex1,
  * :1825 ex2, :1969 ex3, :2107 ex4, :2252 ex5, :2365 ex6) — reproduced
  * by this engine VERBATIM, values and all.
  *
  * The original travel.stackexchange.com dump is not available, so each
  * test DERIVES a minimal input fixture from the golden rows themselves
  * (e.g. a golden Count of 70 upvotes becomes 70 planted Vote rows) and
  * plants DECOYS that every filter/join/arg-max in the query must
  * actually reject for the output to match: wrong-PostTypeId posts with
  * more votes, wrong-VoteTypeId votes, NULL favorite counts, non-owner
  * comments with huge scores, at-the-boundary filter values, over-common
  * badges, and below-cutoff LIMIT victims. Both front-ends (DataFrame
  * DSL and spark.sql) must reproduce the reference's rendered values.
  *
  * Ordering contract per exercise: the reference compares ex1/ex6
  * order-insensitively (RDataFramesSQL.Rmd:48-50). ex2/ex4 golden sort
  * keys are distinct, and ex3's within-key ties happen to be Id-ascending
  * — our documented tie-break — so those three assert row order too.
  * ex5's golden ties are in SQLite-incidental order (NOT Title-ascending:
  * score 25 lists "What's the longest…" before "Can I have a
  * watermelon…"), so ex5 asserts set equality plus a non-increasing
  * score sequence, the strongest claim both engines share. `NA` in the
  * rendered JSON is R's NA → NULL here; `''` is a genuinely empty string
  * in the source dump (R's read.csv keeps it), planted as such. */
class GoldenRowsSpec extends SparkSpec {
  import GoldenFixtures._

  // ───────────────────────── golden rows (HTML verbatim) ──────────────

  private val ex1Golden = Seq(
    ("OK we're all adults here, so really, how on earth should I use a squat toilet?", "2011", 70),
    ("How to successfully haggle / bargain in markets", "2012", 37),
    ("Why are airline passengers asked to lift up window shades during takeoff and landing?", "2013", 103),
    ("How do you know if Americans genuinely/literally mean what they say?", "2014", 180),
    ("Immigration officer that stopped me at the airport is texting me. What do I do?", "2015", 119),
    ("I don't know my nationality. How can I visit Denmark?", "2016", 135),
    ("Why prohibit engine braking?", "2017", 178))

  private val ex2Golden = Seq(
    ("Mark Mayo", Some(37), "Sydney, New South Wales, Australia", 467, "Tactics to avoid getting harassed by corrupt police?", 42),
    ("hippietrail", None, "Oaxaca, Mexico", 444, "OK we're all adults here, so really, how on earth should I use a squat toilet?", 79),
    ("RoflcoptrException", None, "", 294, "How to avoid drinking vodka?", 29),
    ("JonathanReez", Some(26), "Prague, Czech Republic", 221, "What is the highest viewing spot in London that is accessible free of charge?", 17),
    ("nsn", None, "", 214, "How do airlines determine ticket prices?", 40),
    ("Gagravarr", None, "Oxford, United Kingdom", 151, "Are there other places with gardens like those at Versailles?", 10),
    ("Andrew Grimm", Some(38), "Sydney, Australia", 120, "OK we're all nerds here, so really, how on earth should I use a Japanese toilet?", 8),
    ("VMAtm", Some(33), "Tampa, FL, United States", 109, "Is there a good website to plan a trip via trains in Europe?", 34),
    ("jrdioko", None, "", 100, "What is the most comfortable way to sleep on a plane?", 21),
    ("Gayot Fow", None, "London, United Kingdom", 98, "Should I submit bank statements when applying for a UK Visa? What do they say about me?", 18))

  private val ex3Golden = Seq(
    (250, "Which European cities have bike rental stations for tourists?", 24),
    (10, "When traveling to a country with a different currency, how should you take your money?", 20),
    (13562, "How do you choose a restaurant when travelling?", 20),
    (48775, "How can I deal with people asking to switch seats with me on a plane?", 20),
    (3220, "Why would you wrap your luggage in plastic?", 19),
    (43660, "Traveling in Europe Solo - 18 years old. Feasible?", 19),
    (30656, "Long-life SIM cards in Europe", 18),
    (7663, "Am I expected to tip wait staff in Europe?", 17),
    (59128, "Is there a way to prevent \"looking like a tourist\" in order to not be harassed?", 17),
    (60446, "Is it rude to ask if the food contains pork or alcohol?", 17))

  private val ex4Golden = Seq(
    (99713, "In Germany, what are you supposed to do if your train station doesn't have any working ticket machines?", 126, 33, 93),
    (81376, "What is way to eat rice with hands in front of westerners such that it doesn't appear to be yucky?", 120, 30, 90),
    (76737, "Why do many countries in the world still require citizens of states with a high HDI to get visas?", 118, 31, 87),
    (38177, "How do you know if Americans genuinely/literally mean what they say?", 245, 166, 79),
    (90636, "Caught speeding 111 Mph (179 km/h) in California. How can I settle the case with the court?", 101, 25, 76),
    (81492, "Why is international first class much more expensive than international economy class?", 90, 21, 69),
    (94320, "Strange looking region of France on Google Maps", 71, 7, 64),
    (80050, "What's an easy way of making my luggage unique, so that it's easy to spot on the luggage carousel?", 72, 16, 56))

  private val ex5Golden = Seq(
    ("How to intentionally get denied entry to the US, without getting into trouble?", 75),
    ("How can I deal with people asking to switch seats with me on a plane?", 32),
    ("What is France's traditional costume?", 26),
    ("What's the longest scheduled public bus ride in the world?", 25),
    ("Can I have a watermelon in hand luggage?", 25),
    ("How does President Trump's travel ban affect nationals of Iran, Iraq, Libya, Somalia, Sudan, Syria or Yemen coming to the US for tourism/transit/etc?", 25),
    ("Caught speeding 111 Mph (179 km/h) in California. How can I settle the case with the court?", 24),
    ("Returning US Citizen lost passport in Canada", 23),
    ("Legalities and safety concerns of visiting prostitutes in Amsterdam", 20),
    ("India just demonetized all Rs 500 & 1000 notes. What do I do with my leftover cash?", 20))

  private val ex6Golden = Seq(
    (108, "Ankur Banerjee", 31273, Some(27), "London, UK"),
    (19, "VMAtm", 18556, Some(33), "Tampa, FL, United States"),
    (101, "Mark Mayo", 121667, Some(37), "Sydney, New South Wales, Australia"),
    (466, "iHaveacomputer", 8360, None, "Down underer"),
    (793, "mindcorrosive", 10531, Some(32), "Bulgaria"),
    (693, "RoflcoptrException", 33300, None, ""),
    (6669, "Relaxed", 69405, None, ""),
    (1737, "Gayot Fow", 70237, None, "London, United Kingdom"),
    (39065, "Pont", 1004, None, "Austria"),
    (19400, "phoog", 34342, Some(50), "New York, NY"))

  // ───────────────────────── harness ──────────────────────────────────

  private val empty = {
    import spark.implicits._
    Data(Seq.empty[Post].toDF(), Seq.empty[Vote].toDF(),
      Seq.empty[User].toDF(), Seq.empty[Comment].toDF(),
      Seq.empty[Badge].toDF())
  }

  /** Rows as strings, NULL rendered "NA" like R's paged table. */
  private def rowsOf(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(v => if (v == null) "NA" else v.toString))

  private def sortedRows(rs: Seq[Seq[String]]): Seq[Seq[String]] =
    rs.sortBy(_.mkString(""))

  /** Run DSL and SQL front-ends on the fixture, assert both reproduce
    * the golden rows (exactly-ordered or as a set). */
  private def check(name: String, d: Data, golden: Seq[Seq[String]],
      ordered: Boolean): Unit = {
    d.register()
    for ((front, df) <- Seq("dsl" -> dsl(name)(d), "sql" -> sql(spark, name))) {
      val actual = rowsOf(df)
      if (ordered)
        assert(actual == golden, s"$name/$front diverged from golden rows")
      else
        assert(sortedRows(actual) == sortedRows(golden),
          s"$name/$front diverged from golden rows (as a set)")
    }
  }

  // ───────────────────────── fixtures + tests ─────────────────────────

  test("ex1 golden rows: per-year argmax reproduces the reference's " +
       "rendered table (RDataFramesSQL.html:1698)") {
    import spark.implicits._
    val posts = ex1Golden.zipWithIndex.flatMap { case ((title, year, _), i) =>
      Seq(
        Post(Id = 1000 + i, PostTypeId = 1, Title = Some(title)),
        // runner-up question: one vote short — argmax must beat it
        Post(Id = 2000 + i, PostTypeId = 1, Title = Some(s"runner-up $year")),
        // an ANSWER with more votes than the winner — PostTypeId filter
        Post(Id = 3000 + i, PostTypeId = 2, Title = Some(s"answer $year")))
    }
    val votes = ex1Golden.zipWithIndex.flatMap { case ((_, year, count), i) =>
      val up = (1 to count).map(_ => (1000 + i, 2)) ++
        (1 to (count - 1)).map(_ => (2000 + i, 2)) ++
        (1 to (count + 10)).map(_ => (3000 + i, 2)) ++
        // non-upvotes on the winner — VoteTypeId filter
        (1 to 5).map(_ => (1000 + i, 3))
      up.map { case (pid, vt) => (pid, vt, s"$year-06-15") }
    }.zipWithIndex.map { case ((pid, vt, d), i) => Vote(i + 1, pid, vt, d) }
    val golden = ex1Golden.map { case (t, y, c) => Seq(t, y, c.toString) }
    check("ex1", empty.copy(posts = posts.toDF(), votes = votes.toDF()),
      golden, ordered = false) // reference compares ex1 order-insensitively
  }

  test("ex2 golden rows: favorite totals + per-user argmax reproduce the " +
       "reference's rendered table incl. NA ages and empty locations " +
       "(RDataFramesSQL.html:1825)") {
    import spark.implicits._
    val users = ex2Golden.zipWithIndex.map { case ((name, age, loc, _, _, _), i) =>
      User(10 + i, name, 1000 + i, age, Some(loc))
    } :+ User(99, "decoy below the top ten", 1, None, None)
    val posts = ex2Golden.zipWithIndex.flatMap {
      case ((_, _, _, total, title, likes), i) =>
        val owner = Some(10 + i)
        val base = 5000 + i * 100
        val top = Post(Id = base, PostTypeId = 1, OwnerUserId = owner,
          FavoriteCount = Some(likes), Title = Some(title))
        // fillers make up the remaining total, each strictly below the
        // max so the argmax pick is unique (golden likes are all >= 8)
        val fillers = Iterator.iterate(total - likes)(_ - (likes - 1))
          .takeWhile(_ > 0).zipWithIndex
          .map { case (rem, j) =>
            Post(Id = base + 1 + j, PostTypeId = 1, OwnerUserId = owner,
              FavoriteCount = Some(math.min(rem, likes - 1)),
              Title = Some(s"filler $i/$j"))
          }.toSeq
        // an ANSWER with a huge favorite count — PostTypeId filter
        val answer = Post(Id = base + 90, PostTypeId = 2, OwnerUserId = owner,
          FavoriteCount = Some(9999), Title = Some(s"answer $i"))
        // a NULL-favorite question — SUM/MAX must skip it
        val nullFav = Post(Id = base + 91, PostTypeId = 1, OwnerUserId = owner,
          FavoriteCount = None, Title = Some(s"unloved $i"))
        top +: fillers :+ answer :+ nullFav
    } :+ Post(Id = 9900, PostTypeId = 1, OwnerUserId = Some(99),
      FavoriteCount = Some(1), Title = Some("decoy question"))
    val golden = ex2Golden.map { case (n, age, loc, tot, t, likes) =>
      Seq(n, age.fold("NA")(_.toString), loc, tot.toString, t, likes.toString)
    }
    check("ex2", empty.copy(posts = posts.toDF(), users = users.toDF()),
      golden, ordered = true) // golden totals are distinct
  }

  test("ex3 golden rows: positive-answer counts reproduce the reference's " +
       "rendered table, ties Id-ascending (RDataFramesSQL.html:1969)") {
    import spark.implicits._
    var nextId = 10000000
    def answer(parent: Int, score: Int): Post = {
      nextId += 1
      Post(Id = nextId, PostTypeId = 2, ParentId = Some(parent),
        Score = Some(score))
    }
    val posts = ex3Golden.flatMap { case (id, title, count) =>
      Post(Id = id, PostTypeId = 1, Title = Some(title)) +:
        ((1 to count).map(k => answer(id, 1 + k % 3)) ++
          // zero and negative scores — the Score > 0 filter
          Seq(answer(id, 0), answer(id, -3)))
    } ++ (Post(Id = 999999, PostTypeId = 1, Title = Some("decoy, rank 11")) +:
      Seq(answer(999999, 5))) // 1 positive answer: cut by LIMIT 10
    val golden = ex3Golden.map { case (id, t, c) => Seq(id.toString, t, c.toString) }
    check("ex3", empty.copy(posts = posts.toDF()), golden, ordered = true)
  }

  test("ex4 golden rows: best-vs-accepted differences reproduce the " +
       "reference's rendered table (RDataFramesSQL.html:2107)") {
    import spark.implicits._
    ex4Golden.foreach { case (_, _, maxS, accS, diff) =>
      assert(maxS - accS == diff, "golden self-consistency")
    }
    val posts = ex4Golden.flatMap { case (id, title, maxS, accS, _) =>
      Seq(
        Post(Id = id, PostTypeId = 1, Title = Some(title),
          AcceptedAnswerId = Some(id * 10)),
        Post(Id = id * 10, PostTypeId = 2, ParentId = Some(id), Score = Some(accS)),
        Post(Id = id * 10 + 1, PostTypeId = 2, ParentId = Some(id), Score = Some(maxS)))
    } ++ Seq(
      // difference exactly 50: the strict > 50 boundary
      Post(Id = 500001, PostTypeId = 1, Title = Some("boundary"),
        AcceptedAnswerId = Some(500002)),
      Post(Id = 500002, PostTypeId = 2, ParentId = Some(500001), Score = Some(10)),
      Post(Id = 500003, PostTypeId = 2, ParentId = Some(500001), Score = Some(60)),
      // accepted IS the best answer: difference 0
      Post(Id = 500011, PostTypeId = 1, Title = Some("accepted is best"),
        AcceptedAnswerId = Some(500012)),
      Post(Id = 500012, PostTypeId = 2, ParentId = Some(500011), Score = Some(80)))
    val golden = ex4Golden.map { case (id, t, m, a, d) =>
      Seq(id.toString, t, m.toString, a.toString, d.toString)
    }
    check("ex4", empty.copy(posts = posts.toDF()), golden, ordered = true)
  }

  test("ex5 golden rows: owner-comment score totals reproduce the " +
       "reference's rendered table as a set, scores non-increasing " +
       "(RDataFramesSQL.html:2252)") {
    import spark.implicits._
    var nextId = 0
    def cmt(post: Int, user: Int, score: Int): Comment = {
      nextId += 1; Comment(nextId, post, user, score)
    }
    val rows = ex5Golden.zipWithIndex
    val posts = rows.flatMap { case ((title, _), i) =>
      Seq(
        Post(Id = 8000 + i, PostTypeId = 1, OwnerUserId = Some(700 + i),
          Title = Some(title)),
        // an ANSWER owned + commented by the same user — PostTypeId filter
        Post(Id = 9000 + i, PostTypeId = 2, OwnerUserId = Some(700 + i),
          Title = Some(s"answer $i")))
    } :+ Post(Id = 8999, PostTypeId = 1, OwnerUserId = Some(699),
      Title = Some("decoy, rank 11"))
    val comments = rows.flatMap { case ((_, score), i) =>
      Seq(
        // owner's total arrives in two pieces — the SUM is real
        cmt(8000 + i, 700 + i, score - 5), cmt(8000 + i, 700 + i, 5),
        // a NON-owner's huge comment — the composite-key join must drop it
        cmt(8000 + i, 700 + ((i + 1) % 10), 500),
        // owner comment on their ANSWER — filtered with the post
        cmt(9000 + i, 700 + i, 999))
    } :+ cmt(8999, 699, 5)
    val d = empty.copy(posts = posts.toDF(), comments = comments.toDF())
    val golden = ex5Golden.map { case (t, s) => Seq(t, s.toString) }
    // golden ties sit in SQLite-incidental order (not our Title
    // tie-break), so: set equality + the non-increasing score sequence
    check("ex5", d, golden, ordered = false)
    val scores = rowsOf(dsl("ex5")(d)).map(_(1).toLong)
    assert(scores == scores.sorted.reverse, s"scores not non-increasing: $scores")
  }

  test("ex6 golden rows: rare-gold-badge holders reproduce the " +
       "reference's rendered table (RDataFramesSQL.html:2365)") {
    import spark.implicits._
    val users = ex6Golden.map { case (id, name, rep, age, loc) =>
      User(id, name, rep, age, Some(loc))
    } :+ User(77777, "decoy holder of common badges", 1, None, None)
    var nextId = 0
    def badge(user: Int, name: String, cls: Int): Badge = {
      nextId += 1; Badge(nextId, user, name, cls)
    }
    val goldenIds = ex6Golden.map(_._1)
    val badges =
      // RareA: 5 holders, RareB: 6 holders (both within BETWEEN 2 AND 10);
      // the overlap holder exercises DISTINCT
      goldenIds.take(5).map(badge(_, "RareA", 1)) ++
      goldenIds.drop(4).map(badge(_, "RareB", 1)) ++
      // a gold badge held 11 times: HAVING must reject it
      (1 to 11).map(_ => badge(77777, "CommonGold", 1)) ++
      // same NAME as a rare badge but Class 2: outer Class filter
      Seq(badge(77777, "RareA", 2),
        // held once: below the BETWEEN lower bound
        badge(77777, "Solo", 1))
    val golden = ex6Golden.map { case (id, n, rep, age, loc) =>
      Seq(id.toString, n, rep.toString, age.fold("NA")(_.toString), loc)
    }
    check("ex6", empty.copy(users = users.toDF(), badges = badges.toDF()),
      golden, ordered = false) // reference compares ex6 order-insensitively
  }
}
