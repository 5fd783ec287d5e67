package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.StackExchange.Data

/** The reference's six queries (RDataFramesSQL.Rmd "Zadanie 1–6"),
  * reference-exact on the Stack Exchange schema, each implemented through
  * BOTH front-ends — `spark.sql` text (the sqldf analogue) and the
  * DataFrame DSL (the dplyr analogue) — exactly the multi-dialect +
  * equality-check methodology of the reference (SURVEY.md §5).
  * StackExchangeSpec asserts SQL ≡ DSL per exercise, order-insensitive
  * for Ex1/Ex6 and order-sensitive otherwise, mirroring the reference's
  * `all_equal(..., ignore_row_order=)` toggle (RDataFramesSQL.Rmd:48-54).
  *
  * Deviations from the verbatim sqldf text, all documented in SURVEY.md:
  *   - SQLite's bare-column-with-MAX arg-max (Ex1/Ex2) becomes a
  *     deterministic `row_number` pick (SURVEY §2.5);
  *   - ties get explicit unique tie-break keys so both front-ends agree
  *     even on tie-heavy fixture data (the reference's data had no ties,
  *     RDataFramesSQL.html:1808);
  *   - Ex4's alias-in-WHERE (`WHERE Difference > 50`, a SQLite extension
  *     at RDataFramesSQL.Rmd:411) is rewritten as a repeated expression —
  *     the documented Spark rewrite (SURVEY §2.2);
  *   - year extraction is `substring(CreationDate, 1, 4)`, returning
  *     StringType like SQLite's STRFTIME (SURVEY §1.4).
  */
object StackExchangeQueries {

  // ───────────────────────── Ex1: most-upvoted question per year ──────

  /** RDataFramesSQL.Rmd:74-82. */
  val ex1Sql: String =
    """WITH UpVotesPerYear AS (
      |  SELECT PostId, substring(CreationDate, 1, 4) AS Year, COUNT(*) AS Count
      |  FROM Votes WHERE VoteTypeId = 2
      |  GROUP BY PostId, substring(CreationDate, 1, 4)
      |), Ranked AS (
      |  SELECT Posts.Title, UpVotesPerYear.Year, UpVotesPerYear.Count,
      |         ROW_NUMBER() OVER (PARTITION BY UpVotesPerYear.Year
      |           ORDER BY UpVotesPerYear.Count DESC, Posts.Title ASC) AS rn
      |  FROM UpVotesPerYear
      |  JOIN Posts ON Posts.Id = UpVotesPerYear.PostId
      |  WHERE Posts.PostTypeId = 1
      |)
      |SELECT Title, Year, Count FROM Ranked WHERE rn = 1""".stripMargin

  /** dplyr path, RDataFramesSQL.Rmd:106-118. */
  def ex1Dsl(d: Data): DataFrame = {
    val upvotes = d.votes
      .filter(col("VoteTypeId") === 2)
      .withColumn("Year", substring(col("CreationDate"), 1, 4))
      .groupBy(col("PostId"), col("Year"))
      .agg(count(lit(1)).cast("long").as("Count"))
    val questions = d.posts.filter(col("PostTypeId") === 1)
      .select(col("Id"), col("Title"))
    val w = Window.partitionBy(col("Year"))
      .orderBy(col("Count").desc, col("Title").asc)
    upvotes.join(questions, questions("Id") === upvotes("PostId"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("Title"), col("Year"), col("Count"))
  }

  // ──────────────── Ex2: top-10 users by total favorites ──────────────

  /** RDataFramesSQL.Rmd:175-182. Oracle keeps NULL-FavoriteCount rows
    * (no IS NOT NULL filter) — NULL totals sort last under DESC in both
    * SQLite and Spark (SURVEY §2.9-Ex2). */
  val ex2Sql: String =
    """WITH Agg AS (
      |  SELECT OwnerUserId,
      |         SUM(FavoriteCount) AS FavoriteTotal,
      |         MAX(FavoriteCount) AS MostFavoriteQuestionLikes
      |  FROM Posts WHERE PostTypeId = 1 GROUP BY OwnerUserId
      |), Top AS (
      |  SELECT OwnerUserId, Title AS MostFavoriteQuestion FROM (
      |    SELECT OwnerUserId, Title,
      |           ROW_NUMBER() OVER (PARTITION BY OwnerUserId
      |             ORDER BY FavoriteCount DESC NULLS LAST, Id ASC) AS rn
      |    FROM Posts WHERE PostTypeId = 1
      |  ) WHERE rn = 1
      |)
      |SELECT u.DisplayName, u.Age, u.Location, a.FavoriteTotal,
      |       t.MostFavoriteQuestion, a.MostFavoriteQuestionLikes
      |FROM Agg a
      |JOIN Top t ON a.OwnerUserId = t.OwnerUserId
      |JOIN Users u ON u.Id = a.OwnerUserId
      |ORDER BY a.FavoriteTotal DESC, u.DisplayName ASC
      |LIMIT 10""".stripMargin

  def ex2Dsl(d: Data): DataFrame = {
    val questions = d.posts.filter(col("PostTypeId") === 1)
    val agg = questions.groupBy(col("OwnerUserId"))
      .agg(
        sum(col("FavoriteCount")).as("FavoriteTotal"),
        max(col("FavoriteCount")).as("MostFavoriteQuestionLikes"))
    val w = Window.partitionBy(col("OwnerUserId"))
      .orderBy(col("FavoriteCount").desc_nulls_last, col("Id").asc)
    val top = questions
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("OwnerUserId").as("t_owner"),
        col("Title").as("MostFavoriteQuestion"))
    agg.join(top, agg("OwnerUserId") === col("t_owner"))
      .join(d.users, d.users("Id") === agg("OwnerUserId"))
      .orderBy(col("FavoriteTotal").desc, col("DisplayName").asc)
      .limit(10)
      .select(col("DisplayName"), col("Age"), col("Location"),
        col("FavoriteTotal"), col("MostFavoriteQuestion"),
        col("MostFavoriteQuestionLikes"))
  }

  // ─── Ex3: top-10 questions by count of positively-scored answers ────

  /** RDataFramesSQL.Rmd:288-299 — the minimum end-to-end slice. */
  val ex3Sql: String =
    """SELECT Posts.Id, Posts.Title, Posts2.PositiveAnswerCount
      |FROM Posts JOIN (
      |  SELECT ParentId, COUNT(*) AS PositiveAnswerCount
      |  FROM Posts WHERE PostTypeId = 2 AND Score > 0
      |  GROUP BY ParentId
      |) Posts2 ON Posts.Id = Posts2.ParentId
      |ORDER BY Posts2.PositiveAnswerCount DESC, Posts.Id ASC
      |LIMIT 10""".stripMargin

  def ex3Dsl(d: Data): DataFrame = {
    val positive = d.posts
      .filter(col("PostTypeId") === 2 && col("Score") > 0)
      .groupBy(col("ParentId"))
      .agg(count(lit(1)).cast("long").as("PositiveAnswerCount"))
    d.posts.select(col("Id"), col("Title"))
      .join(positive, col("Id") === positive("ParentId"))
      .orderBy(col("PositiveAnswerCount").desc, col("Id").asc)
      .limit(10)
      .select(col("Id"), col("Title"), col("PositiveAnswerCount"))
  }

  // ───── Ex4: best answer beats accepted answer by more than 50 ───────

  /** RDataFramesSQL.Rmd:395-413; alias-in-WHERE rewritten (SURVEY §2.2). */
  val ex4Sql: String =
    """WITH BestAnswers AS (
      |  SELECT ParentId, MAX(Score) AS MaxScore
      |  FROM Posts WHERE PostTypeId = 2 GROUP BY ParentId
      |)
      |SELECT q.Id, q.Title, b.MaxScore, acc.Score AS AcceptedScore,
      |       b.MaxScore - acc.Score AS Difference
      |FROM BestAnswers b
      |JOIN Posts q ON q.Id = b.ParentId AND q.PostTypeId = 1
      |JOIN Posts acc ON q.AcceptedAnswerId = acc.Id
      |WHERE b.MaxScore - acc.Score > 50
      |ORDER BY b.MaxScore - acc.Score DESC, q.Id ASC""".stripMargin

  def ex4Dsl(d: Data): DataFrame = {
    // three roles of Posts in one query — the §2.4 self-join-provenance
    // trap: explicit .as() aliases + qualified refs are mandatory, or
    // Spark's DetectAmbiguousSelfJoin (rightly) rejects the plan
    val best = d.posts.filter(col("PostTypeId") === 2)
      .groupBy(col("ParentId"))
      .agg(max(col("Score")).as("MaxScore")).as("b")
    val q = d.posts.filter(col("PostTypeId") === 1)
      .select(col("Id"), col("Title"), col("AcceptedAnswerId")).as("q")
    val acc = d.posts.select(col("Id"), col("Score")).as("acc")
    best
      .join(q, col("q.Id") === col("b.ParentId"))
      .join(acc, col("q.AcceptedAnswerId") === col("acc.Id"))
      .withColumn("Difference", col("b.MaxScore") - col("acc.Score"))
      .filter(col("Difference") > 50)
      .select(col("q.Id").as("Id"), col("q.Title").as("Title"),
        col("b.MaxScore").as("MaxScore"),
        col("acc.Score").as("AcceptedScore"), col("Difference"))
      .orderBy(col("Difference").desc, col("Id").asc)
  }

  // ──── Ex5: top-10 question titles by self-comment score total ───────

  /** RDataFramesSQL.Rmd:521-533 — composite-key join: comments count only
    * when the commenter OWNS the post. */
  val ex5Sql: String =
    """WITH CmtTotScr AS (
      |  SELECT PostId, UserId, SUM(Score) AS CommentsTotalScore
      |  FROM Comments GROUP BY PostId, UserId
      |)
      |SELECT Posts.Title, CmtTotScr.CommentsTotalScore
      |FROM CmtTotScr
      |JOIN Posts ON Posts.Id = CmtTotScr.PostId
      |          AND Posts.OwnerUserId = CmtTotScr.UserId
      |WHERE Posts.PostTypeId = 1
      |ORDER BY CmtTotScr.CommentsTotalScore DESC, Posts.Title ASC
      |LIMIT 10""".stripMargin

  def ex5Dsl(d: Data): DataFrame = {
    val cmt = d.comments
      .groupBy(col("PostId"), col("UserId"))
      .agg(sum(col("Score")).as("CommentsTotalScore"))
    val questions = d.posts.filter(col("PostTypeId") === 1)
      .select(col("Id"), col("OwnerUserId"), col("Title"))
    cmt.join(questions,
        questions("Id") === cmt("PostId") &&
          questions("OwnerUserId") === cmt("UserId"))
      .orderBy(col("CommentsTotalScore").desc, col("Title").asc)
      .limit(10)
      .select(col("Title"), col("CommentsTotalScore"))
  }

  // ──────────── Ex6: users holding rare gold badges ───────────────────

  /** RDataFramesSQL.Rmd:612-628 — IN-subquery with HAVING BETWEEN,
    * SELECT DISTINCT. COUNT(*) counts badge ROWS (the reference's
    * semantics), not distinct holders. */
  val ex6Sql: String =
    """SELECT DISTINCT Users.Id, Users.DisplayName, Users.Reputation,
      |                Users.Age, Users.Location
      |FROM Badges
      |JOIN Users ON Badges.UserId = Users.Id
      |WHERE Badges.Class = 1 AND Badges.Name IN (
      |  SELECT Name FROM Badges WHERE Class = 1
      |  GROUP BY Name HAVING COUNT(*) BETWEEN 2 AND 10
      |)""".stripMargin

  def ex6Dsl(d: Data): DataFrame = {
    val gold = d.badges.filter(col("Class") === 1)
    val rare = gold.groupBy(col("Name"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(2, 10))
      .select(col("Name"))
    val holders = gold.join(rare, Seq("Name"), "left_semi")
      .select(col("UserId")) // drop Badges.Id so Users.Id stays unambiguous
    holders.join(d.users, d.users("Id") === col("UserId"))
      .select(col("Id"), col("DisplayName"), col("Reputation"),
        col("Age"), col("Location"))
      .distinct()
  }

  /** Both front-ends, by exercise. SQL front-end requires `data.register()`
    * on the session first (the sqldf copy-in analogue). */
  val sqlTexts: Map[String, String] = Map(
    "ex1" -> ex1Sql, "ex2" -> ex2Sql, "ex3" -> ex3Sql,
    "ex4" -> ex4Sql, "ex5" -> ex5Sql, "ex6" -> ex6Sql)

  val dsl: Map[String, Data => DataFrame] = Map(
    "ex1" -> ex1Dsl _, "ex2" -> ex2Dsl _, "ex3" -> ex3Dsl _,
    "ex4" -> ex4Dsl _, "ex5" -> ex5Dsl _, "ex6" -> ex6Dsl _)

  /** Which exercises the reference compares order-insensitively
    * (RDataFramesSQL.Rmd:48-50,160-162,696-697). */
  val orderInsensitive: Set[String] = Set("ex1", "ex6")

  def sql(s: SparkSession, name: String): DataFrame = s.sql(sqlTexts(name))
}
