package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Stack-Exchange-shaped data at the approximate
  * magnitude of the reference's travel.stackexchange.com dump (size
  * unspecified in the reference — BASELINE.md records that its absolute
  * timings are not directly comparable), so the six exercises can be
  * BENCHMARKED at a realistic scale rather than on the 14-row trap
  * fixtures.
  *
  * Generation is fully distributed and reproducible: every column is a
  * pure function of the row id via `xxhash64(id, salt)` — `spark.range`
  * plus codegen'd projections, no driver-side loops, no `rand()` (whose
  * values depend on partitioning). Schemas match
  * [[StackExchange]] exactly (int keys, nullable favorite counts,
  * dates as strings), and the distributions make every exercise's
  * answer non-trivial:
  *
  *   - votes are head-skewed (30% land on 100 hot posts) so Ex1's
  *     per-year arg-max has clear winners;
  *   - FavoriteCount is NULL for 1 in 4 questions (the Ex2 trap);
  *   - ~25% of comments are authored by the post's owner, replicating
  *     the owner hash formula, so Ex5's composite-key join selects a
  *     real subset;
  *   - badge names follow a long-tail distribution so Ex6's
  *     HAVING COUNT(*) BETWEEN 2 AND 10 finds genuinely rare badges.
  */
object SyntheticStackExchange {

  /** pmod(xxhash64(c, salt), m) — the one deterministic randomness
    * primitive used everywhere. */
  private def h(c: Column, salt: String, m: Long): Column =
    pmod(xxhash64(c, lit(salt)), lit(m))
  private def h(c: Column, salt: String, m: Column): Column =
    pmod(xxhash64(c, lit(salt)), m)

  /** Date string "yyyy-MM-dd" with year spread over 2011-2017 (the
    * reference output's year range, RDataFramesSQL.html:1698). */
  private def dateStr(c: Column, salt: String): Column =
    concat(
      (lit(2011) + h(c, salt + "y", 7)).cast("string"), lit("-0"),
      (lit(1) + h(c, salt + "m", 9)).cast("string"), lit("-"),
      (lit(10) + h(c, salt + "d", 19)).cast("string"))

  case class Sizes(users: Long = 100000, posts: Long = 120000,
      votes: Long = 1500000, comments: Long = 300000, badges: Long = 300000) {
    def questions: Long = posts * 3 / 10
    def scaled(f: Double): Sizes = Sizes(
      (users * f).toLong.max(10), (posts * f).toLong.max(10),
      (votes * f).toLong.max(10), (comments * f).toLong.max(10),
      (badges * f).toLong.max(10))
  }

  /** Owner of post `postId` — shared by posts and comments so that a
    * deterministic fraction of comments are self-comments (Ex5). */
  private def ownerOf(postId: Column, nUsers: Long): Column =
    (lit(1) + h(postId, "own", nUsers)).cast("int")

  def users(s: SparkSession, n: Sizes): DataFrame = {
    val id = col("id")
    s.range(n.users).select(
      (id + 1).cast("int").as("Id"),
      concat(lit("user"), id).as("DisplayName"),
      h(id, "rep", 10000).cast("int").as("Reputation"),
      when(h(id, "agenull", 4) === 0, lit(null))
        .otherwise(lit(18) + h(id, "age", 60)).cast("int").as("Age"),
      when(h(id, "locnull", 10) === 0, lit(null))
        .otherwise(concat(lit("city"), h(id, "loc", 500))).cast("string")
        .as("Location"))
  }

  def posts(s: SparkSession, n: Sizes): DataFrame = {
    val id = col("id")
    val postId = (id + 1).cast("int")
    val isQ = id < n.questions
    val nAnswers = n.posts - n.questions
    s.range(n.posts).select(
      postId.as("Id"),
      when(isQ, 1).otherwise(2).cast("int").as("PostTypeId"),
      when(isQ, lit(null)).otherwise(lit(1) + h(id, "parent", n.questions))
        .cast("int").as("ParentId"),
      // ~2/3 of questions have an accepted answer (an answer-range id)
      when(isQ && h(id, "accnull", 3) =!= 0,
        lit(n.questions + 1) + h(id, "acc", nAnswers))
        .cast("int").as("AcceptedAnswerId"),
      ownerOf(postId, n.users).as("OwnerUserId"),
      (h(id, "score", 200) - 50).cast("int").as("Score"),
      // the Ex2 trap: 1 in 4 questions has NULL FavoriteCount
      when(isQ && h(id, "favnull", 4) =!= 0, h(id, "fav", 100))
        .cast("int").as("FavoriteCount"),
      when(isQ, h(id, "ac", 10)).cast("int").as("AnswerCount"),
      when(isQ, concat(lit("Title "), postId)).cast("string").as("Title"),
      dateStr(id, "post").as("CreationDate"))
  }

  def votes(s: SparkSession, n: Sizes): DataFrame = {
    val id = col("id")
    // 30% of votes land on 100 hot posts — Zipf-ish head so per-year
    // winners are clear and the PostId group-by sees real skew
    val postId = when(h(id, "hot", 10) < 3, lit(1) + h(id, "hotpick", 100))
      .otherwise(lit(1) + h(id, "post", n.posts))
    s.range(n.votes).select(
      (id + 1).cast("int").as("Id"),
      postId.cast("int").as("PostId"),
      when(h(id, "vt", 10) < 7, 2).otherwise(3).cast("int").as("VoteTypeId"),
      dateStr(id, "vote").as("CreationDate"))
  }

  def comments(s: SparkSession, n: Sizes): DataFrame = {
    val id = col("id")
    val postId = (lit(1) + h(id, "cpost", n.posts)).cast("int")
    s.range(n.comments).select(
      (id + 1).cast("int").as("Id"),
      postId.as("PostId"),
      // ~25% self-comments: replicate the post-owner hash formula
      when(h(id, "selfc", 4) === 0, ownerOf(postId, n.users))
        .otherwise(lit(1) + h(id, "cuser", n.users))
        .cast("int").as("UserId"),
      (h(id, "cscore", 20) - 2).cast("int").as("Score"))
  }

  def badges(s: SparkSession, n: Sizes): DataFrame = {
    val id = col("id")
    // long-tail name frequencies: name k is only reachable when the first
    // draw lands >= k, so counts fall off ~ ln(300/k) — the tail names
    // genuinely occur 2..10 times (Ex6's rare-badge window)
    val nameId = h(id, "bname", h(id, "bmax", 300) + 1)
    s.range(n.badges).select(
      (id + 1).cast("int").as("Id"),
      (lit(1) + h(id, "buser", n.users)).cast("int").as("UserId"),
      concat(lit("badge"), nameId).as("Name"),
      when(h(id, "bclass", 3) === 0, 1).otherwise(lit(2) + h(id, "bc2", 2))
        .cast("int").as("Class"))
  }

  /** Generate and MATERIALIZE the five tables as parquet under `dir`
    * (benchmarks must time queries over storage, not over in-memory
    * range generators), then return readers over the written files. */
  def writeAndLoad(s: SparkSession, dir: String, n: Sizes): StackExchange.Data = {
    val tables = Seq(
      "Posts" -> posts(s, n), "Votes" -> votes(s, n), "Users" -> users(s, n),
      "Comments" -> comments(s, n), "Badges" -> badges(s, n))
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    StackExchange.Data(
      posts = s.read.parquet(s"$dir/Posts.parquet"),
      votes = s.read.parquet(s"$dir/Votes.parquet"),
      users = s.read.parquet(s"$dir/Users.parquet"),
      comments = s.read.parquet(s"$dir/Comments.parquet"),
      badges = s.read.parquet(s"$dir/Badges.parquet"))
  }
}
