package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's data model: the seven Stack Exchange CSV tables
  * (RDataFramesSQL.Rmd:61-67), with schemas pinned EXPLICITLY instead of
  * inferred (SURVEY.md §1.4 — nullability and the string-ness of dates
  * must not depend on sampling). All columns nullable; `CreationDate`
  * stays StringType because the reference keeps dates as strings and
  * derives the year textually (RDataFramesSQL.Rmd:75,94).
  *
  * Real dumps carry more columns than the queries touch; readers must
  * tolerate that (CSV reader matches by header name), so these schemas
  * list exactly the queried columns plus keys (FIXTURES.md §A).
  */
object StackExchange {

  val postsSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("PostTypeId", IntegerType),
    StructField("ParentId", IntegerType),
    StructField("AcceptedAnswerId", IntegerType),
    StructField("OwnerUserId", IntegerType),
    StructField("Score", IntegerType),
    StructField("FavoriteCount", IntegerType),
    StructField("AnswerCount", IntegerType),
    StructField("Title", StringType),
    StructField("CreationDate", StringType)))

  val votesSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("PostId", IntegerType),
    StructField("VoteTypeId", IntegerType),
    StructField("CreationDate", StringType)))

  val usersSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("DisplayName", StringType),
    StructField("Reputation", IntegerType),
    StructField("Age", IntegerType),
    StructField("Location", StringType)))

  val commentsSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("PostId", IntegerType),
    StructField("UserId", IntegerType),
    StructField("Score", IntegerType)))

  val badgesSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("UserId", IntegerType),
    StructField("Name", StringType),
    StructField("Class", IntegerType)))

  // loaded by the reference but never queried (SURVEY.md §1.3) —
  // registered for surface parity
  val tagsSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("TagName", StringType),
    StructField("Count", IntegerType)))

  val postLinksSchema: StructType = StructType(Seq(
    StructField("Id", IntegerType),
    StructField("PostId", IntegerType),
    StructField("RelatedPostId", IntegerType),
    StructField("LinkTypeId", IntegerType)))

  /** The seven loaded tables as one unit (the engine's working set —
    * surface parity with the reference's load of all seven,
    * RDataFramesSQL.Rmd:61-67; Tags/PostLinks are never queried). */
  case class Data(posts: DataFrame, votes: DataFrame, users: DataFrame,
      comments: DataFrame, badges: DataFrame,
      tags: Option[DataFrame] = None, postLinks: Option[DataFrame] = None) {
    /** The sqldf analogue (SURVEY.md §1.4): expose the working set to the
      * SQL front-end as temp views. */
    def register(): Unit = {
      posts.createOrReplaceTempView("Posts")
      votes.createOrReplaceTempView("Votes")
      users.createOrReplaceTempView("Users")
      comments.createOrReplaceTempView("Comments")
      badges.createOrReplaceTempView("Badges")
      tags.foreach(_.createOrReplaceTempView("Tags"))
      postLinks.foreach(_.createOrReplaceTempView("PostLinks"))
    }
  }

  private def csv(s: SparkSession, schema: StructType, path: String): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("nullValue", "")   // empty CSV field = NULL (R's NA)
      .csv(path)

  /** Load a directory of `<Table>.csv` files (the reference's read.csv
    * layout, RDataFramesSQL.Rmd:61-67). Tags/PostLinks are part of the
    * reference's load but queried by nothing, so a directory without them
    * is still a complete working set (local-path existence check only —
    * this loader is for local dumps/fixtures, not object storage). */
  def readCsvDir(s: SparkSession, dir: String): Data = {
    def optional(schema: StructType, name: String): Option[DataFrame] = {
      val path = s"$dir/$name.csv"
      if (new java.io.File(path).isFile) Some(csv(s, schema, path)) else None
    }
    Data(
      posts = csv(s, postsSchema, s"$dir/Posts.csv"),
      votes = csv(s, votesSchema, s"$dir/Votes.csv"),
      users = csv(s, usersSchema, s"$dir/Users.csv"),
      comments = csv(s, commentsSchema, s"$dir/Comments.csv"),
      badges = csv(s, badgesSchema, s"$dir/Badges.csv"),
      tags = optional(tagsSchema, "Tags"),
      postLinks = optional(postLinksSchema, "PostLinks"))
  }
}
