package graft

import org.apache.spark.sql.Row
import graft.queries.StackExchangeQueries
import graft.sources.StackExchange
import graft.testing.Comparator

/** Reference parity on the reference's own data model: the six queries on
  * the hand-written trap fixtures (FIXTURES.md §A), each asserted through
  * the reference's methodology — SQL front-end ≡ DSL front-end with the
  * per-exercise order-sensitivity toggle — plus hand-computed goldens
  * that pin every §2.9 semantic trap. */
class StackExchangeSpec extends SparkSpec {

  lazy val data: StackExchange.Data = {
    val d = StackExchange.readCsvDir(spark, "src/test/resources/stackexchange")
    d.register()
    d
  }

  test("all six exercises: SQL front-end equals DSL front-end " +
       "(order-insensitive for ex1/ex6, sensitive otherwise)") {
    StackExchangeQueries.sqlTexts.keys.toSeq.sorted.foreach { name =>
      data.register()
      val sqlDf = StackExchangeQueries.sql(spark, name)
      val dslDf = StackExchangeQueries.dsl(name)(data)
      if (StackExchangeQueries.orderInsensitive(name))
        assert(Comparator.equalUnordered(sqlDf, dslDf), s"$name multiset differs")
      else
        assert(Comparator.equalOrdered(sqlDf, dslDf), s"$name ordered rows differ")
    }
  }

  test("ex1 golden: per-year winner; 2020 tie broken by title (trap)") {
    val got = StackExchangeQueries.ex1Dsl(data)
      .orderBy("Year").collect().toSeq
    assert(got == Seq(
      Row("Q-alpha", "2019", 3L), // answer/downvote votes excluded
      Row("Q-eps", "2020", 2L)))  // tied with Q-gamma at 2; title asc wins
  }

  test("ex2 golden: null FavoriteCount kept, null totals sort last (trap)") {
    val got = StackExchangeQueries.ex2Dsl(data).collect().toSeq
    assert(got == Seq(
      Row("Alice", 30, "Wonderland", 7L, "Q-alpha", 5),
      Row("Carol", 25, "Cove", 7L, "Q-eps", 7),
      Row("Bob", null, null, null, "Q-beta", null),
      Row("Dave", null, "Dock", null, "Q-delta", null)))
  }

  test("ex3 golden: negative-score answers excluded; zero-count question absent") {
    val got = StackExchangeQueries.ex3Dsl(data).collect().toSeq
    assert(got == Seq(
      Row(101, "Q-alpha", 2L),
      Row(102, "Q-beta", 2L),
      Row(105, "Q-eps", 2L),
      Row(103, "Q-gamma", 1L))) // 104 absent: its only answer scores -2
  }

  test("ex4 golden: strict >50 (50 excluded), unaccepted questions dropped") {
    val got = StackExchangeQueries.ex4Dsl(data).collect().toSeq
    assert(got == Seq(Row(101, "Q-alpha", 111, 60, 51)))
    // Q-beta's gap is exactly 50 -> excluded; Q-gamma has no accepted answer
  }

  test("ex5 golden: composite key rejects non-owner comments and answers") {
    val got = StackExchangeQueries.ex5Dsl(data).collect().toSeq
    assert(got == Seq(
      Row("Q-alpha", 7L),  // only Alice's own comments (9 from Bob rejected)
      Row("Q-eps", 2L),
      Row("Q-delta", -1L))) // answer-post self-comment excluded by type filter
  }

  test("ex6 golden: BETWEEN boundaries inclusive (2 and 10), silver excluded") {
    val got = StackExchangeQueries.ex6Dsl(data).collect()
      .map(_.getAs[Int]("Id")).sorted.toSeq
    assert(got == (1 to 10)) // Solo(1) and Crowd11(11) badge names excluded
  }

  test("comparator: detects multiplicity and value differences") {
    import spark.implicits._
    val a = Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((1, "x"), (2, "y"), (2, "y")).toDF("k", "v")
    assert(!Comparator.equalUnordered(a, b)) // same distinct set, diff counts
    assert(Comparator.equalUnordered(a, a))
    val withNull = Seq((1, null.asInstanceOf[String])).toDF("k", "v")
    assert(Comparator.equalUnordered(withNull, withNull)) // null-safe join
  }
}
