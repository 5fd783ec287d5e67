package graft

import graft.queries.{RelationalQueries, TypedRelational}
import graft.testing.Comparator

/** The typed Dataset front-end must agree with the DataFrame DSL — the
  * third independent path (DSL ≡ Spark SQL ≡ typed ≡ DuckDB) for q3, q4
  * (3-way self-join provenance — the §2.4 trap typed joins solve
  * structurally) and q5 (composite-key join). */
class TypedParitySpec extends SparkSpec {
  test("q3 typed Dataset path returns identical rows to the DSL") {
    val typed = TypedRelational.q3Typed(spark, sfDir)
    val dsl = RelationalQueries.q3JoinGroupCount(spark, sfDir)
    assert(typed.columns.sameElements(dsl.columns))
    assert(Comparator.equalOrdered(typed, dsl))
  }

  test("q4 typed Dataset path returns identical rows to the DSL") {
    val typed = TypedRelational.q4Typed(spark, sfDir)
    val dsl = RelationalQueries.q4DerivedDiffFilter(spark, sfDir)
    assert(typed.columns.sameElements(dsl.columns))
    // unbounded result (no LIMIT): distributed multiset compare plus an
    // ordered spot-check of the top rows, instead of collecting all
    assert(Comparator.equalUnordered(typed, dsl))
    assert(Comparator.equalOrdered(typed.limit(50), dsl.limit(50)))
  }

  test("q5 typed Dataset path returns identical rows to the DSL") {
    val typed = TypedRelational.q5Typed(spark, sfDir)
    val dsl = RelationalQueries.q5CompositeKeyJoin(spark, sfDir)
    assert(typed.columns.sameElements(dsl.columns))
    assert(Comparator.equalOrdered(typed, dsl))
  }
}
