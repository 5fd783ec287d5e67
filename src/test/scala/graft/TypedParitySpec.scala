package graft

import graft.queries.{RelationalQueries, TypedRelational}
import graft.testing.Comparator

/** The typed Dataset front-end must agree with the DataFrame DSL — the
  * third independent path for q3 (DSL ≡ Spark SQL ≡ typed ≡ DuckDB). */
class TypedParitySpec extends SparkSpec {
  test("q3 typed Dataset path returns identical rows to the DSL") {
    val typed = TypedRelational.q3Typed(spark, sfDir)
    val dsl = RelationalQueries.q3JoinGroupCount(spark, sfDir)
    assert(typed.columns.sameElements(dsl.columns))
    assert(Comparator.equalOrdered(typed, dsl))
  }
}
