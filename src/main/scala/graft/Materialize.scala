package graft

import org.apache.spark.sql.DataFrame

/** Materialization strategy for multi-branch reuse (a DataFrame that feeds
  * several downstream branches of one query, e.g. the shingled corpus in
  * `Dedup.d3MinhashLsh`).
  *
  * Default is `.cache()` — correct and fast in a single-session run, but
  * executor-memory-resident: at 100 TB the shingled corpus does not fit in
  * cluster memory, and a production pipeline materializes the intermediate
  * instead. The `graft.materialize` system property (or the
  * `SPARK_GRAFT_MATERIALIZE` env var) switches the strategy WITHOUT
  * touching query code:
  *
  *   - `cache` (default)   — lazy in-memory/disk cache via the CacheManager
  *   - `localCheckpoint`   — truncate lineage and persist the computed
  *                           blocks via the block manager; blocks are
  *                           released when the plan is garbage-collected
  *                           (no session-lifetime CacheManager entry)
  *   - `none`              — no materialization (every branch recomputes;
  *                           useful to measure what the reuse is worth)
  *
  * DedupSpec pins that d3 under `localCheckpoint` AND under `none` returns
  * the same rows as under the default; MATBENCH.md records what each mode
  * costs at sf0.1.
  */
object Materialize {
  val Prop = "graft.materialize"

  def mode: String =
    sys.props.get(Prop).orElse(sys.env.get("SPARK_GRAFT_MATERIALIZE"))
      .getOrElse("cache")

  def apply(df: DataFrame): DataFrame = mode match {
    case "localCheckpoint" => df.localCheckpoint(false)
    case "none"            => df
    case _                 => df.cache()
  }
}
