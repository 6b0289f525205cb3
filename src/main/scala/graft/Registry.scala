package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name     key in `SparkEntry.queries`
  * @param oracle   equivalent ANSI SQL for DuckDB 1.0 over the same parquet
  *                 tables (bare table names, per the driver contract
  *                 example); None for non-SQL-expressible ops (driver then
  *                 records a weaker rows-only check).
  * @param run      lazy plan constructor — must be deterministic and end in
  *                 a total-order sort (SURVEY §2.9.1).
  * @param memoizes true when `run` caches driver-side state keyed on the
  *                 input fingerprint (cluster labels, the stream-parity
  *                 report), so a SECOND run in the same JVM measures the
  *                 memo hit, not the plan — the bench's min-of-2 pass
  *                 skips these. Set it on any new memoizing row; a stale
  *                 flag silently corrupts min2's attribution.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    memoizes: Boolean = false
)

/** Central operator registry. `SparkEntry.queries`/`oracleSql` derive from
  * this list, so adding an operator = adding one `Q` here.
  */
object Registry {
  def all: Seq[Q] =
    operators.Scans.qs ++
      operators.ProjFilter.qs ++
      operators.Joins.qs ++
      operators.Aggregates.qs ++
      operators.Windows.qs ++
      operators.SortSetOps.qs ++
      functions.Scalars.qs ++
      operators.TimeSeries.qs ++
      operators.Dedup.qs ++
      operators.Similarity.qs ++
      operators.TextAnalysis.qs ++
      operators.Multimodal.qs ++
      operators.Extras.qs ++
      operators.Graph.qs ++
      operators.Maintenance.qs ++
      operators.Sampling.qs ++
      operators.Profiling.qs ++
      operators.SqlSurface.qs ++
      operators.Advanced.qs ++
      operators.Ml.qs ++
      operators.Typed.qs ++
      functions.Udx.qs ++
      operators.StreamEquivalence.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  /** Drop every driver-side memo a `memoizes = true` row serves from
    * (cluster labels, the stream-parity verdicts). The bench's
    * memo-cleared second-run pass uses this so a memoized row's second
    * reading measures the RECOMPUTE, not the memo hit. Memo sites
    * self-register in [[Memos]] at object init, so this can never drift
    * from the cache list (ADVICE r13); `all` is forced first so every
    * operator object — and therefore every registration — has run.
    * MemoCouplingSpec pins the remaining flag↔cache coupling. */
  def clearMemos(): Unit = {
    all
    Memos.clearAll()
  }
}
