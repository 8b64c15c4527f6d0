package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q02RevenueByRegion(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.TemporalJoins.queries ++
    ops.Windows.queries ++ ops.SetOps.queries ++
    ops.Scalars.queries ++ ops.Analytics.queries ++
    ingest.Normalize.queries ++ ops.Merge.queries ++ ops.TextSim.queries ++
    ops.Similarity.queries ++ ops.Streaming.queries ++
    sources.FileSources.queries ++ sources.Multimodal.queries ++
    ops.Skew.queries ++ ops.Graph.queries ++ ops.Corpus.queries ++
    ops.Warehouse.queries ++ ops.Insights.queries ++ sources.JdbcSink.queries ++
    ops.IndexMaintain.queries ++
    ops.SqlText.queries ++ ops.Observe.queries ++
    sources.SnapshotStore.queries ++ ops.Bpe.queries ++ ops.Unigram.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++ ops.TemporalJoins.oracleSql ++
    ops.Windows.oracleSql ++ ops.SetOps.oracleSql ++
    ops.Scalars.oracleSql ++ ops.Analytics.oracleSql ++
    ingest.Normalize.oracleSql ++ ops.Merge.oracleSql ++ ops.TextSim.oracleSql ++
    ops.Similarity.oracleSql ++ ops.Streaming.oracleSql ++
    sources.FileSources.oracleSql ++ sources.Multimodal.oracleSql ++
    ops.Skew.oracleSql ++ ops.Graph.oracleSql ++ ops.Corpus.oracleSql ++
    ops.Warehouse.oracleSql ++ ops.Insights.oracleSql ++ sources.JdbcSink.oracleSql ++
    ops.IndexMaintain.oracleSql ++
    ops.SqlText.oracleSql ++ ops.Observe.oracleSql ++
    sources.SnapshotStore.oracleSql ++ ops.Bpe.oracleSql ++ ops.Unigram.oracleSql
}
