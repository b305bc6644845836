package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.queries ++ FiltersProjections.queries ++ Joins.queries ++
      SetOpsWindows.queries ++ Analytics.queries ++ Skew.queries ++
      Nested.queries ++
      DataProfile.queries ++ ZOrder.queries ++ Graph.queries ++
      graft.text.TextAnalysis.queries ++ graft.text.CorpusOps.queries ++
      graft.text.Repetition.queries ++ graft.text.Scrub.queries ++
      graft.dedup.Dedup.queries ++ graft.dedup.CleanCorpus.queries ++
      graft.dedup.Clusters.queries ++ graft.dedup.SemDedup.queries ++
      graft.dedup.EntityResolution.queries ++
      graft.similarity.Knn.queries ++ graft.similarity.Ivf.queries ++
      graft.similarity.Pq.queries ++
      graft.multimodal.MultimodalQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Aggregates.oracle ++ FiltersProjections.oracle ++ Joins.oracle ++
      SetOpsWindows.oracle ++ Analytics.oracle ++ Skew.oracle ++
      Nested.oracle ++
      DataProfile.oracle ++ ZOrder.oracle ++ Graph.oracle ++
      graft.text.TextAnalysis.oracle ++ graft.text.CorpusOps.oracle ++
      graft.text.Repetition.oracle ++ graft.text.Scrub.oracle ++
      graft.dedup.Dedup.oracle ++ graft.dedup.CleanCorpus.oracle ++
      graft.dedup.Clusters.oracle ++ graft.dedup.SemDedup.oracle ++
      graft.dedup.EntityResolution.oracle ++
      graft.similarity.Knn.oracle ++ graft.similarity.Ivf.oracle ++
      graft.similarity.Pq.oracle ++
      graft.multimodal.MultimodalQueries.oracle
}
