package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Dedup, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 registers a [[NamedQuery]]
  * in [[Registry.all]]; `queries`/`oracleSql` are derived views of that
  * registry so the two maps can never drift apart.
  */
object Registry {
  def all: Seq[NamedQuery] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ graft.multimodal.Multimodal.queries ++
      graft.analytics.Extended.queries ++ graft.analytics.IvfIndex.queries ++
      graft.analytics.RatingsSummary.queries ++ graft.analytics.TrainingData.queries ++
      graft.analytics.RangeJoin.queries ++ graft.warehouse.ZOrder.queries ++
      graft.analytics.EventAnalytics.queries ++ graft.warehouse.Scd2.queries ++
      graft.warehouse.QuantileState.queries ++ graft.analytics.Profile.queries ++
      graft.analytics.Retrieval.queries ++ graft.analytics.TimeSeries.queries ++
      graft.analytics.GraphRank.queries ++ graft.warehouse.TableDiff.queries ++
      graft.analytics.FrequencySketches.queries ++ graft.warehouse.MomentsState.queries ++
      graft.analytics.Statistics.queries ++ graft.warehouse.FrequentItemsState.queries ++
      graft.analytics.PqIndex.queries ++ graft.analytics.Pca.queries ++
      graft.warehouse.SkylineState.queries ++ graft.warehouse.CovarianceState.queries ++
      graft.warehouse.RetrievalIndex.queries ++ graft.warehouse.DedupIndex.queries ++
      graft.analytics.ModelEval.queries ++ graft.warehouse.DriftState.queries ++
      graft.analytics.Linkage.queries ++ graft.warehouse.EvalState.queries ++
      graft.warehouse.IvfState.queries ++ graft.warehouse.PqState.queries ++
      graft.analytics.IvfPq.queries ++ graft.warehouse.IvfPqState.queries ++
      graft.warehouse.ComponentsState.queries ++ graft.analytics.SqIndex.queries ++
      graft.warehouse.SqState.queries ++ graft.analytics.BitIndex.queries ++
      graft.analytics.Mips.queries ++ graft.warehouse.BitState.queries ++
      graft.warehouse.MipsState.queries
}

object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.customerReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
