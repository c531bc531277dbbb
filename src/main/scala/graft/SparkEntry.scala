package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from
  * SURVEY.md §2; entries with an exact ANSI-SQL equivalent also appear
  * in [[oracleSql]] (DuckDB runs it on the same parquet tables and
  * hash-compares). Column names are aliased identically on both sides —
  * the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship: connected components of the sf0.001 co-purchase graph. */
  def entry(spark: SparkSession): DataFrame =
    CCQueries.ccCopurchase(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "cc_copurchase" -> (CCQueries.ccCopurchase _),
      "cc_components" -> (CCQueries.ccCopurchaseComponents _),
      "cc_graphx" -> (CCQueries.ccGraphx _),
      "cc_percolation" -> (CCQueries.ccPercolation _),
    ) ++ RelationalQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ TextQueries.all ++ PipelineQueries.all ++
      IoQueries.all ++ GraphQueries.all ++ StatsQueries.all ++
      SketchQueries.all ++ MatchQueries.all ++ EventQueries.all ++
      GeoQueries.all ++
      graft.streaming.StreamingQueries.all ++
      graft.multimodal.MultimodalQueries.all

  def oracleSql: Map[String, String] = Map(
    "cc_copurchase" -> CCQueries.copurchaseOracle,
    "cc_components" -> CCQueries.copurchaseComponentsOracle,
    "cc_graphx" -> CCQueries.copurchaseOracle,
    "cc_percolation" -> CCQueries.ccPercolationOracle,
  ) ++ RelationalQueries.oracles ++ DedupQueries.oracles ++
    SimilarityQueries.oracles ++ TextQueries.oracles ++ PipelineQueries.oracles ++
    IoQueries.oracles ++ GraphQueries.oracles ++ StatsQueries.oracles ++
    SketchQueries.oracles ++ MatchQueries.oracles ++ EventQueries.oracles ++
    GeoQueries.oracles ++
    graft.streaming.StreamingQueries.oracles ++
    graft.multimodal.MultimodalQueries.oracles
}
