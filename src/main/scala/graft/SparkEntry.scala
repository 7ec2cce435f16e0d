package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.SanefQueries
import graft.multimodal.Multimodal
import graft.operators.{Classifier, Clustering, Curation, Dedup, Quality, Relational, Reshape, Sampling, Similarity, TextAnalysis, Unigram}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module registries (one entry per
  * implemented operator from SURVEY.md §2); `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's differential check. Modules keep
  * their query and oracle maps side by side so the pair can't drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The most operator-dense relational plan: 4-way join with broadcast
    * dims, grouped aggregation, deterministic ordering.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.qJoinChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Reshape.queries ++ SanefQueries.queries ++
      TextAnalysis.queries ++ Unigram.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Curation.queries ++
      Quality.queries ++ Clustering.queries ++ Sampling.queries ++
      Classifier.queries

  /** The SPARK_GRAFT_ONLY name filter shared by Bench and Verify (one
    * definition so the two mains can't interpret the env var
    * differently): unset = everything selected; set = comma-separated
    * exact query names.
    */
  def onlySelected(name: String): Boolean =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .forall(_.contains(name))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Reshape.oracles ++ SanefQueries.oracles ++
      TextAnalysis.oracles ++ Unigram.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Curation.oracles ++
      Quality.oracles ++ Clustering.oracles ++ Sampling.oracles ++
      Classifier.oracles
}
