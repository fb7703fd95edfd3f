package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Attribution, Behavioral, Curation, Exporter, Formats, GraphEval, Hypothesis, Inference, Layout, Materialize, Mining, Modeling, PipelineQueries, Privacy, Ranking, Recommend, Relational, Reliability, Robust, ScalePipeline, SeriesStats, Structure, TextVector, Uncertainty}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: relational (SURVEY §2),
  * LLM-data-pipeline (dedup / similarity / text analysis), and the
  * outbreak ML pipeline. Every SQL-expressible entry has a DuckDB oracle
  * in `oracleSql`; rows-only entries (ML, LSH-ANN, SimHash, multimodal)
  * intentionally omit one.
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end batch capability (EP3) — daily
    * series → detrend → pivot → features → KMeans anomaly scores — run on
    * the sf0.001 events table. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.outbreakScores(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TextVector.defs ++ PipelineQueries.defs ++
      Curation.defs ++ Behavioral.defs ++ ScalePipeline.defs ++
      Analytics.defs ++ Modeling.defs ++ Exporter.defs ++ Mining.defs ++
      Inference.defs ++ Privacy.defs ++ GraphEval.defs ++
      Reliability.defs ++ Layout.defs ++ Uncertainty.defs ++
      SeriesStats.defs ++ Recommend.defs ++ Ranking.defs ++
      Hypothesis.defs ++ Materialize.defs ++ Attribution.defs ++
      Structure.defs ++ Robust.defs ++ Formats.defs

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextVector.oracles ++ PipelineQueries.oracles ++
      Curation.oracles ++ Behavioral.oracles ++ ScalePipeline.oracles ++
      Analytics.oracles ++ Modeling.oracles ++ Exporter.oracles ++
      Mining.oracles ++ Inference.oracles ++ Privacy.oracles ++
      GraphEval.oracles ++ Reliability.oracles ++ Layout.oracles ++
      Uncertainty.oracles ++ SeriesStats.oracles ++ Recommend.oracles ++
      Ranking.oracles ++ Hypothesis.oracles ++ Materialize.oracles ++
      Attribution.oracles ++ Structure.oracles ++ Robust.oracles ++
      Formats.oracles
}
