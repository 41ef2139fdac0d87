package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator
  * inventory) and §3.1 (the three graded entry points).
  */
object SparkEntry {

  /** Every implemented category bundle (SURVEY.md §2.1–§2.10). */
  private val sets: Seq[QSet] = Seq(
    ScanQueries,
    FilterQueries,
    FnQueries,
    AggQueries,
    JoinQueries,
    WindowQueries,
    SortSetQueries,
    DedupQueries,
    TextQueries,
    UdfQueries,
    StreamQueries,
    MiscQueries,
    ExtQueries,
    AuditQueries,
    PipelineQueries,
    TpchQueries,
    AnalyticsQueries,
    ScaleOpsQueries,
    CorpusOpsQueries,
    WarehouseQueries,
    StatGraphQueries,
    EntityOpsQueries,
    MlOpsQueries,
    GraphMediaQueries,
    SearchStatsQueries,
    ExperimentQueries,
    MlEvalQueries,
    RecEvalQueries,
    PatternQueries,
    GovernanceQueries,
    FeatureQueries,
    AuditOpsQueries,
    EmbAuditQueries,
    RankStatsQueries,
    AssocStatsQueries,
    RobustStatsQueries,
    DecompQueries,
    DivergenceQueries,
    ControlQueries,
    EvalGraphQueries,
    VarianceSeqQueries,
    KnnOpsQueries,
    SignalQueries,
    MonitorQueries,
    RetentionEvalQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys = declared non-oracle ops. */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracle).toMap
}
