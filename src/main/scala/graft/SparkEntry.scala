package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in `graft.queries.*` packs (one `Q` per operator
  * from SURVEY.md §2 plus extension ops); this object just flattens them
  * into the driver's Map shape.
  */
object SparkEntry {

  /** All registered query packs. Order is presentation-only. */
  def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    VariantQueries,
    GovernanceQueries,
    PipelineQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    MultimodalQueries,
    EventQueries,
    SamplingQueries,
    RetrievalQueries,
    CorpusPipelineQueries)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The secure-view aggregate — the reference's step-7 payoff
    * (dp_demo.sql:267-270), touching scan/join/like/mask/agg/sort.
    */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "g1_secure_view_agg").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
