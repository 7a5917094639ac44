package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families live in `graft.queries.*`; this object is the single
  * registry the driver's Verify/Bench mains consume. Every query takes
  * (spark, sfDir) and returns a DataFrame whose column names match the
  * paired DuckDB oracle exactly (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytic.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.DedupOps.queries ++
      graft.queries.MultimodalOps.queries ++
      graft.queries.SimilarityOps.queries ++
      graft.queries.Extended.queries ++
      graft.queries.TypedOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Analytic.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.DedupOps.oracle ++
      graft.queries.MultimodalOps.oracle ++
      graft.queries.SimilarityOps.oracle ++
      graft.queries.Extended.oracle ++
      graft.queries.TypedOps.oracle
}
