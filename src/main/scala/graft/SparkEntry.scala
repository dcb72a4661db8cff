package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{NamedQuery, Registry, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2 + the
  * LLM-pipeline extras) to a DataFrame builder over a scale-factor dir;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-compare. Column names are aligned between the two on purpose.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[NamedQuery] = Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg.build(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
