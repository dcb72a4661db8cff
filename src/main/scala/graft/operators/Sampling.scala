package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. The sampling
  * decision is a pure function of the ROW (an md5-derived uniform), never
  * of the run: re-executing, adding executors, or re-partitioning cannot
  * change the sample, and any engine with md5 reproduces it exactly —
  * unlike `DataFrame.sample`, whose per-partition RNG re-draws under
  * every layout change. That determinism is what makes a 100 TB curation
  * run auditable (and lets the DuckDB oracle replay the selection).
  *
  * Scale: a narrow per-row filter — no shuffle, no state, pushes through
  * any plan.
  */
object Sampling {

  /** Uniform in [0,1) from the row key: the first 8 hex digits of
    * md5(key || salt) read as a 32-bit integer over 2^32. 2^32 < 2^53,
    * so the double is exact; the same trick the winnowing oracle uses.
    */
  def hashUniform(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Bernoulli sample at `rate` — keep iff hashUniform < rate. */
  def bernoulli(df: DataFrame, key: Column, rate: Double,
      salt: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1] (got $rate)")
    df.filter(hashUniform(key, salt) < lit(rate))
  }

  /** Stratified sample: a rate per stratum value, `defaultRate` for
    * unlisted strata (a null stratum takes the default). The comparison
    * is strict, and hashUniform is strictly below 1.0 (max (2^32−1)/2^32),
    * so rate 0 drops the stratum entirely and rate 1 keeps EVERY row —
    * both endpoints are exact.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    (defaultRate +: rates.values.toSeq).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1] (got $r)"))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (value, r)) =>
      when(stratum === value, lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(key, salt) < rate)
  }
}
