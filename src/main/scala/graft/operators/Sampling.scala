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

  /** The raw 32-bit hash integer behind [[hashUniform]], as an exact
    * double in [0, 2^32).
    */
  private def hash32(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double")

  /** Uniform in [0,1) from the row key: the first 8 hex digits of
    * md5(key || salt) read as a 32-bit integer over 2^32. 2^32 < 2^53,
    * so the double is exact; the same trick the winnowing oracle uses.
    */
  def hashUniform(key: Column, salt: String): Column =
    hash32(key, salt) / lit(4294967296.0)

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

  /** Deterministic weighted sample WITHOUT replacement of size `k` — the
    * Gumbel-top-k trick (equivalently Efraimidis–Spirakis reservoir
    * keys): each row draws a deterministic Gumbel perturbation
    * g = −ln(−ln u) from its hash uniform, and the k largest
    * (logWeight + g) win — distributed exactly as sequential
    * without-replacement draws with probability ∝ exp(logWeight). The
    * natural consumer of DSIR log importance weights
    * ([[TextAnalysis.dsirWeights]]): weight, then sample, all replayable.
    *
    * u is offset to (h + 0.5)/2^32 ∈ (0,1), so the perturbation is
    * always finite. Output carries the original columns plus
    * `gumbel_key`, ordered by the key descending (ties broken by `key`
    * ascending — total order, so the selected SET is deterministic).
    *
    * Scale: the perturbed key is a narrow per-row projection and top-k
    * is orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    * bounded top-k, then a k-sized merge), never a global sort shuffle.
    */
  def gumbelTopK(df: DataFrame, key: Column, logWeight: Column, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val u = (hash32(key, salt) + lit(0.5)) / lit(4294967296.0)
    df.withColumn("gumbel_key", logWeight + (-log(-log(u))))
      .orderBy(col("gumbel_key").desc, key.asc)
      .limit(k)
  }
}
