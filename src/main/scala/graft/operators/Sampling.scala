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

  /** Deterministic source mixing — training-mix construction (the Pile /
    * Dolma pattern): given target mix `shares` per source value and a
    * total weight `budget`, sample each source down to its share of the
    * budget:
    *
    *   rate_s = min(1, budget · share_s / available_s)
    *
    * with `available_s` the source's total weight (one small aggregation;
    * only S rows land on the driver). Shares are used as given — the
    * caller normalizes; a source absent from `shares` (or a null source)
    * gets rate 0 and drops out of the mix. An over-budgeted source caps
    * at rate 1 (you cannot mint data), exactly like the paper pipelines'
    * upsampling floor — callers wanting epoch-style repetition handle it
    * upstream.
    *
    * Selection reuses the row-pure md5 threshold ([[bernoulli]]): the kept
    * set is a deterministic function of (corpus, shares, budget, salt) —
    * auditable, layout-independent, replayable by any engine with md5.
    * Output: the kept rows with their `mix_rate` appended.
    *
    * Scale: the rate table is S broadcast literals in one CASE column;
    * the filter is a narrow per-row predicate — no shuffle beyond the
    * one availability aggregation.
    */
  def mixSources(
      df: DataFrame, key: Column, source: Column, weight: Column,
      shares: Map[String, Double], budget: Double,
      salt: String = "graft"): DataFrame = {
    require(budget > 0.0, s"budget must be positive (got $budget)")
    shares.values.foreach(s =>
      require(s >= 0.0, s"shares must be non-negative (got $s)"))
    val avail = df.groupBy(source.as("_src")).agg(sum(weight).as("_a"))
      .collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
      .toMap
    val rates: Map[String, Double] = avail.flatMap { case (s, a) =>
      val share = shares.getOrElse(s, 0.0)
      if (share <= 0.0 || a <= 0L) None
      else Some(s -> math.min(1.0, budget * share / a.toDouble))
    }
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (v, r)) =>
      when(source === v, lit(r)).otherwise(acc)
    }
    df.withColumn("mix_rate", rateCol)
      .filter(hashUniform(key, salt) < col("mix_rate"))
  }

  /** Deterministic shuffle-sharding for training output: every row gets
    * a shard in [0, numShards) and a 60-bit `sort_key`, both pure
    * md5-functions of (key, salt) — the distributed equivalent of
    * "globally shuffle the corpus, then split into S files". Writing
    * each shard ordered by `sort_key` yields a reproducible global
    * shuffle; a different `salt` is a fresh, independent epoch order.
    *
    * Hash-mod sharding balances shards only multinomially (±O(√n)
    * rows) — the standard training-shard contract (WebDataset et al.);
    * exact token-balanced splitting is [[Packing]]'s prefix-sum job.
    *
    * Scale: two narrow per-row columns — no shuffle at all until the
    * caller's `repartition(shard)`/`sortWithinPartitions(sort_key)`
    * write, which is the intended one.
    */
  def shuffleShards(df: DataFrame, key: Column, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    val h = conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("sort_key", h)
      .withColumn("shard", pmod(col("sort_key"), lit(numShards.toLong)).cast("int"))
  }
}
