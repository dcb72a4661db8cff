package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. A hash-partitioned join sends every
  * row of a key to ONE reducer, so a hot key (a `source` with half the
  * corpus, a null-ish default id, a celebrity user) turns one task into
  * the job's critical path while the other 999 executors idle. Salting
  * splits the hot key's rows across `salts` sub-partitions — the left
  * side gets a deterministic per-row salt, the right side is replicated
  * once per salt value — and the join key becomes `(key, salt)`, which
  * the planner shuffles like any equi-join, now balanced. The identity
  * `left ⋈ right = Σ_s (left where salt=s) ⋈ right` holds because each
  * left row carries exactly ONE salt and meets the full right side
  * under it; the price is a `salts`× replication of the right side, so
  * keep the right side the smaller one (at broadcast size, `broadcast()`
  * beats salting outright — this operator is for the middle regime:
  * right too big to broadcast, left too skewed to shuffle raw).
  *
  * AQE's runtime skew split (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default in this engine's sessions) handles the same problem
  * reactively for sort-merge joins when post-shuffle partition stats
  * reveal the skew; this operator is the declarative form for joins the
  * planner can't split (e.g. when the skew is known up front, or under
  * bucketed layouts AQE won't touch).
  *
  * The salt is `xxhash64(every left column) mod salts` — a pure
  * function of the ROW, not of partition layout or row order, so
  * results are deterministic under any input layout (identical
  * duplicate rows share a salt; dedup upstream if exact-dup rows
  * dominate a key).
  */
object SkewJoin {

  private val SaltCol = "_graft_salt"

  /** Inner or left_outer equi-join of `left` and `right` on
    * `leftKey = rightKey`, salted `salts` ways. Output columns = the
    * plain join's (left columns then right columns minus its key — the
    * `Seq`-key join shape with the key surviving once).
    */
  def salted(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      how: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    require(how == "inner" || how == "left_outer" || how == "left",
      s"salting supports inner/left_outer joins (got $how); a right/full outer " +
        "join would emit one unmatched right row PER SALT")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"column $SaltCol is reserved by SkewJoin")
    require(rightKey == leftKey || !right.columns.contains(leftKey),
      s"right side already has a column named $leftKey — renaming its key would collide")
    val l = left.withColumn(
      SaltCol, pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val r = right
      .withColumnRenamed(rightKey, leftKey)
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(leftKey, SaltCol), how).drop(SaltCol)
  }
}
