package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot auditing — "what changed between two corpus
  * generations?" answered row-exactly. Training-data governance needs
  * this at every refresh: which documents arrived, which were dropped,
  * which mutated in place (same id, different content) — the provenance
  * record that explains a downstream eval shift. The reference's
  * analogue is its WAL/versioned point store (shard updates by UUID);
  * this is the corpus-level, two-snapshot view.
  *
  * Shape: ONE full outer equi-join on the id — no content shuffle (only
  * 16-byte md5 digests travel), no window, no driver state; skew-free
  * for unique ids by construction. Status is a pure function of digest
  * presence/equality, so any engine replays the exact classification.
  */
object Audit {

  /** Row-level diff: (id, status, old_md5, new_md5) with status one of
    * 'added' | 'removed' | 'changed' | 'unchanged'. Null content hashes
    * as a distinct digest-of-absence so content→null transitions count
    * as changes, not joins on null.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      id: Column, content: Column): DataFrame = {
    def key(df: DataFrame): DataFrame =
      df.filter(id.isNotNull)
        .select(id.cast("long").as("id"),
          coalesce(md5(content.cast("string")), lit("<null>")).as("_md5"))
    val o = key(oldSnap).withColumnRenamed("_md5", "old_md5")
    val n = key(newSnap).withColumnRenamed("_md5", "new_md5")
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") === col("new_md5"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_md5"), col("new_md5"))
  }

  /** The governance rollup: counts per (stratum, status) — e.g. per
    * source — so a refresh report reads "src3: +120 −80 ~40". The
    * stratum comes from the NEW snapshot (removed rows take the old's).
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      id: Column, content: Column, stratum: Column): DataFrame = {
    val d = diff(oldSnap, newSnap, id, content)
    val oStr = oldSnap.filter(id.isNotNull)
      .select(id.cast("long").as("id"), stratum.cast("string").as("_so"))
    val nStr = newSnap.filter(id.isNotNull)
      .select(id.cast("long").as("id"), stratum.cast("string").as("_sn"))
    d.join(oStr, Seq("id"), "left").join(nStr, Seq("id"), "left")
      .select(coalesce(col("_sn"), col("_so")).as("stratum"), col("status"))
      .groupBy("stratum", "status").agg(count(lit(1)).as("n"))
  }
}
