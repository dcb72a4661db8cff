package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training shards — the "concat-and-chunk"
  * layout: documents are laid end-to-end in a global deterministic order
  * (the id), and the token stream is cut into fixed-capacity chunks. Each
  * document's placement is fully described by its global token START
  * OFFSET; the chunks it spans follow by integer division.
  *
  * The start offset is a GLOBAL prefix sum, which Spark's Window would
  * compute in a single task (`Window.orderBy` with no partition key — the
  * unbounded-window shape PlanLintSpec forbids). Instead this is the
  * textbook distributed prefix sum, all stages partition-parallel:
  *
  *   1. range-repartition by id + sort within partitions (each partition
  *      holds a contiguous, sorted id range);
  *   2. one tiny job sums each partition's weights (P rows to the driver);
  *   3. the cumulative per-partition offsets broadcast back (P longs);
  *   4. a partition-local scan emits each row's offset.
  *
  * The result depends only on the id order and the weights — NOT on the
  * partition count or layout (each partition's base offset is computed
  * from whatever rows actually landed in it), which TrainingSpec asserts
  * by building at different partition counts.
  *
  * Scale: the only materialized state is the narrow (id, weight)
  * projection (16 bytes/row — an eager localCheckpoint, so passes 2 and 4
  * read the SAME rows and no CacheManager entry accumulates) and the
  * P-long offset array on the driver. At 100 TB with 1e11 docs and 100k
  * partitions that array is 800 KB — nothing.
  */
object Packing {

  /** (id, w, start): each row's weight and its global start offset under
    * id order. Null weights count as 0; negative weights are rejected
    * (an offset stream must be monotone); a null id — including a
    * non-numeric id the Long cast nulls out — fails fast with a named
    * error rather than an opaque executor NPE (the output schema promises
    * non-null ids).
    */
  def withStartOffsets(df: DataFrame, id: Column, weight: Column,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val idL = id.cast(LongType)
    val prepared = df
      .select(
        when(idL.isNull, raise_error(lit(
          "packing requires a non-null numeric id for every row")))
          .otherwise(idL).as("id"),
        coalesce(weight.cast(LongType), lit(0L)).as("w"))
      .repartitionByRange(p, col("id"))
      .sortWithinPartitions("id")
      // EAGER localCheckpoint, not persist: passes 2 and 4 must see the
      // SAME rows. A persist()ed block that is evicted/lost recomputes from
      // source, and a non-deterministic source would then emit offsets that
      // no longer match the partition sums — silently overlapping shards.
      // Checkpointed blocks either survive or fail the job loudly (the
      // CollectionStore/Dedup convention), and leave no CacheManager entry
      // for callers to clear.
      .localCheckpoint()
    val rdd = prepared.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach { r =>
          val w = r.getLong(1)
          if (w < 0) throw new IllegalArgumentException(
            s"negative weight $w for id ${r.getLong(0)}")
          s += w
        }
        Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // offsets(i) = total weight in partitions before i
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val w = r.getLong(1)
        val row = Row(r.getLong(0), w, acc)
        acc += w
        row
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("w", LongType, nullable = false),
      StructField("start", LongType, nullable = false))))
  }

  /** [[withStartOffsets]] plus the chunk span at a fixed `capacity`:
    * `chunk_first = start div capacity`,
    * `chunk_last = (start + max(w,1) - 1) div capacity` (a zero-weight
    * document "sits" at its offset without occupying tokens), and the
    * spanned-chunk count. Integer `div` throughout — no double rounding
    * at large offsets.
    */
  /** DOCUMENT-BOUNDARY-PRESERVING greedy packing — the other sequence
    * layout labs train with: no document ever spans two sequences (no
    * cross-document attention contamination), the remainder of each bin
    * is padding, and an oversized document gets a bin of its own (the
    * caller truncates or splits upstream — [[Chunking]] exists for
    * that). Greedy first-fit in a FIXED scan order: bins are scoped to a
    * GROUP (use [[Sampling.shuffleShards]]'s shard — a pure row
    * property), and within a group documents pack in `order` sequence,
    * so bin assignment is layout-independent by construction: a
    * partition boundary can't leak bin state because bins reset at group
    * boundaries, not partition boundaries.
    *
    * Scale: one range-repartition on (group, order) + a sortWithinPartitions
    * + a mapPartitions fold with O(1) state — the shape a shard writer
    * runs anyway. Output: (group, order, id, w, bin, pos) — bin is
    * 0-based per group, pos 0-based within the bin.
    */
  def packGreedy(df: DataFrame, group: Column, order: Column, id: Column,
      weight: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    val spark = df.sparkSession
    val prepared = df
      .select(group.cast(LongType).as("group"), order.cast(LongType).as("order"),
        id.cast(LongType).as("id"), coalesce(weight.cast(LongType), lit(0L)).as("w"))
      .filter(col("group").isNotNull && col("order").isNotNull && col("id").isNotNull)
      .repartitionByRange(col("group"))
      .sortWithinPartitions("group", "order", "id")
    val schema = StructType(Seq(
      StructField("group", LongType), StructField("order", LongType),
      StructField("id", LongType), StructField("w", LongType),
      StructField("bin", LongType), StructField("pos", LongType)))
    val rdd = prepared.rdd.mapPartitions { rows =>
      var curGroup = Long.MinValue
      var bin = -1L; var used = 0L; var pos = 0L
      rows.map { r =>
        val g = r.getLong(0); val o = r.getLong(1)
        val i = r.getLong(2); val w = r.getLong(3)
        if (g != curGroup) { curGroup = g; bin = -1L }
        // open a new bin at every group start, and whenever the doc
        // would overflow the current one (an oversized doc thus gets a
        // bin of its own: the fresh bin overflows too, but only rolls
        // again for the NEXT doc)
        if (bin == -1L || used + w > capacity) { bin += 1L; used = 0L; pos = 0L }
        used += w
        val out = Row(g, o, i, w, bin, pos)
        pos += 1L
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  def packChunks(df: DataFrame, id: Column, weight: Column, capacity: Long,
      partitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    withStartOffsets(df, id, weight, partitions)
      .withColumn("chunk_first", expr(s"start DIV ${capacity}L"))
      .withColumn("chunk_last",
        expr(s"(start + greatest(w, 1L) - 1) DIV ${capacity}L"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + lit(1L))
  }
}
