package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, StructType}
import graft.model._
import Collection._
import QueryCompiler._

/** The full search pipeline (reference shard/shard.go:329–469 +
  * cluster/actions.go:357–376): compile → backfill → select → sort →
  * offset/limit, returning a DataFrame with the selected data columns plus
  * `_id`, `_distance`, `_score`, `_hybridScore` re-attached like the HTTP
  * layer does (handlers.go:475–483).
  */
object Search {

  def search(col0: Collection, req: SearchRequest): DataFrame = {
    Validation.validate(req).left.foreach(m => throw new IllegalArgumentException(m))
    Validation.validateSchema(req.query, col0.schema)
      .left.foreach(m => throw new IllegalArgumentException(m))
    val compiled = QueryCompiler.compile(col0, req.query)

    // Backfill: every row in the final set gets its data; ranked rows carry
    // their scores, set-only rows get hybrid score 0 (shard.go:350–369).
    val withScores = compiled.ranked match {
      case None =>
        applySet(col0, compiled.set)
          .withColumn(DistanceCol, lit(null).cast(FloatType))
          .withColumn(ScoreCol, lit(null).cast(FloatType))
          .withColumn(HybridScoreCol, lit(0.0f))
      case Some(ranked) if compiled.setFromRanked =>
        // leaf case: the set IS the ranked ids — one inner broadcast join
        // does membership AND backfill, so the top-k subtree runs once
        // (a semi-join + separate broadcast would execute it twice)
        col0.df.join(broadcast(ranked), Seq(IdCol), "inner")
      case Some(ranked) =>
        // ranked is bounded by per-index limits (≤75 rows per leaf), so the
        // join is a broadcast — no shuffle of the collection side.
        applySet(col0, compiled.set)
          .join(broadcast(ranked), Seq(IdCol), "left_outer")
          .withColumn(HybridScoreCol, coalesce(col(HybridScoreCol), lit(0.0f)))
    }

    // Default order: hybrid score desc (ranked first), id asc tie-break —
    // the multi-shard merge semantics (cluster/actions.go:361–363).
    // Explicit sort: missing values last regardless of direction
    // (utils/compare.go:67–75), applied before offset/limit.
    val ordered = req.sort match {
      case Nil => withScores.orderBy(col(HybridScoreCol).desc, col(IdCol).asc)
      case sorts =>
        val keys = sorts.map { s =>
          val c = col(s.property)
          if (s.descending) c.desc_nulls_last else c.asc_nulls_last
        } :+ col(IdCol).asc
        withScores.orderBy(keys: _*)
    }

    val page = ordered.offset(req.offset).limit(req.limit)
    project(page, col0.df.schema, req.select)
  }

  /** Compile and run a JSON search request body. */
  def searchJson(col0: Collection, json: String): DataFrame =
    search(col0, Json.parseSearchRequest(json))

  /** `select` projection (shard.go:384–453): listed properties only, `"*"`
    * = all data columns, dotted paths re-nested into structs, unknown paths
    * silently dropped, empty select = metadata only. Metadata columns are
    * always attached.
    */
  private def project(df: DataFrame, dataSchema: StructType, select: Seq[String]): DataFrame = {
    val metaCols = MetaCols.map(col)
    if (select.contains("*")) {
      val dataCols = dataSchema.fieldNames.filterNot(_ == IdCol).map(col).toSeq
      df.select(metaCols ++ dataCols: _*)
    } else {
      // drop IdCol like the "*" branch — metaCols already lead with it, and
      // a second copy makes every downstream df("_id") ambiguous
      val resolved = select.filterNot(_ == IdCol).filter(p => resolves(dataSchema, p))
      // re-nest dotted paths recursively: "a.b.c" returns struct a{b{c}};
      // selecting a whole struct subsumes selecting its fields
      val byRoot = resolved.map(_.split('.').toList).groupBy(_.head)
      val dataCols = resolved.map(_.split('.').head).distinct.map { root =>
        val tails = byRoot(root).map(_.tail)
        if (tails.exists(_.isEmpty)) col(root) // whole column requested
        else renest(root, tails).as(root)
      }
      df.select(metaCols ++ dataCols: _*)
    }
  }

  /** Build the struct column for `prefix` containing exactly the requested
    * sub-paths (each a non-empty segment list below the prefix).
    */
  private def renest(prefix: String, tails: Seq[List[String]]): Column = {
    val bySeg = tails.groupBy(_.head)
    struct(bySeg.keys.toSeq.sorted.map { seg =>
      val deeper = bySeg(seg).map(_.tail)
      val path = s"$prefix.$seg"
      if (deeper.exists(_.isEmpty)) col(path).as(seg)
      else renest(path, deeper).as(seg)
    }: _*)
  }

  private def resolves(schema: StructType, path: String): Boolean = {
    def walk(s: StructType, segs: List[String]): Boolean = segs match {
      case Nil => false
      case seg :: Nil => s.fieldNames.contains(seg)
      case seg :: rest => s.fields.find(_.name == seg).exists(_.dataType match {
        case st: StructType => walk(st, rest)
        case _ => false
      })
    }
    walk(schema, path.split('.').toList)
  }
}
