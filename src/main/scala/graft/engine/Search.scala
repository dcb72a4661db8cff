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
    validate(col0, req)
    assemble(col0, req, QueryCompiler.compile(col0, req.query))
  }

  private def validate(col0: Collection, req: SearchRequest): Unit = {
    Validation.validate(req).left.foreach(m => throw new IllegalArgumentException(m))
    Validation.validateSchema(req.query, col0.schema)
      .left.foreach(m => throw new IllegalArgumentException(m))
  }

  /** Serve MANY requests in one call, returning one result frame per
    * request in request order. Semantics are K independent [[search]]
    * calls — bit-identical for the vector families; for text, identical
    * up to float32 rounding of the per-term double sum, whose order
    * inside the fused groupBy can differ from the single route's (neither
    * route promises a summation order; the SearchManySpec laws assert
    * 4-decimal equality, the same strength the gates claim). The win is
    * the serving cost of the graph-walk
    * family: requests that are single-leaf approx vectorVamana `near`
    * queries against the SAME attached graph artifact (grouped further
    * by rescore budget — the beam width — and by filter AST: unfiltered
    * requests together, filtered ones batching when their filters are
    * EQUAL, sharing the filter's seed set and membership verdicts) walk
    * as ONE hop-batched wave — per hop round every group member's
    * frontier fuses into a single bucket-pruned fetch
    * (VamanaServe.beamCandidateGidsBatch), and the final gid→id lookup is
    * one fused point read for the whole group — so a K-query batch costs
    * ~maxHops Spark jobs instead of K×maxHops (the per-query
    * job-scheduling floor is the dominant serving cost at small K).
    * Single-leaf, unfiltered, approx vectorFlat requests against a
    * quantizer artifact (full-scan BQ/PQ/OPQ/SQ8/RaBitQ, or IVF-PQ /
    * IVF-RaBitQ) likewise fuse: the group's K quantized-distance columns
    * evaluate in ONE pass over the encoded frame (compileFlatMany),
    * amortizing the candidate scan — the dominant flat serving cost at
    * corpus scale — across the batch; IVF members scan the UNION of the
    * group's probed cells with each query's column guarded to its OWN
    * cells, so per-query partition pruning survives batching. Single-leaf,
    * unfiltered TEXT requests against one property share the postings
    * restriction, the df table, and one fused per-doc scoring aggregate
    * (compileTextMany). Batchable leaves are harvested from ANYWHERE in a
    * request's query tree (round 12): a hybrid `_and`/`_or` of text +
    * vector leaves decomposes into the same fused families — the leaves
    * batch across requests, then each request's combinator merge runs on
    * the precompiled leaf results, so hybrid serving workloads amortize
    * end-to-end instead of falling back whole. Identical leaves shared by
    * several requests compile ONCE (the precompiled map is keyed by leaf
    * value). FILTERED leaves batch in every family when their filter ASTs
    * are EQUAL (the filter joins each family's group key): the vamana
    * group shares the filter's seed set and membership verdicts, the flat
    * group's fused scan is filter-restricted once, and the text group
    * intersects its fused per-doc frame once (after set merge, before
    * truncation — the single route's placement). Only plain predicates and
    * combinators contribute no fused work of their own.
    */
  def searchMany(col0: Collection, reqs: Seq[SearchRequest]): Seq[DataFrame] = {
    reqs.foreach(validate(col0, _))
    // batchable = the exact single-leaf shapes whose compile is a pure
    // function of (prop, vector, budget, limit, weight) over one artifact.
    // Two families fuse: graph-walk requests share hop waves
    // (compileVamanaMany); flat requests — full-scan AND IVF — share ONE
    // multi-query candidate scan (compileFlatMany; IVF members keep
    // per-query cell pruning via the union-scan + own-cells guard).
    // filtered approx requests ARE batchable (round-12 item #8): the
    // optimistic filtered walk's seeds and membership verdicts are pure
    // functions of the filter, so requests with EQUAL filter ASTs share
    // them — the filter joins the group key below
    def vamanaTag(q: Query): Option[(String, VectorVamanaOpts, IndexKind.Metric)] =
      q.vectorVamana match {
        case Some(o) if o.approx && q.and.isEmpty && q.or.isEmpty =>
          col0.schema.get(q.property) match {
            case Some(k: IndexKind.VectorVamana)
                if col0.vectorIndexes.get(q.property)
                  .exists(_.isInstanceOf[VamanaVectorIndex]) =>
              Some((q.property, o, k.metric))
            case _ => None
          }
        case _ => None
      }
    def flatTag(q: Query): Option[(String, VectorFlatOpts, IndexKind.Metric)] =
      q.vectorFlat match {
        case Some(o) if o.approx && q.and.isEmpty && q.or.isEmpty =>
          col0.schema.get(q.property) match {
            case Some(k: IndexKind.VectorFlat) =>
              col0.vectorIndexes.get(q.property) match {
                case Some(_: BinaryVectorIndex | _: ProductVectorIndex |
                          _: OpqVectorIndex | _: RbqVectorIndex |
                          _: ScalarVectorIndex |
                          _: IvfPqVectorIndex | _: IvfRbqVectorIndex) =>
                  Some((q.property, o, k.metric))
                case _ => None // vamana artifact / no artifact: single pipeline
              }
            case _ => None
          }
        case _ => None
      }
    // single-leaf, unfiltered text queries share postings/df work per
    // property (compileTextMany) — hybrid serving workloads are
    // text+vector, so the text half must amortize too
    def textTag(q: Query): Option[String] = q.text match {
      case Some(_) if q.and.isEmpty && q.or.isEmpty =>
        col0.schema.get(q.property) match {
          case Some(_: IndexKind.Text) => Some(q.property)
          case _ => None
        }
      case _ => None
    }
    // harvest batchable leaves from the whole tree (a top-level leaf is
    // the depth-0 case); `distinct` dedups identical leaves across
    // requests so each compiles once
    def leaves(q: Query): Seq[Query] = q.property match {
      case "_and" => q.and.flatMap(leaves)
      case "_or" => q.or.flatMap(leaves)
      case _ =>
        if (vamanaTag(q).isDefined || flatTag(q).isDefined ||
          textTag(q).isDefined) Seq(q)
        else Nil
    }
    val allLeaves = reqs.flatMap(r => leaves(r.query))
    val distinctLeaves = allLeaves.distinct
    // how many REQUESTS consume each leaf — not how many distinct leaves a
    // group holds: a single leaf shared by K requests still wants the
    // EAGER Many-compile, because each consuming request's merge pins
    // (localCheckpoints) its ranked children separately, and a lazy shared
    // plan would re-execute the leaf's scoring K times
    val consumers = allLeaves.groupBy(identity).map { case (q, qs) => (q, qs.size) }
    val pre = scala.collection.mutable.Map[Query, QueryCompiler.Compiled]()
    // a group with ONE distinct leaf consumed by ONE request has nothing
    // to fuse or share — the Many-compile would only add its eager
    // materialization step (an extra job at toy scale, measured ~2x on a
    // K=1 batch) over the single route's lazy plan
    def fuseOrSingle(members: Seq[Query])(many: => Seq[QueryCompiler.Compiled]): Unit =
      if (members.size == 1 && consumers(members.head) == 1)
        pre(members.head) = QueryCompiler.compile(col0, members.head)
      else members.zip(many).foreach { case (q, c) => pre(q) = c }
    distinctLeaves.flatMap(q => vamanaTag(q).map((q, _))).groupBy {
      // the shared budget definitions (QueryCompiler.vamanaBudget /
      // flatBudget) keep the batch's groups bit-identical to the
      // single-request route; the filter AST in the key means only
      // EQUAL-filter requests share a (seeded, membership-probed) wave
      case (_, (prop, o, metric)) =>
        (prop, QueryCompiler.vamanaBudget(o), metric, o.filter)
    }.foreach { case ((prop, budget, metric, filter), members) =>
      fuseOrSingle(members.map(_._1)) {
        val items = members.map { case (_, (_, o, _)) =>
          (o.vector, o.limit, o.weight.getOrElse(1.0f))
        }
        QueryCompiler.compileVamanaMany(col0, prop, metric, items, budget, filter)
      }
    }
    distinctLeaves.filter(vamanaTag(_).isEmpty)
      .flatMap(q => flatTag(q).map((q, _))).groupBy {
        // filter AST in the key: EQUAL-filter requests share one
        // filter-restricted fused scan (round 12)
        case (_, (prop, o, metric)) =>
          (prop, QueryCompiler.flatBudget(o), metric, o.filter)
      }.foreach { case ((prop, budget, metric, filter), members) =>
        fuseOrSingle(members.map(_._1)) {
          val items = members.map { case (_, (_, o, _)) =>
            (o.vector, o.limit, o.weight.getOrElse(1.0f))
          }
          QueryCompiler.compileFlatMany(col0, prop, metric, items, budget, filter)
        }
      }
    distinctLeaves.filter(q => vamanaTag(q).isEmpty && flatTag(q).isEmpty)
      .flatMap(q => textTag(q).map((q, _)))
      .groupBy { case (q, prop) => (prop, q.text.get.filter) }
      .foreach { case ((prop, filter), members) =>
        fuseOrSingle(members.map(_._1)) {
          QueryCompiler.compileTextMany(col0, prop, members.map(_._1.text.get), filter)
        }
      }
    val preMap = pre.toMap
    reqs.map(r => assemble(col0, r, QueryCompiler.compile(col0, r.query, preMap)))
  }

  /** JSON-request face of [[searchMany]]. */
  def searchManyJson(col0: Collection, jsons: Seq[String]): Seq[DataFrame] =
    searchMany(col0, jsons.map(Json.parseSearchRequest))

  /** The post-compile pipeline: backfill → sort → offset/limit → select. */
  private def assemble(
      col0: Collection, req: SearchRequest,
      compiled: QueryCompiler.Compiled): DataFrame = {
    // Backfill: every row in the final set gets its data; ranked rows carry
    // their scores, set-only rows get hybrid score 0 (shard.go:350–369).
    val withScores = compiled.ranked match {
      case None =>
        // `_id` lookups are the reference's point-read face
        // (shard/pointstore/pointstore.go:78 — a bbolt Get per id); with a
        // store-wired pointLookup they answer from the id-bucketed doc
        // table (≤ k bucket files opened) instead of filtering the corpus
        // scan — the set semantics are identical (idPredicate matches the
        // same literal ids).
        val base = (idQueryIds(req.query), col0.pointLookup) match {
          case (Some(ids), Some(lookup)) => lookup(ids)
          case _ => applySet(col0, compiled.set)
        }
        base
          .withColumn(DistanceCol, lit(null).cast(FloatType))
          .withColumn(ScoreCol, lit(null).cast(FloatType))
          .withColumn(HybridScoreCol, lit(0.0f))
      case Some(ranked) if compiled.setFromRanked &&
          metadataOnly(req, col0.df.schema) && req.sort.isEmpty =>
        // metadata-only leaf request with default ordering (the hot ANN
        // serving shape — the reference's empty `select` returns metadata
        // only, shard.go:384): the ranked frame already carries every
        // returned column (_id + the three scores) and its ids are the
        // collection's by construction (every leaf ranks rows of the
        // collection or of an artifact the store keeps write-consistent
        // with it), so the backfill join would add nothing — and at
        // serving shapes it costs a collection scan + broadcast per
        // request (the flagship QPS floor after the candidate-bounded
        // re-rank landed). A select that resolves to NO data column
        // (`["_id"]`, or only unknown paths — which project() silently
        // drops) is metadata-only in the same sense.
        //
        // Round 13: when ranked is ALREADY a driver-local relation (the
        // graph family's pre-ranked re-rank, the fused text batch) the
        // remaining default-order page — orderBy(hybrid desc, id asc) +
        // offset/limit + meta projection — is a per-request Spark job
        // over ≤75 local rows, i.e. the last job on the local serving
        // path (round-12 "not yet optimized" #2). Replay it driver-side
        // and return a finished LocalRelation: consuming it runs ZERO
        // jobs. Non-local ranked frames (exact corpus top-k) fall
        // through to the shared lazy pipeline unchanged.
        localMetaPage(ranked, req) match {
          case Some(done) => return done
          case None => ranked
        }
      case Some(ranked) if compiled.setFromRanked && col0.pointLookup.isDefined =>
        // leaf case with select/sort on a STORE-served collection: the set
        // IS the ranked ids, bounded by the per-index limit (≤75,
        // Validation), so materialize it ONCE driver-side and backfill by
        // POINT READ — the store-wired pointLookup opens only the bucket
        // files hashing the requested ids (plus the delta overlay). Before
        // this, the broadcast build executed the ranked subtree (scan 1)
        // and the probe side re-read the collection in full (scan 2) — the
        // serving cost of every select-bearing request. Collecting here
        // makes the STORE path eager by one bounded job; the plain
        // plain-Collection path below stays fully lazy (a composable library
        // frame must not run jobs at plan time — only the serving facade,
        // which executes per request anyway, buys eagerness for pruning).
        val spark = col0.df.sparkSession
        val rows = ranked.collect()
        val local = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), ranked.schema)
        val idIdx = ranked.schema.fieldIndex(IdCol)
        val ids = rows.map(_.getString(idIdx)).toSeq
        col0.pointLookup.get(ids).join(broadcast(local), Seq(IdCol), "inner")
      case Some(ranked) if compiled.setFromRanked =>
        // plain-Collection leaf case: one inner broadcast join does
        // membership AND backfill, so the top-k subtree runs once (a
        // semi-join + separate broadcast would execute it twice) and the
        // returned frame stays lazy
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

  /** The metadata-only default-order page, replayed driver-side over a
    * ranked frame whose OPTIMIZED plan is a LocalRelation (the graph
    * family's pre-ranked re-rank, the fused text batch's per-request
    * frames — ConvertToLocalRelation folds their projections) — None for
    * any distributed ranked plan, which keeps the shared lazy pipeline.
    *
    * Replays Spark's semantics exactly:
    *   - `orderBy(_hybridScore desc, _id asc)`: desc defaults to NULLS
    *     LAST; float comparison is [[QueryCompiler.sparkFloatCmp]]
    *     (−0.0 = +0.0, NaN greatest — FIRST under desc); the id
    *     tie-break is UTF-8 binary ([[QueryCompiler.sparkStrCmp]]);
    *   - `offset(n).limit(m)`: drop n, take m;
    *   - metadata projection: the four MetaCols in order, with the
    *     source frame's own field types/nullability.
    * `ranked.collect()` on a LocalRelation plan is
    * LocalTableScanExec.executeCollect — no job is ever launched.
    */
  private[graft] def localMetaPage(ranked: DataFrame, req: SearchRequest): Option[DataFrame] =
    ranked.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val schema = ranked.schema
        // a ranked frame always carries exactly the four meta columns,
        // but resolve defensively — an unexpected shape keeps the lazy path
        if (!MetaCols.forall(schema.fieldNames.contains)) return None
        val rows = ranked.collect()
        val hIdx = schema.fieldIndex(HybridScoreCol)
        val idIdx = schema.fieldIndex(IdCol)
        val ord = new Ordering[org.apache.spark.sql.Row] {
          def compare(x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row): Int = {
            val xn = x.isNullAt(hIdx); val yn = y.isNullAt(hIdx)
            val c =
              if (xn && yn) 0
              else if (xn) 1 // nulls last under desc
              else if (yn) -1
              else -QueryCompiler.sparkFloatCmp(x.getFloat(hIdx), y.getFloat(hIdx))
            if (c != 0) c
            else QueryCompiler.sparkStrCmp(x.getString(idIdx), y.getString(idIdx))
          }
        }
        val paged = rows.sorted(ord).drop(req.offset).take(req.limit)
        val metaIdx = MetaCols.map(schema.fieldIndex)
        val outRows: Seq[org.apache.spark.sql.Row] = paged.toSeq.map { r =>
          org.apache.spark.sql.Row(metaIdx.map(i => if (r.isNullAt(i)) null else r.get(i)): _*)
        }
        val outSchema = StructType(metaIdx.map(i => schema.fields(i)))
        Some(ranked.sparkSession.createDataFrame(
          java.util.Arrays.asList(outRows: _*), outSchema))
      case _ => None
    }

  /** True when the request's projection needs no data column beyond the
    * metadata the ranked frame already carries: empty select, or a select
    * naming only `_id` / paths that don't resolve (project() drops those
    * silently, shard.go:384's behavior).
    */
  private def metadataOnly(req: SearchRequest, dataSchema: StructType): Boolean =
    req.select.forall(p => p == IdCol || (p != "*" && !resolves(dataSchema, p)))

  /** The literal id set of a pure top-level `_id` query — None for any
    * other shape. Mirrors QueryCompiler.idPredicate exactly (string →
    * equality on the one value, stringArray → membership in the list), so
    * routing these through `pointLookup` preserves the set semantics
    * bit-for-bit.
    */
  private def idQueryIds(q: Query): Option[Seq[String]] =
    if (q.property != "_id") None
    else (q.string, q.stringArray) match {
      case (Some(s), _) => Some(Seq(s.value))
      case (_, Some(sa)) => Some(sa.value)
      case _ => None
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
