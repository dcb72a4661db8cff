package graft

/** Plan-quality lints over EVERY registered driver query — the two operator
  * shapes that cannot survive a 100 TB corpus:
  *
  *  1. `CartesianProduct`: both sides shuffle-materialize the cross space.
  *     Broadcast nested-loop joins are allowed — the kNN join and
  *     single-query vector paths broadcast a bounded side deliberately.
  *  2. a `Window` whose partition key can grow with the corpus:
  *     `WindowExec` has no map-side partial aggregation, so every row of a
  *     hot partition funnels into ONE task (the round-3 shingle-df hazard).
  *     Windows over naturally-bounded keys are allowlisted below, each with
  *     the reason its partition size does NOT scale with corpus size.
  *
  * Per-query whitelists are provided but the cartesian one is EMPTY:
  * nothing ships with an unbounded cross product.
  */
class PlanLintSpec extends SparkSuite {

  private val whitelist: Set[String] = Set.empty

  /** Window partition keys whose group size is bounded by CONSTRUCTION —
    * adding corpus does not grow the partition:
    *  - `_pid`/`id_a`/`doc_id`: per-document windows; partition size ≤ the
    *    document's own shingle/token count, bounded by document length;
    *  - `user_id`: per-user sessionize/rank; events-per-user is bounded by
    *    the event-retention contract, not corpus width;
    *  - `l_orderkey`/`c_custkey`/`o_custkey`: TPC-H per-entity windows with
    *    fixed fan-out (≤7 lineitems/order; orders-per-customer bounded);
    *  - `bucket`: one IVF cell, sized corpus/K by the coarse quantizer;
    *  - `src`: Vamana per-node adjacency, capped by degreeBound·rounds.
    * Anything NOT on this list fails the lint — new windows must either
    * key on a bounded partition or justify themselves here.
    */
  private val boundedWindowKeys: Set[String] =
    Set("_pid", "id_a", "doc_id", "user_id", "l_orderkey", "c_custkey",
      "o_custkey", "bucket", "src")

  /** Queries allowed to plan a GLOBAL window (empty partitionSpec — the
    * everything-into-one-task shape). Each entry must name why its input
    * is bounded by CONTRACT before the window runs: the store's
    * update/delete point-merges window over `coalesce(1)` frames that are
    * ≤ batch-size × delta-log rows by construction (viewRowsFor /
    * WAL-fold), never corpus-sized.
    */
  private val globalWindowAllowed: Set[String] = Set("w1_write_path")

  // one planning pass shared by both lints (write-path queries mutate their
  // scratch stores on build — their own suites exercise that; building them
  // twice here would double that cost)
  private lazy val plans: Seq[(String, String, Seq[Seq[String]])] =
    queries.Registry.all.map { q =>
      try {
        val qe = q.build(spark, sf0001).queryExecution
        val windowKeys = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
            w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
        }
        (q.name, qe.executedPlan.toString, windowKeys)
      } catch {
        case e: Throwable => (q.name, s"PLANNING FAILED: $e", Nil)
      }
    }

  test("no registered query plans a CartesianProduct") {
    val offenders = plans
      .filterNot { case (name, _, _) => whitelist.contains(name) }
      .collect {
        case (name, plan, _)
            if plan.contains("CartesianProduct") || plan.startsWith("PLANNING FAILED") =>
          name -> plan.linesIterator.take(3).mkString(" | ")
      }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }

  test("no registered query plans a Window over an unbounded partition key") {
    // non-vacuity: the registry DOES contain windowed queries (q3_window,
    // q6_sessionize, dedup prefix ranking) — if the collector sees none,
    // the lint is broken, not the plans clean
    assert(plans.exists(_._3.exists(_.nonEmpty)),
      "window collector found no partitioned Window in any plan — lint is miswired")
    val offenders = plans.flatMap { case (name, _, windows) =>
      windows.flatMap { keys =>
        // a window is safe if ANY of its partition keys is bounded: the
        // partition is the INTERSECTION of its keys' groups, so one
        // bounded key bounds the whole partition. An EMPTY partitionSpec
        // is the single-task worst case — allowed only by explicit
        // per-query exemption with a documented input bound.
        if (keys.isEmpty && !globalWindowAllowed.contains(name))
          Some(s"$name: GLOBAL Window (empty partitionSpec)")
        else if (keys.nonEmpty && !keys.exists(boundedWindowKeys))
          Some(s"$name: Window partitioned by [${keys.mkString(", ")}]")
        else None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
