package graft

/** Plan-quality lint over EVERY registered driver query: no un-broadcast
  * cartesian product may appear in any physical plan. Broadcast
  * nested-loop joins are allowed — the kNN join and single-query vector
  * paths broadcast a bounded side deliberately — but a CartesianProduct
  * node means both sides shuffle-materialize the cross space, which is
  * exactly the operator shape that cannot survive a 100 TB corpus.
  * A per-query whitelist is provided but currently EMPTY: nothing ships
  * with an unbounded cross product.
  */
class PlanLintSpec extends SparkSuite {

  private val whitelist: Set[String] = Set.empty

  test("no registered query plans a CartesianProduct") {
    val offenders = queries.Registry.all
      .filterNot(q => whitelist.contains(q.name))
      .flatMap { q =>
        // building the frame is enough — executedPlan is the planned (not
        // yet executed) physical tree; write-path queries do mutate their
        // scratch store on build, which their own suites already exercise
        val plan =
          try q.build(spark, sf0001).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: $e" }
        if (plan.contains("CartesianProduct") || plan.startsWith("PLANNING FAILED"))
          Some(q.name -> plan.linesIterator.take(3).mkString(" | "))
        else None
      }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }
}
