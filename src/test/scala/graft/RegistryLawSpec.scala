package graft

/** Structural laws over the gate registry itself (round-9 verdict item:
  * a registered-but-unpinnable gate must fail `sbt test`, not surface
  * first in the driver's round record).
  *
  * Round 8 shipped `opq_adc_topk` with the scaffold oracle
  * `FROM (VALUES (0, 0.0)) t(...)` — a placeholder that can never hash-
  * match a 10-row result, so the driver could never report all-green.
  * These laws make that failure mode a compile-adjacent one: any query
  * whose oracle still carries the single-zero-tuple scaffold fails here
  * unless it is explicitly declared work-in-progress below.
  */
class RegistryLawSpec extends SparkSuite {

  /** Queries ALLOWED to carry a scaffold oracle while their golden is
    * being produced. Keep EMPTY at every round boundary: an entry here is
    * a loud in-tree marker that the gate set is not finishable.
    */
  private val workInProgress: Set[String] = Set.empty

  /** The pinned-golden scaffold: a VALUES list whose ENTIRE body is the
    * single zero tuple — `(VALUES (0, 0.0))` in any spacing, any number
    * of zero columns. Real pinned goldens always carry the actual rows
    * (multiple tuples, or non-zero values), so they never match.
    */
  private val scaffold =
    """\(\s*VALUES\s*\(\s*0\s*(?:,\s*0(?:\.0+)?\s*)*\)\s*\)""".r

  test("no registered oracle is a placeholder scaffold") {
    val offenders = queries.Registry.all
      .filterNot(q => workInProgress(q.name))
      .filter(q => q.oracle.exists(sql => scaffold.findFirstIn(sql).isDefined))
      .map(_.name)
    assert(offenders.isEmpty,
      s"scaffold oracles registered (pin the golden via the documented " +
        s"check_oracle regen flow, or tag them workInProgress): $offenders")
  }

  test("registered query names are unique") {
    val dup = queries.Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate gate names: $dup")
  }

  test("every workInProgress entry names a registered query") {
    val names = queries.Registry.all.map(_.name).toSet
    val stale = workInProgress -- names
    assert(stale.isEmpty, s"workInProgress entries for unknown queries: $stale")
  }
}
