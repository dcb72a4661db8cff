package graft

import org.apache.spark.sql.functions._
import graft.operators.Audit

/** Hand fixtures for the snapshot diff: all four statuses, the
  * content→null transition, the per-stratum rollup (removed rows keep
  * the old stratum), and layout independence.
  */
class AuditSpec extends SparkSuite {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "alpha", "s1"), (2L, "bravo", "s1"), (3L, "charlie", "s2"),
    (4L, null.asInstanceOf[String], "s2"), (5L, "echo", "s2"))
    .toDF("id", "text", "src")

  private def newSnap = Seq(
    (1L, "alpha", "s1"),            // unchanged
    (2L, "bravo-EDITED", "s1"),     // changed
    (4L, "delta", "s2"),            // changed (null -> content)
    (5L, null.asInstanceOf[String], "s2"), // changed (content -> null)
    (6L, "foxtrot", "s3"))          // added; 3 removed
    .toDF("id", "text", "src")

  test("all four statuses, incl. null-content transitions") {
    val got = Audit.diff(oldSnap, newSnap, col("id"), col("text"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"))
  }

  test("summary rolls up per stratum; removed rows keep the old stratum") {
    val got = Audit.diffSummary(oldSnap, newSnap, col("id"), col("text"), col("src"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("s1", "unchanged", 1L), ("s1", "changed", 1L),
      ("s2", "removed", 1L), ("s2", "changed", 2L),
      ("s3", "added", 1L)))
  }

  test("layout independence and id-join shape on real data") {
    val d = Tables.documents(spark, sf001)
    val mutated = d.withColumn("text",
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")))
      .filter(col("doc_id") % 7 =!= 0)
    val a = Audit.diff(d, mutated, col("doc_id"), col("text"))
    val b = Audit.diff(d.repartition(13, col("lang")), mutated.repartition(7),
      col("doc_id"), col("text"))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    val counts = a.groupBy("status").count().as[(String, Long)].collect().toMap
    assert(counts("removed") > 0 && counts("changed") > 0 && counts("unchanged") > 0)
    assert(!counts.contains("added"))
  }
}
