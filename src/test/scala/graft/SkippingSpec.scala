package graft

import org.apache.spark.sql.functions._
import graft.operators.Skipping

/** Laws for the per-file Bloom skipping index: lookup-equals-full-scan
  * (present, absent, and null-free), real file skipping on a point
  * probe, index determinism, and the missing-column guard.
  */
class SkippingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("skipping").toString
    Tables.documents(spark, sf001)
      .repartitionByRange(16, $"doc_id").sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$d/docs")
    d
  }

  private lazy val index =
    Skipping.buildIndex(spark, s"$dir/docs", "doc_id",
      expectedPerFile = 1000, fpp = 0.001).persist()

  test("point lookup equals the full-scan filter, present and absent") {
    val full = spark.read.parquet(s"$dir/docs")
    for (id <- Seq(0L, 123L, 499L, 777777L)) {
      val got = Skipping.readPoint(spark, s"$dir/docs", index, "doc_id", id)
      val want = full.filter($"doc_id" === id)
      assert(got.exceptAll(want).count() === 0, s"id $id extra rows")
      assert(want.exceptAll(got).count() === 0, s"id $id missing rows")
    }
  }

  test("a point probe skips most of the 16 files") {
    val n = index.count()
    assert(n === 16L, s"expected one index row per file, got $n")
    val may = Skipping.filesFor(index, lit(123L))
    assert(may.nonEmpty && may.size <= 2, s"probe touched ${may.size} of $n files")
    // an absent key should (at fpp 0.001 over 16 files) touch none
    assert(Skipping.filesFor(index, lit(987654321L)).isEmpty)
  }

  test("index build is deterministic") {
    val again = Skipping.buildIndex(spark, s"$dir/docs", "doc_id", 1000, 0.001)
    val a = index.select($"file", $"words").as[(String, Seq[Long])].collect()
      .map { case (f, w) => (f, w.hashCode) }.toMap
    val b = again.select($"file", $"words").as[(String, Seq[Long])].collect()
      .map { case (f, w) => (f, w.hashCode) }.toMap
    assert(a === b)
  }

  test("guard: unknown key column is rejected") {
    intercept[IllegalArgumentException](
      Skipping.buildIndex(spark, s"$dir/docs", "nope", 1000, 0.001))
  }
}
