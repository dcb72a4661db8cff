package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted-join contract: identical answer to the plain join on skewed
  * data, hot-key rows actually spread across the salt space, and the
  * guards reject the shapes salting cannot express.
  */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // 5000 rows of one hot key + a long tail of singletons — the shape
  // that serializes an unsalted shuffle join
  private lazy val left = (
    (0 until 5000).map(i => ("hot", i.toLong)) ++
      (0 until 200).map(i => (s"tail$i", i.toLong))
  ).toDF("k", "v")
  private lazy val right = (
    Seq(("hot", 1.5), ("hot", 2.5)) ++ (0 until 150).map(i => (s"tail$i", i / 10.0))
  ).toDF("rk", "w")

  test("salted inner join equals the plain join on skewed keys") {
    val plain = left.join(right.withColumnRenamed("rk", "k"), Seq("k"))
      .select("k", "v", "w").collect().map(_.toString).sorted
    val salted = SkewJoin.salted(left, right, "k", "rk", salts = 8)
      .select("k", "v", "w").collect().map(_.toString).sorted
    assert(salted.length == plain.length, s"${salted.length} vs ${plain.length}")
    assert(salted.sameElements(plain), "salting changed the join answer")
  }

  test("salted left_outer join keeps unmatched left rows exactly once") {
    val plain = left.join(right.withColumnRenamed("rk", "k"), Seq("k"), "left_outer")
      .select("k", "v", "w").collect().map(_.toString).sorted
    val salted = SkewJoin.salted(left, right, "k", "rk", salts = 8, how = "left_outer")
      .select("k", "v", "w").collect().map(_.toString).sorted
    assert(salted.sameElements(plain),
      "left_outer: every tail50..199 row must survive exactly once with null w")
  }

  test("the hot key's rows spread across the whole salt space") {
    val salts = 8
    // recompute the salt exactly as the operator does and count per bucket
    val perSalt = left.filter(col("k") === "hot")
      .withColumn("_s", pmod(xxhash64(col("k"), col("v")), lit(salts.toLong)).cast("int"))
      .groupBy("_s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSalt.keySet == (0 until salts).toSet,
      s"5000 hot rows must hit all $salts salts: $perSalt")
    // xxhash64 is uniform: no salt should carry more than 2x its share
    assert(perSalt.values.max <= 2L * 5000 / salts,
      s"salt distribution too lopsided: $perSalt")
  }

  test("randomized: salted equals plain join on arbitrary key distributions") {
    // the asofJoin convention: brute-force equality on seeded random data,
    // a few Spark jobs, not per-case generation
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val keys = (0 until 40).map(i => s"k${rnd.nextInt(12)}") :+ null
      val l = (0 until 300).map(i => (keys(rnd.nextInt(keys.length)), rnd.nextLong()))
        .toDF("k", "v")
      val r = (0 until 60).map(i => (keys(rnd.nextInt(keys.length)), rnd.nextDouble()))
        .toDF("rk", "w")
      for (how <- Seq("inner", "left_outer")) {
        val plain = l.join(r.withColumnRenamed("rk", "k"), Seq("k"), how)
          .select("k", "v", "w").collect().map(_.toString).sorted
        val salted = SkewJoin.salted(l, r, "k", "rk", salts = 5, how = how)
          .select("k", "v", "w").collect().map(_.toString).sorted
        assert(salted.sameElements(plain), s"seed=$seed how=$how diverged")
      }
    }
  }

  test("salts=1 degenerates to the plain join; guards reject bad shapes") {
    val one = SkewJoin.salted(left, right, "k", "rk", salts = 1)
      .select("k", "v", "w").collect().map(_.toString).sorted
    val plain = left.join(right.withColumnRenamed("rk", "k"), Seq("k"))
      .select("k", "v", "w").collect().map(_.toString).sorted
    assert(one.sameElements(plain))
    intercept[IllegalArgumentException](
      SkewJoin.salted(left, right, "k", "rk", salts = 0))
    intercept[IllegalArgumentException](
      SkewJoin.salted(left, right, "k", "rk", 4, how = "full_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.salted(left, right.withColumn("k", lit(1)), "k", "rk", 4))
  }
}
