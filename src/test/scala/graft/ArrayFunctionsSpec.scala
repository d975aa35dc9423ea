package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CombinationPairs

/** Native combination-pair expression: bit-equality with the nested
  * transform(slice(...)) HOF formulation it replaced in the market-basket
  * and common-neighbor explodes, across width edge cases. */
class ArrayFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Random sorted-distinct long arrays plus every width edge: empty,
    * singleton, pair, the MaxBasketParts-style wide case, and an array
    * containing a null element (skipped by the native expression). */
  private def arrayFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val random = Seq.fill(200)(
      (1 to rnd.nextInt(12)).map(_ => rnd.nextInt(1000).toLong)
        .distinct.sorted)
    val edges = Seq(Seq.empty[Long], Seq(7L), Seq(1L, 2L), (1L to 64L))
    (random ++ edges).toDF("arr")
  }

  test("CombinationPairs is bit-identical to the nested transform form") {
    val hof = flatten(transform(col("arr"), (x, i) =>
      transform(slice(col("arr"), i + 2, size(col("arr"))),
                y => struct(x.as("a"), y.as("b")))))
    val df = arrayFixture.select(
      CombinationPairs.combinationPairs(col("arr")).as("native"), hof.as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("CombinationPairs edge semantics: count, order, nulls") {
    import spark.implicits._
    val out = Seq(Seq(3L, 1L, 2L)).toDF("arr")
      .select(explode(CombinationPairs.combinationPairs(col("arr"))).as("p"))
      .select(col("p.a"), col("p.b")).as[(Long, Long)].collect().toSeq
    // array order preserved (callers sort first), C(3,2) = 3 pairs
    assert(out == Seq((3L, 1L), (3L, 2L), (1L, 2L)))
    // null elements are skipped, not paired
    val withNull = spark.sql("SELECT array(1L, CAST(NULL AS BIGINT), 5L) AS arr")
      .select(explode(CombinationPairs.combinationPairs(col("arr"))).as("p"))
      .select(col("p.a"), col("p.b")).as[(Long, Long)].collect().toSeq
    assert(withNull == Seq((1L, 5L)))
    // null array propagates
    val n = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS arr")
      .select(CombinationPairs.combinationPairs(col("arr")).as("c"))
    assert(n.head.isNullAt(0))
  }
}
