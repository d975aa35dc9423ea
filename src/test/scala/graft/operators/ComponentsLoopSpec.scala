package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Direct tests of the connected-components label-propagation loop on
 * crafted edge lists. The oracle-gated queries only ever see shallow
 * near-dup clusters (diameter ≤ 2); minimum-label propagation moves one
 * hop per round, so a LONG chain is the case where a fixpoint loop with
 * a broken convergence test would stop early and mislabel — exactly what
 * these graphs pin down.
 */
class ComponentsLoopSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def components(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.componentsOf(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("a 40-node path converges to one component despite 1-hop-per-round propagation") {
    val path = (0L until 39L).map(i => (i, i + 1))
    val got = components(path)
    assert(got.keySet == (0L to 39L).toSet)
    assert(got.values.forall { case (rep, size) => rep == 0L && size == 40L })
  }

  test("disjoint components keep separate minimum-id representatives") {
    // a path 10..15, a triangle 20/21/22, an isolated edge 30-31
    val edges = (10L until 15L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
    val got = components(edges)
    assert((10L to 15L).forall(i => got(i) == (10L, 6L)))
    assert((20L to 22L).forall(i => got(i) == (20L, 3L)))
    assert(Seq(30L, 31L).forall(i => got(i) == (30L, 2L)))
  }

  test("propagation is direction-independent (min id at either end of the chain)") {
    // min at the far end, reversed pair order — the loop must carry the
    // label AGAINST the pair orientation via the symmetrized edge list
    val chain = (1L to 25L).map(i => (i, i + 1)) :+ (26L, 0L)
    val got = components(chain)
    assert(got.values.forall { case (rep, size) => rep == 0L && size == 27L })
  }
}
