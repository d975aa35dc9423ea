package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CollectLongsCapped.collectLongsCapped

/** [[graft.functions.CollectLongsCapped]] — the bounded-state posting-list
  * builder behind the shingle-pair machinery and split_ngram_decontam.
  * Laws: (1) under the cap it is collect_list's exact multiset (sorted);
  * (2) retention stops at `limit`, so `size = min(df, limit)` and a
  * `size ≤ limit − 1` filter keeps exactly the under-cap groups with
  * complete lists; (3) nulls are skipped like collect_list; (4) all of
  * the above hold across multi-partition partial/merge paths AND the
  * sort-based fallback (specs keep the default 128-group fallback
  * threshold, so the serialize/deserialize path runs here). */
class CollectCappedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ~300 groups (fallback threshold is 128, so sort-based fallback and
  // buffer serialization engage), group sizes 1..40 straddling the cap
  private def rows = {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    (1 to 3000).map { i =>
      val g = rnd.nextInt(300).toLong
      (g, (g * 1000 + rnd.nextInt(40)).toLong)
    }.toDF("g", "v").repartition(13)
  }

  test("capped collect ≡ sorted collect_list for under-cap groups; size = min(df, limit)") {
    val cap = 8
    val got = rows
      .groupBy(col("g"))
      .agg(count(lit(1)).as("df"),
           sort_array(collectLongsCapped(col("v"), cap + 1)).as("capped"),
           sort_array(collect_list(col("v"))).as("full"))
      .collect()
    assert(got.length > 200)
    var sawOver = false
    var sawUnder = false
    got.foreach { r =>
      val df = r.getAs[Long]("df")
      val capped = r.getSeq[Long](r.fieldIndex("capped"))
      val full = r.getSeq[Long](r.fieldIndex("full"))
      // size law: retention stops exactly at limit
      assert(capped.size == math.min(df, cap + 1),
        s"g=${r.getAs[Long]("g")}: size ${capped.size} != min($df, ${cap + 1})")
      if (df <= cap) {
        sawUnder = true
        // completeness law: under-cap lists are collect_list's multiset
        assert(capped == full)
      } else {
        sawOver = true
        // truncated lists are a sub-multiset of the full one
        val fullCount = full.groupBy(identity).view.mapValues(_.size)
        capped.groupBy(identity).foreach { case (v, occ) =>
          assert(occ.size <= fullCount.getOrElse(v, 0))
        }
      }
    }
    assert(sawOver && sawUnder, "test data must straddle the cap")
  }

  test("size filter selects exactly the under-cap groups, nulls skipped") {
    val cap = 8
    // null values interleaved: only even v survive, like collect_list
    val withNulls = rows.select(col("g"),
      when(col("v") % 2 === 0, col("v")).as("v"))
    val lhs = withNulls.groupBy(col("g"))
      .agg(sort_array(collectLongsCapped(col("v"), cap + 1)).as("ds"))
      .filter(size(col("ds")) <= cap)
      .collect().map(r => r.getAs[Long]("g") -> r.getSeq[Long](1)).toMap
    val rhs = withNulls.groupBy(col("g"))
      .agg(sort_array(collect_list(col("v"))).as("ds"))
      .filter(size(col("ds")) <= cap)
      .collect().map(r => r.getAs[Long]("g") -> r.getSeq[Long](1)).toMap
    assert(lhs == rhs) // same surviving groups, same complete lists
  }
}
