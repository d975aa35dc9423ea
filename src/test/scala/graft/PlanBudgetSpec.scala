package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape ratchet: pins the shuffle-exchange count of headline
 * queries at the measured value so a future refactor cannot silently
 * regress a plan (an extra Exchange at sf0.001 is an extra full-corpus
 * shuffle at 100 TB). Budgets are ceilings — a plan IMPROVEMENT lowers
 * the measured count and should lower the budget with it.
 *
 * The count is taken from the pre-execution physical plan (AQE's
 * runtime coalescing/reuse only ever removes exchanges, never adds).
 * Broadcast exchanges are deliberately NOT budgeted: broadcasting a dim
 * is the cheap path, and AQE moves joins in and out of broadcast by
 * statistics.
 */
class PlanBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def shuffles(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    "Exchange (hash|range|Single)".r.findAllIn(p).length
  }

  // the load-bearing claim of several Scaladocs: these are PURE MAPS —
  // nothing may ever cross the network
  test("zero-shuffle queries stay zero-shuffle") {
    for (q <- Seq("bpe_encode", "embed_quantize", "text_chunks", "sample_split"))
      assert(shuffles(q) == 0, s"$q grew a shuffle")
  }

  test("headline query shuffle budgets hold") {
    val budgets = Map(
      "q1_pricing_summary"  -> 1, // one agg exchange, nothing else
      "q6_forecast_revenue" -> 1,
      "q3_shipping_priority" -> 1, // dims broadcast; one fact agg exchange
      "dedup_exact"          -> 1,
      "quality_c4_rules"     -> 1, // explode + single doc-keyed combine
      "text_winnowing"       -> 1, // doc-partitioned window only
      "text_entropy"         -> 2, // (doc,char) combine + doc rollup
      "stats_ks_drift"       -> 2, // value histogram + per-type window
      "events_attribution"   -> 2, // as-of union window + channel rollup
      "events_path_topk"     -> 2, // user window + path agg
      "layout_zorder"        -> 2, // bucket agg (+ scalar-domain agg)
      "dedup_minhash_lsh"    -> 3,
      "media_phash"          -> 4,
      "eval_langid"          -> 4,
      "bloom_membership"     -> 4,
      "text_tfidf"           -> 5,
      "dsir_importance"      -> 5)
    for ((q, budget) <- budgets) {
      val n = shuffles(q)
      assert(n <= budget, s"$q: $n shuffles exceeds budget $budget")
    }
  }
}
