package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/**
 * Plan-shape and semantics checks for the decision-support batch
 * (DecisionSupport.scala). Value correctness is the driver's DuckDB gate;
 * these tests pin the physical properties that make the queries survive a
 * 100× scale-up — broadcast dimension joins, semi/anti lowering (never a
 * row-multiplying inner join where existence is asked), and scalar
 * subqueries evaluated once rather than per row.
 */
class DecisionSupportSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = graft.TestSpark.Sf0001

  private def finalPlan(q: DataFrame): String = {
    q.collect() // materialize so AQE finalizes the physical plan
    q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q4 lowers EXISTS to a semi join (no row multiplication before the agg)") {
    val plan = finalPlan(DecisionSupport.q4OrderPriority(spark, Sf))
    assert(plan.contains("LeftSemi"), plan)
    // an order with 5 late lineitems must count once: the aggregate input
    // is the semi-join output, so total count == distinct orders counted
    val rows = DecisionSupport.q4OrderPriority(spark, Sf)
      .agg(org.apache.spark.sql.functions.sum("order_count")).collect()(0).getLong(0)
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .filter("o_orderdate >= '1996-01-01' and o_orderdate < '1997-01-01'").count()
    assert(rows <= orders, s"semi-join must not multiply: $rows > $orders")
  }

  test("q7/q8 dimension joins all broadcast; no dimension-side shuffle") {
    for (q <- Seq(DecisionSupport.q7VolumeShipping(spark, Sf),
                  DecisionSupport.q8MarketShare(spark, Sf))) {
      val plan = finalPlan(q)
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$plan")
    }
  }

  test("q15's max-of-aggregate is a one-row broadcast, not a re-aggregation per row") {
    val plan = finalPlan(DecisionSupport.q15TopSupplier(spark, Sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
           plan)
  }

  test("q15 returns every supplier tied at the max (exact decimal equality)") {
    val out = DecisionSupport.q15TopSupplier(spark, Sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"all rows must share the max revenue: ${revs.toSeq}")
  }

  test("q17's correlated average is computed once per part, not per lineitem probe") {
    // the plan must contain exactly 2 aggregates on the brand slice
    // (per-part avg + final sum), not an aggregate under a per-row subquery
    val plan = finalPlan(DecisionSupport.q17SmallQuantity(spark, Sf))
    assert(!plan.contains("Subquery"), s"subquery must be decorrelated:\n$plan")
  }

  test("q19's disjunction pushes per-side OR filters into BOTH scans") {
    val q = DecisionSupport.q19Disjunctive(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    // Catalyst factors the OR-of-ANDs into a part-only disjunction
    // (brand × size) pushed to the part scan and a lineitem-only
    // disjunction (quantity bands) pushed to the fact scan — neither
    // side reads rows that no disjunct could accept
    assert(plan.contains("PushedFilters: [IsNotNull(p_partkey), Or("), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"), plan)
  }

  test("q22 anti-join: idle customers have no recent orders, every output customer is above avg") {
    import org.apache.spark.sql.functions._
    val out = DecisionSupport.q22IdleCustomers(spark, Sf)
    val plan = finalPlan(out)
    assert(plan.contains("LeftAnti"), plan)
    // cross-check numcust against an independent formulation
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
    val ord = spark.read.parquet(s"$Sf/orders.parquet")
      .filter("o_orderdate >= '1999-01-01'").select("o_custkey").distinct()
    val avgBal = cust.filter("c_acctbal > 0")
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))).collect()(0).getDouble(0)
    val expected = cust.filter(col("c_acctbal") > avgBal)
      .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti").count()
    val got = out.agg(sum("numcust")).collect()(0).getLong(0)
    assert(got == expected)
  }

  test("q2 groupwise-min keeps ties and only min-cost suppliers") {
    import org.apache.spark.sql.functions._
    val out = DecisionSupport.q2MinCostSupplier(spark, Sf)
    // independent check: every (part, cost) in the output is that part's min
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val mins = li.groupBy("l_partkey", "l_suppkey").agg(min("l_extendedprice").as("c"))
      .groupBy("l_partkey").agg(min("c").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- out.collect())
      assert(r.getDouble(3) == mins(r.getLong(0)),
             s"part ${r.getLong(0)}: ${r.getDouble(3)} != min ${mins(r.getLong(0))}")
  }

  test("q11's grand total derives from the per-part aggregate (one materialized subtree, zero fact re-scans)") {
    // the logical plan names lineitem twice (the total is an aggregate
    // over the per-part aggregate, whose subtree appears under both the
    // scalar branch and the output branch). Through r14 the spec pinned
    // ReusedExchange as the mechanism — but that coupling silently broke
    // at sf1 once AQE broadcast the scalar (no matching exchange left to
    // reuse) and the fact scan+aggregate ran TWICE. r15 cuts the per-part
    // table's lineage instead, so BOTH consumers read the one
    // materialized RDD: the executed plan must contain no file scan at
    // all — the stronger guarantee, independent of AQE's join choices.
    val plan = finalPlan(DecisionSupport.q11ImportantParts(spark, Sf))
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("FileScan"),
           s"expected ZERO fact scans, both consumers must read the cut:\n$plan")
  }
}
