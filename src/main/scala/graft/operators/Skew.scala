package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Skew-handling operators [EXT]. AQE's skew-join split handles most cases
 * at runtime (demonstrated in ScaleTechniquesSpec: `skew=true` in the
 * final adaptive plan) — prefer it. Explicit salting remains the tool
 * where AQE's `OptimizeSkewedJoin` cannot reach:
 *  - the skewed shuffle feeds an AGGREGATION, not a join (AQE never
 *    splits a skewed aggregate partition — correctness would need a
 *    two-level agg, which is exactly what a salt + re-agg builds);
 *  - Structured Streaming joins (no AQE re-planning mid-stream);
 *  - the join's output partitioning is relied on downstream (AQE skew
 *    split is skipped when it would break a required distribution,
 *    e.g. under another join on the same key);
 *  - deterministic task sizing is wanted up front (AQE only reacts
 *    after the skewed map stage has already materialized).
 */
object Skew {

  /**
   * Salted inner equi-join on `key`: the big (skewed) side gets a
   * deterministic per-row salt in [0, salts), the small side is replicated
   * once per salt value, and the join key becomes (key, salt) — the hot
   * key's rows spread over `salts` tasks instead of one. Result is
   * multiset-identical to `big.join(small, key)`; cost is `salts`×
   * replication of the small side (keep it the dimension side).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted lineitem ⋈ part through the driver gate: the salt is internal
    * plumbing (xxhash64 differs from anything DuckDB can compute), but the
    * JOIN RESULT is salt-independent by construction, so the oracle is the
    * plain join — the differential check proves the salting is invisible,
    * which is the whole point. Aggregated per brand to keep output
    * group-sized. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
    val part = t(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    saltedJoin(li, part, "p_partkey", salts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
  }

  val joinSaltedSql: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin
}
