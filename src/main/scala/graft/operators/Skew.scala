package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-handling operators [EXT]. AQE's skew-join split handles most cases
 * at runtime; explicit salting remains the tool when one join key is hot
 * enough that even a split partition bottlenecks a single task (the
 * power-law user in a 100 TB event join).
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
}
