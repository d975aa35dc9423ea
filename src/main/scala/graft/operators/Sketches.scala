package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/**
 * Sketch operators [EXT] with exactly-reproducible results: where HLL /
 * approx quantile implementations differ between engines (and so can't be
 * differentially tested), a KMV (k-minimum-values) distinct sketch built
 * on the shared md5-derived hash is deterministic in BOTH Spark and
 * DuckDB — the oracle checks the sketch itself, not just its error bound.
 *
 * Scale: the k smallest hashes per group is a windowed top-k over the
 * deduped (group, hash) pairs — two hash exchanges, no per-group state
 * beyond k rows, mergeable across partitions (min-of-mins); at 100 TB
 * you'd lift the same math into a typed Aggregator to skip the
 * pre-distinct, with identical output.
 */
object Sketches {

  private val K = 32
  /** Hash space of [[Tables.md5Long]]: 15 hex digits = 60 bits. */
  private val M = 1L << 60

  /** KMV distinct-user estimate per event type, next to the exact count:
    * estimate = (k-1) * |hash space| / kth-minimum-hash (the classic KMV
    * estimator); exact when the group has fewer than k distinct values. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), md5Long(col("user_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col("event_type"), col("n_kept"), col("kth_min"),
              when(col("n_kept") < K, col("n_kept").cast("double"))
                .otherwise(round(lit((K - 1).toDouble) * lit(M.toDouble) / col("kth_min"), 6))
                .as("est_distinct"))
  }

  val kmvDistinctSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
       |h AS (SELECT event_type,
       |             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |      FROM d),
       |r AS (SELECT event_type, h,
       |             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
       |      FROM h),
       |k AS (SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth_min
       |      FROM r WHERE rnk <= $K GROUP BY 1)
       |SELECT event_type, n_kept, kth_min,
       |       CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
       |            ELSE round(CAST(${(K - 1).toDouble} AS DOUBLE) * ${M.toDouble} / kth_min, 6)
       |       END AS est_distinct
       |FROM k""".stripMargin
}
