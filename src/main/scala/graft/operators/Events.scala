package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/**
 * Event-time windowing over the `events` table — the batch formulations of
 * the streaming shapes (SURVEY.md §2.3 "Streaming": entirely absent in the
 * reference, [EXT] here). Batch keeps every query DuckDB-oracle-able; the
 * same plans run under Structured Streaming (see graft.streaming) with
 * `readStream` + watermarks.
 *
 * Scale: all three queries partition by (window/user), i.e. one hash
 * exchange each; sessionization's window functions run on a
 * (user_id)-partitioned sort, which AQE can skew-split if one user is hot.
 */
object Events {

  /** Tumbling 1-hour windows per event type: count, exact value sum,
    * distinct users. Window start is emitted as a string for exact
    * cross-engine comparison. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("sum_value"),
           countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
              col("event_type"), col("n_events"), col("sum_value"), col("n_users"))

  val eventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows (1 h wide, 30 min slide): each event lands in exactly
    * two windows. Spark's `window()` generator vs. explicit integer epoch
    * arithmetic in the oracle — both align windows to the UTC epoch. */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
              col("event_type"), col("n_events"))

  val eventsSlidingSql: String =
    """WITH e AS (SELECT epoch_us(ts) AS eus, event_type FROM events),
      |w AS (SELECT unnest([eus - (eus % 1800000000),
      |                     eus - (eus % 1800000000) - 1800000000]) AS win_us,
      |             event_type
      |      FROM e)
      |SELECT strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M') AS win_start,
      |       event_type, COUNT(*) AS n_events
      |FROM w GROUP BY 1, 2""".stripMargin

  /**
   * Sessionization: split each user's event stream on >30 min inactivity
   * gaps (the classic lag + cumulative-flag-sum formulation — runs on one
   * sort within the (user_id) hash partition). Durations in exact
   * microseconds; values summed as exact decimal.
   */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byTs)
    events(spark, dir)
      .withColumn("is_new", when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_no",
        sum(col("is_new")).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
           (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"),
           dsum(col("value")).as("sum_value"))
  }

  val eventsSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > 30*60*1000000 THEN 1
      |         WHEN lag(epoch_us(ts), 1)
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      |         ELSE 0 END AS is_new
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM g)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  COUNT(*) AS n_events,
      |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_no""".stripMargin
}
