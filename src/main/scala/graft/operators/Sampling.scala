package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Deterministic sampling/splitting for a training-data pipeline [EXT]:
 * hash-based train/valid/test assignment and per-stratum fixed-size
 * sampling. Randomness comes from [[Tables.md5Long]] over a salted key, so
 * assignments are (a) stable across runs, engines, partitionings, and
 * cluster sizes — the property `rand()` sampling lacks — and (b) exactly
 * reproducible by the DuckDB oracle.
 *
 * Scale shape: the split is a pure per-row map (no shuffle at all); the
 * per-stratum k-sample is one window over the stratum partition — the
 * standard "sorted-by-hash prefix" reservoir equivalent, one shuffle on
 * the stratum key with no skew risk beyond the strata themselves.
 */
object Sampling {

  /** Salt isolating this split from any other hash use of the same keys. */
  private val Salt = "graft_split_v1:"

  /** 80/10/10 split boundaries over the 100 hash buckets. */
  private val TrainUpTo = 80
  private val ValidUpTo = 90

  /** Per-document split assignment: bucket = md5-hash of the salted doc id
    * mod 100, then fixed 80/10/10 thresholds. Pure map — at 100 TB this
    * pushes down to the scan with zero data movement. */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
              (md5Long(concat(lit(Salt), col("doc_id").cast("string"))) % 100)
                .as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainUpTo, "train")
          .when(col("bucket") < ValidUpTo, "valid")
          .otherwise("test"))

  val sampleSplitSql: String =
    s"""SELECT doc_id, lang,
       |  CAST(('0x' || substring(md5('$Salt' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
       |  CASE WHEN CAST(('0x' || substring(md5('$Salt' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < $TrainUpTo THEN 'train'
       |       WHEN CAST(('0x' || substring(md5('$Salt' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < $ValidUpTo THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Per-stratum k. */
  private val PerStratum = 5

  /** Stratified fixed-size sample: the [[PerStratum]] documents with the
    * smallest salted hash per (lang, source) stratum — a deterministic
    * uniform-without-replacement sample (hash order is independent of any
    * data attribute), ranked by one window over the stratum. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
              md5Long(concat(lit(Salt), col("doc_id").cast("string"))).as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= PerStratum)
      .select(col("lang"), col("source"), col("rnk"), col("doc_id"))
  }

  val sampleStratifiedSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang, source,
       |         CAST(('0x' || substring(md5('$Salt' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM documents)
       |SELECT lang, source, CAST(rnk AS INT) AS rnk, doc_id FROM (
       |  SELECT lang, source, doc_id,
       |         row_number() OVER (PARTITION BY lang, source ORDER BY h ASC, doc_id ASC) AS rnk
       |  FROM h)
       |WHERE rnk <= $PerStratum""".stripMargin
}
