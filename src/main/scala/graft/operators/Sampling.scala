package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The split assignment over any doc_id column — shared with pipeline
    * compositions ([[Pipeline.corpusPrep]]); twin of [[splitSqlExpr]]. */
  private[operators] def splitCol(docId: Column): Column = {
    val bucket = md5Long(concat(lit(Salt), docId.cast("string"))) % 100
    when(bucket < TrainUpTo, "train")
      .when(bucket < ValidUpTo, "valid")
      .otherwise("test")
  }

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

  /** The split-assignment SQL expressions, shared with every oracle that
    * composes on the split (e.g. [[splitContamination]]). Defined BEFORE
    * their uses — object vals initialize in declaration order. */
  private[operators] val bucketSqlExpr: String =
    s"CAST(('0x' || substring(md5('$Salt' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
  private[operators] val splitSqlExpr: String =
    s"""CASE WHEN $bucketSqlExpr < $TrainUpTo THEN 'train'
       |     WHEN $bucketSqlExpr < $ValidUpTo THEN 'valid'
       |     ELSE 'test' END""".stripMargin

  val sampleSplitSql: String =
    s"""SELECT doc_id, lang,
       |  $bucketSqlExpr AS bucket,
       |  $splitSqlExpr AS split
       |FROM documents""".stripMargin

  /**
   * Train/test leakage detection (benchmark decontamination): count the
   * near-dup candidate pairs whose two documents landed in DIFFERENT
   * splits — exactly the pairs that leak evaluation data into training.
   * Composes the MinHash-LSH pair table with the hash split; the pair
   * table is O(near-dups), so the contamination join is tiny next to the
   * corpus at any scale. A production pipeline filters (or re-assigns by
   * cluster representative) every pair where split_a ≠ split_b.
   */
  def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
    val split = sampleSplit(spark, dir).select(col("doc_id"), col("split"))
    pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
             .as("n_leaky"))
  }

  val splitContaminationSql: String =
    s"""${Dedup.minhashPairsCtes},
       |sp AS (SELECT doc_id, $splitSqlExpr AS split FROM documents)
       |SELECT sa.split AS split_a, sb.split AS split_b, COUNT(*) AS n_pairs,
       |  CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky
       |FROM pairs
       |JOIN sp sa ON sa.doc_id = pairs.doc_a
       |JOIN sp sb ON sb.doc_id = pairs.doc_b
       |GROUP BY 1, 2""".stripMargin

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
