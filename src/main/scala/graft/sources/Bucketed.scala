package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table source/sink [EXT]: the storage-level answer to repeated
 * co-located joins. Writing both sides of a hot join bucketed (and
 * bucket-sorted) on the join key lets every subsequent sort-merge join
 * run with ZERO exchanges and zero sorts — at 100 TB that converts the
 * dominant shuffle of fact-to-fact joins into a pure map-side merge.
 * BucketingSpec proves the no-Exchange plan and result equality.
 */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed and sorted on
    * `bucketCol` into `numBuckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata flows from the catalog). */
  def table(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(name)
}
