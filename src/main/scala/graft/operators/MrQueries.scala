package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.mr.{MrApps, MrJob}
import Tables._

/**
 * The reference's two real queries (SURVEY.md §2.2 A1/A2), run BOTH ways:
 *  - through the faithful MR engine (`MrJob` + `MrApp`), where each
 *    `documents` row plays the role of one input file (key = doc_id,
 *    value = text);
 *  - as idiomatic DataFrame twins, where Spark's hash aggregate gets
 *    map-side partial aggregation the reference never had
 *    (`app-wc/src/lib.rs:12` ships one `("w","1")` per token across the
 *    shuffle; the twin ships one `(word, count)` per partition).
 */
object MrQueries {

  /** A1 via the engine: word count over `documents.text`. */
  def mrWordCount(spark: SparkSession, dir: String): DataFrame =
    MrJob.run(MrJob.tableInput(t(spark, dir, "documents"), "doc_id", "text"),
              MrApps.load("wc")).toDF()

  val mrWordCountSql: String =
    """SELECT w AS key, CAST(COUNT(*) AS VARCHAR) AS value
      |FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w FROM documents)
      |WHERE w <> '' GROUP BY w""".stripMargin

  /** A2 via the engine: inverted index word -> "count id1,id2,..." with the
    * §1.4 sorted-value guarantee observable in the comma list. */
  def mrInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    MrJob.run(MrJob.tableInput(t(spark, dir, "documents"), "doc_id", "text"),
              MrApps.load("indexer")).toDF()

  val mrInvertedIndexSql: String =
    """SELECT w AS key,
      |       CAST(COUNT(*) AS VARCHAR) || ' ' || string_agg(d, ',' ORDER BY d) AS value
      |FROM (SELECT DISTINCT w, d FROM (
      |        SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w,
      |               CAST(doc_id AS VARCHAR) AS d
      |        FROM documents))
      |WHERE w <> '' GROUP BY w""".stripMargin

  /** A3's query (the crash app minus fault injection, SURVEY.md §2.2):
    * four fixed keys, values sorted and space-joined — the engine-level
    * sorted-value guarantee made directly visible in the output. */
  def mrSortedConcat(spark: SparkSession, dir: String): DataFrame =
    MrJob.run(MrJob.tableInput(t(spark, dir, "documents"), "doc_id", "text"),
              MrApps.load("sorted_concat")).toDF()

  val mrSortedConcatSql: String =
    """WITH m AS (
      |  SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS val FROM documents
      |  UNION ALL
      |  SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
      |  UNION ALL
      |  SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
      |  UNION ALL
      |  SELECT 'd', 'xyzzy' FROM documents)
      |SELECT key, string_agg(val, ' ' ORDER BY val) AS value
      |FROM m GROUP BY key""".stripMargin

  /** A1 idiomatic twin: explode + codegen'd hash agg with partial
    * aggregation — the shape that scales to 100 TB. */
  def wcNative(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), "[^a-zA-Z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  val wcNativeSql: String =
    """SELECT w AS word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w FROM documents)
      |WHERE w <> '' GROUP BY w""".stripMargin

  /** A2 idiomatic twin: two-level aggregate (per-doc dedup, then index). */
  def invertedIndexNative(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("d"),
              explode(split(col("text"), "[^a-zA-Z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_docs"),
           concat_ws(",", sort_array(collect_list(col("d")))).as("docs"))

  val invertedIndexNativeSql: String =
    """SELECT w AS word, COUNT(*) AS n_docs, string_agg(d, ',' ORDER BY d) AS docs
      |FROM (SELECT DISTINCT w, d FROM (
      |        SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w,
      |               CAST(doc_id AS VARCHAR) AS d
      |        FROM documents))
      |WHERE w <> '' GROUP BY w""".stripMargin
}
