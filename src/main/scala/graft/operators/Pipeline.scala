package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * The training-corpus preparation pipeline applied END-TO-END [EXT] — the
 * composition a production data run actually ships, as one declarative
 * plan: quality gate → exact dedup → MinHash near-dup removal →
 * deterministic split, reporting per-(split, lang) corpus statistics.
 * Every stage is an operator this library already oracle-gates on its
 * own; this entry gates their SEQUENCING (each stage consumes the
 * previous stage's survivors, not the raw table).
 *
 * Stage shapes at 100 TB:
 *  1. quality gate: scan filter on a stored column — pushes into the
 *     parquet reader (PushedFilters), no data movement;
 *  2. exact dedup: one hash agg on md5(normalized text) carrying only
 *     (hash, id), then a semi-join of the corpus against the surviving
 *     representative ids;
 *  3. near-dup removal: [[Dedup]]'s capped MinHash-LSH chain + CC loop,
 *     run on the exact-dedup survivors only;
 *  4. split: pure per-row hash map ([[Sampling.splitCol]]), zero shuffle.
 */
object Pipeline {

  /** Minimum document length surviving the quality gate (chars). */
  private val MinChars = 200

  def corpusPrep(spark: SparkSession, dir: String): DataFrame = {
    val quality = t(spark, dir, "documents").filter(col("n_chars") >= MinChars)
    val reps = quality
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // materialize the exact-dedup survivors once: the minhash chain, the
    // CC loop's edge base, and the final keep-join all consume this
    // table, and it only shrinks from here (a cluster run would persist
    // the stage boundary to storage for the same reason)
    val exact = Checkpoints.cut(quality.join(reps, Seq("doc_id"), "left_semi"))
    val nonReps = Dedup.componentsOf(Dedup.minhashPairsOf(exact))
      .filter(col("rep_doc_id") =!= col("doc_id"))
      .select(col("doc_id"))
    val kept = exact.join(nonReps, Seq("doc_id"), "left_anti")
    kept
      .select(Sampling.splitCol(col("doc_id")).as("split"),
              col("lang"), col("n_chars"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  val corpusPrepSql: String =
    s"""WITH RECURSIVE quality AS (
       |  SELECT * FROM documents WHERE n_chars >= $MinChars),
       |reps AS (
       |  SELECT MIN(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(lower(trim(text))) AS h FROM quality)
       |  GROUP BY h),
       |exact AS (
       |  SELECT q.* FROM quality q WHERE q.doc_id IN (SELECT doc_id FROM reps)),
       |${Dedup.componentsCtesFrom("exact")},
       |kept AS (
       |  SELECT e.* FROM exact e
       |  WHERE e.doc_id NOT IN
       |        (SELECT doc_id FROM comp WHERE rep_doc_id <> doc_id))
       |SELECT ${Sampling.splitSqlExpr} AS split, lang,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM kept GROUP BY 1, 2""".stripMargin
}
