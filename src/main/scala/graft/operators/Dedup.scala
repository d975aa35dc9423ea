package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Deduplication operators for a training-data pipeline [EXT]: exact,
 * MinHash+LSH banding, SimHash, n-gram Jaccard, and embedding-cosine
 * near-dup.
 *
 * Scale design: every technique here avoids the O(n²) all-pairs trap —
 * candidate generation is always "shuffle on a blocking key, compare only
 * within blocks":
 *  - exact: one hash aggregate on md5(normalized text);
 *  - MinHash LSH: shingle explode → 16 minhashes (partial-agg'd min) →
 *    band signatures → equi-join on (band, signature). At 100 TB the only
 *    big shuffles are the doc-keyed minhash aggregate and the band-keyed
 *    join, both linear in corpus size;
 *  - SimHash: linear scan + 16-bit-prefix bucketing;
 *  - Jaccard: inverted-index join on shingle (pairs sharing no shingle are
 *    never materialized);
 *  - embedding: blocked on the coarse label (IVF-style), cosine inside
 *    blocks only.
 *
 * All hashing derives from [[Tables.md5Long]] so a DuckDB oracle reproduces
 * every candidate pair exactly.
 */
object Dedup {

  /** Tokens of a document (synthetic testdata is single-space separated;
    * `\s+` keeps it robust to real whitespace). */
  private def toks(c: Column): Column = split(c, "\\s+")

  /** Distinct 3-word shingles of a token array, via indexed transform. */
  private def shingles3(ts: Column): Column =
    array_distinct(filter(
      transform(ts, (x, i) =>
        when(i + 2 < size(ts), // 0-based: needs elements i, i+1, i+2
          concat_ws(" ", x, element_at(ts, i + 2), element_at(ts, i + 3)))),
      s => s.isNotNull))

  /** DuckDB twin of [[shingles3]] (1-based indexed lambda). */
  private val shingles3Sql: String =
    """list_distinct(list_filter(
      |  list_transform(ts, (x, i) -> CASE WHEN i + 2 <= len(ts)
      |    THEN x || ' ' || ts[i+1] || ' ' || ts[i+2] END),
      |  s -> s IS NOT NULL))""".stripMargin

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group on md5 of normalized text, keep the smallest doc_id
    * as the representative. One hash aggregate; the shuffle carries
    * (16-byte key, id) pairs, never the documents. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    """SELECT md5(lower(trim(text))) AS text_hash,
      |  MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- minhash

  /** MinHash parameters: 16 hash functions in 4 bands of 4 rows.
    * h_i(s) = (a_i·s + b_i) mod M over the shingle's md5-derived value;
    * a_i ≤ 31 and s < M = 2^31−1 keep products < 2^36 (no overflow in
    * either engine). */
  private val M = 2147483647L
  private val NumHashes = 16
  private val RowsPerBand = 4

  /** Per-document minhash signatures, banded; one row per (doc, band) with
    * a concatenated signature string. */
  private def bandedSignatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("ts"))
      .select(col("doc_id"), explode(shingles3(col("ts"))).as("shingle"))
      .select(col("doc_id"), (md5Long(col("shingle")) % M).as("sh"))
    docs
      .select(col("doc_id"), col("sh"),
              explode(sequence(lit(0), lit(NumHashes - 1))).as("i"))
      .select(col("doc_id"), col("i"),
              (((col("i") * 2 + 1) * col("sh") + (col("i") + 1) * 7919L) % M).as("hv"))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(col("hv")).as("minh"))
      .withColumn("band", (col("i") / RowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("minh")))),
                                s => s.getField("minh").cast("string")), ",").as("sig"))
  }

  private val bandedSignaturesSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS ts FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $M AS sh
       |  FROM (SELECT doc_id, unnest($shingles3Sql) AS shingle FROM ts)),
       |mh AS (
       |  SELECT doc_id, i, MIN(((i*2+1) * sh + (i+1) * 7919) % $M) AS minh
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS i) hf
       |  GROUP BY doc_id, i),
       |bands AS (
       |  SELECT doc_id, CAST(i // $RowsPerBand AS INT) AS band,
       |         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS sig
       |  FROM mh GROUP BY doc_id, band)""".stripMargin

  /** MinHash+LSH candidate pairs: documents sharing any band signature. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandedSignatures(spark, dir)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  val dedupMinhashLshSql: String =
    s"""$bandedSignaturesSql
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin

  /** Per-document minhash signature table (the reusable artifact a corpus
    * pipeline would persist; also directly checks the minhash math). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    bandedSignatures(spark, dir)
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("band"), col("sig")))),
                                s => s.getField("sig")), ";").as("signature"))

  val minhashSignaturesSql: String =
    s"""$bandedSignaturesSql
       |SELECT doc_id, string_agg(sig, ';' ORDER BY band) AS signature
       |FROM bands GROUP BY doc_id""".stripMargin

  // -------------------------------------------------------------- simhash

  /** 32-bit SimHash over token multiset: bit b is set iff the signed sum of
    * bit b across all token hashes is positive. Emitted with a 16-bit
    * prefix bucket — near-dups (small Hamming distance) tend to share it. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"), md5Long(col("tok")).as("h"),
              explode(sequence(lit(0), lit(31))).as("b"))
      .select(col("doc_id"), col("b"),
              when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1).as("sgn"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("sgn")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("simhash"))
      .select(col("doc_id"), col("simhash"), expr("shiftright(simhash, 16)").as("bucket"))

  val dedupSimhashSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |th AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
      |bits AS (
      |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) g
      |  GROUP BY doc_id, b),
      |sim AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc_id)
      |SELECT doc_id, simhash, simhash >> 16 AS bucket FROM sim""".stripMargin

  // -------------------------------------------------------------- jaccard

  /** N-gram Jaccard near-dup: inverted-index self-join on 3-gram shingles
    * (lang-blocked), so only pairs sharing at least one shingle are ever
    * scored. Jaccard = |A∩B| / (|A| + |B| − |A∩B|) from exact integer
    * counts. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), toks(col("text")).as("ts"))
      .select(col("doc_id"), col("lang"), explode(shingles3(col("ts"))).as("shingle"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
              (col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val dedupNgramJaccardSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS ts FROM documents),
       |sh AS (
       |  SELECT doc_id, lang, unnest($shingles3Sql) AS shingle FROM ts),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM sh a JOIN sh b
       |    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) >= 0.5""".stripMargin
}
