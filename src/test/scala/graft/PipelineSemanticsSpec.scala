package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators._

/**
 * Semantic spot-checks of the [EXT] pipeline operators on a hand-crafted
 * corpus with known answers (the DuckDB differential gate covers the
 * driver's synthetic data; these pin down the intended semantics on inputs
 * where the right answer is computable by eye).
 */
class PipelineSemanticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private var dir: String = _

  override def beforeAll(): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_semantics")
    dir = tmp.toString
    val s = spark
    import s.implicits._

    val longText = (Seq.fill(15)("the quick fox").mkString(" ")) // 45 tokens, has stopword
    val docs = Seq(
      // two exact duplicates
      (0L, "hello world hello world hello", "en", "web", 29L),
      (1L, "hello world hello world hello", "en", "web", 29L),
      // order-swap probe for the fingerprint
      (2L, "alpha beta", "en", "web", 10L),
      (3L, "beta alpha", "en", "web", 10L),
      // quality: long doc with stopwords -> keep
      (4L, longText, "en", "book", longText.length.toLong)
    )
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    def unit(i: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a
    }
    val embs = Seq(
      (0L, unit(0), 0),            // query with an exact twin
      (1L, unit(0), 0),            // identical to vec 0 -> cosine 1
      (2L, unit(1), 0),            // orthogonal, same cluster
      (3L, unit(2), 1),
      (4L, { val a = unit(0); a(1) = 1.0f; a }, 0), // 45° to vec 0
      (5L, unit(3), 1)
    )
    embs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }

  test("dedup_exact groups identical texts under the min doc_id") {
    val rows = Dedup.dedupExact(spark, dir).collect()
    assert(rows.length == 4) // 5 docs, one exact-dup pair
    val dup = rows.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("rep_doc_id") == 0L)
  }

  test("ngram jaccard scores the exact-dup pair at 1.0") {
    val rows = Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((0L, 1L, 1.0)))
  }

  test("connected components group the exact-dup pair under the min doc_id") {
    val rows = Dedup.dedupComponents(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep_doc_id"),
                 r.getAs[Long]("component_size"))).toSet
    assert(rows.contains((0L, 0L, 2L)) && rows.contains((1L, 0L, 2L)),
           s"docs 0 and 1 are identical and must share component 0: $rows")
  }

  test("fingerprint is order-sensitive, token count is not") {
    val m = TextAnalysis.textFingerprint(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fingerprint"), r.getAs[Long]("n_tokens"))).toMap
    assert(m(2L)._2 == 2L && m(3L)._2 == 2L)
    assert(m(2L)._1 != m(3L)._1) // "alpha beta" vs "beta alpha"
    assert(m(0L)._1 == m(1L)._1) // identical texts agree
  }

  test("quality flag keeps the long stopworded doc, drops the short ones") {
    val m = TextAnalysis.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality_flag")).toMap
    assert(m(4L) == "keep")
    assert(Seq(0L, 1L, 2L, 3L).forall(m(_) == "drop"))
  }

  test("brute-force ANN ranks the identical vector first with cosine 1") {
    val top1 = Similarity.annBruteforceTopk(spark, dir).collect()
      .filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Int]("rnk") == 1).head
    assert(top1.getAs[Long]("neighbor_id") == 1L)
    assert(math.abs(top1.getAs[Double]("cos") - 1.0) < 1e-12)
    // the 45-degree vector scores 1/sqrt(2) somewhere in the top-k
    val cos45 = Similarity.annBruteforceTopk(spark, dir).collect()
      .find(r => r.getAs[Long]("q_id") == 0L && r.getAs[Long]("neighbor_id") == 4L).get
    assert(math.abs(cos45.getAs[Double]("cos") - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("IVF ANN finds the identical vector when probing its own cluster") {
    val top1 = Similarity.annIvfTopk(spark, dir).collect()
      .filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Int]("rnk") == 1).head
    assert(top1.getAs[Long]("neighbor_id") == 1L)
  }

  test("LSH buckets put identical vectors together") {
    // bucket histogram: vecs 0 and 1 are identical -> same bucket, so no
    // bucket holding vec 0 can have n_vecs == 1
    val rows = Similarity.annLshBuckets(spark, dir).collect()
    val b0 = rows.find(_.getAs[Long]("min_vec_id") == 0L).get
    assert(b0.getAs[Long]("n_vecs") >= 2L)
  }

  test("embedding near-dup reports the identical pair blocked by cluster") {
    val pairs = Similarity.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(0L, 3L) }) // cross-cluster never scored
  }

  test("media features: stub decode is deterministic and hash-exact") {
    val text = "hello world hello world hello" // 29 ASCII bytes -> 1 frame
    val r = Multimodal.mediaFeatures(spark, dir).collect()
      .find(_.getAs[Long]("doc_id") == 0L).get
    assert(r.getAs[Int]("n_bytes") == 29)
    assert(r.getAs[Int]("n_frames") == 1)
    assert(r.getAs[Long]("content_hash") ==
      graft.operators.Tables.md5LongOf(text.getBytes("UTF-8")))
    val byteSum = text.getBytes("UTF-8").map(_ & 0xff).sum.toLong
    assert(r.getAs[Long]("sampled_byte_sum") == byteSum)
    assert(r.getAs[Double]("frame_mean") == byteSum.toDouble / 29)
  }

  test("asofJoin: inclusive at equal time, latest-id tiebreak, null when none precedes") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 8L), (1L, 60L, 5L), (2L, 20L, 9L))
      .toDF("k", "t", "rid")
      .withColumn("rt", org.apache.spark.sql.functions.col("t"))
    val got = graft.operators.JoinsExt
      .asofJoin(left, right, "k", "t", payload = Seq("rid", "rt"), rightOrd = "rid")
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Any]("asof_rid")), Option(r.getAs[Any]("asof_rt")))).toSet
    assert(got == Set(
      ("p1", Some(8L), Some(100L)),  // equal time included; rid 8 beats 7
      ("p0", None, None),            // nothing at or before t=50
      ("p2", None, None)))           // right row at t=20 is after t=10
  }

  test("rangeJoinPoints: half-open [lo, hi) boundaries across bucket edges") {
    val s = spark
    import s.implicits._
    val points = Seq(0.0, 99.9, 100.0, 150.0, 250.0).toDF("p")
    val intervals = Seq((1L, 100.0, 250.0), (2L, 0.0, 100.0)).toDF("id", "lo", "hi")
    val got = graft.operators.JoinsExt
      .rangeJoinPoints(points, "p", intervals, "lo", "hi", bucketWidth = 100.0)
      .select("id", "p").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 100.0), (1L, 150.0), (2L, 0.0), (2L, 99.9)))
    // 250.0 excluded (hi), 100.0 in interval 1 not 2 (half-open)
  }

  test("media frames: every 4th frame is sampled with correct geometry") {
    val doc4Len = Seq.fill(15)("the quick fox").mkString(" ").length // 209 bytes
    val frames = Multimodal.mediaFrames(spark, dir).collect()
      .filter(_.getAs[Long]("doc_id") == 4L)
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Int]("frame_len"))).sorted
    // 209 bytes -> 7 frames (6x32 + 17); sampled: 0 and 4
    assert(doc4Len == 209)
    assert(frames.toSeq == Seq((0, 32), (4, 32)))
  }
}
