package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/**
 * Laws for the round-13 operators: priority-sampling replay, domain-KL
 * integer replay on a crafted skewed corpus, common-neighbor link
 * prediction differential against a plain-Scala adjacency walk, and the
 * range-search ⊇ top-k containment law.
 */
class CorpusOps4Spec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark
  private val sf = graft.TestSpark.Sf0001

  private var dir: String = _
  override def beforeAll(): Unit =
    dir = java.nio.file.Files.createTempDirectory("graft_ops4").toString
  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }

  private def writeDocs(name: String, docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val sub = s"$dir/$name"
    docs.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
              lit("synthetic").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$sub/documents.parquet")
    sub
  }

  // --------------------------------------------------------- sample_weighted

  test("sampleWeighted: exact plain-Scala priority replay — top-100 set, " +
       "priorities, and the u-quantum all match") {
    val got = Sampling.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(got.length == 100)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = docs.map { case (id, w) =>
      val uq = Tables.md5LongOf(s"graft_wsample_v1:$id".getBytes("UTF-8")) %
        1000000L + 1L
      (id, uq, (w * 1000000L).toDouble / uq.toDouble)
    }.sortBy { case (id, _, p) => (-p, id) }.take(100)
    assert(got.sortBy { case (id, _, p) => (-p, id) }.toSeq == expect.toSeq)
    // the sample is genuinely weighted: its mean n_chars exceeds the
    // corpus mean (long docs carry proportionally higher priorities)
    val wById = docs.toMap
    val meanSample = got.map(g => wById(g._1)).sum.toDouble / got.length
    val meanCorpus = docs.map(_._2).sum.toDouble / docs.length
    assert(meanSample > meanCorpus)
  }

  // ------------------------------------------------------- mix_kl_divergence

  test("mixKlDivergence: integer nano-nat replay on a crafted skewed corpus; " +
       "the disjoint-vocabulary source dominates") {
    import spark.implicits._
    val sub = s"$dir/kl"
    // source 'bulk' carries ~90% of tokens; source 'odd' uses a disjoint
    // vocabulary, so its distribution is far from the corpus blend
    val bulk = (1L to 18L).map(i =>
      (i, (1 to 10).map(k => s"common${(i + k) % 7}").mkString(" "), "en", "bulk"))
    val odd = Seq((100L, (1 to 20).map(k => s"rare$k").mkString(" "), "en", "odd"))
    (bulk ++ odd).toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
              length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$sub/documents.parquet")
    val got = Sampling.mixKlDivergence(spark, sub).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // plain-Scala twin of the exact arithmetic (same md5 buckets, same
    // nano-nat per-term quantization, exact integer sum)
    val B = 512L
    val toks = (bulk ++ odd).flatMap { case (_, t, _, s) =>
      t.split("\\s+").toSeq.map(tok =>
        (s, Tables.md5LongOf(tok.getBytes("UTF-8")) % B))
    }
    val cSb = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cB = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nS = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    for ((src, (nTok, klFp, klNats)) <- got) {
      assert(nTok == nS(src))
      val expectFp = (0L until B).map { b =>
        val p = (cSb.getOrElse((src, b), 0L) + 1).toDouble / (nS(src) + B)
        val q = (cB.getOrElse(b, 0L) + 1).toDouble / (n + B)
        math.round(p * math.log(p / q) * 1000000000L)
      }.sum
      assert(klFp == expectFp, s"source $src")
      assert(klNats == BigDecimal(klFp.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // ordering is the law; magnitudes are smoothing-damped (20 tokens
    // spread over 512 add-one buckets), so assert a clear separation
    // rather than an absolute: the disjoint source is >10x farther
    assert(got("odd")._3 > 10 * got("bulk")._3 && got("odd")._3 > 0.1)
  }

  // ------------------------------------------------- graph_common_neighbors

  test("graphCommonNeighbors: differential against a plain-Scala adjacency " +
       "walk over the LSH pair graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty) // sf0.001 does produce near-dup pairs
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = pairs.toSet
    val expect = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((m, nbrs) <- adj; u <- nbrs; v <- nbrs
         if u < v && !edgeSet.contains((u, v))) {
      val deg = adj(m).size.toLong
      val (c0, r0) = expect.getOrElse((u, v), (0L, 0L))
      expect((u, v)) = (c0 + 1, r0 + 1000000L / deg)
    }
    val got = Graph.graphCommonNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect.toMap)
    // link PREDICTION: no candidate is an existing edge
    assert(got.keys.forall(k => !edgeSet.contains(k)))
  }

  // ----------------------------------------------------- ann_multiprobe_lsh

  test("annMultiprobeLsh: exact plain-Scala replay — probe set is the " +
       "Hamming-1 ball, candidates rescored exactly, same top-k") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def bucket(v: Array[Double]): Long =
      (0 until 8).map { j =>
        val h = Similarity.planes(j).toArray
        if (dot(v, h) > 0) 1L << j else 0L
      }.sum
    val bucketOf = vecs.map { case (id, v) => id -> bucket(v) }.toMap
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val expect = vecs.filter(_._1 < 8).flatMap { case (q, qv) =>
      val ball = (Set(bucketOf(q)) ++ (0 until 8).map(j => bucketOf(q) ^ (1L << j)))
      vecs.filter { case (n, _) => n != q && ball(bucketOf(n)) }
        .map { case (n, nv) => (q, n, dot(qv, nv) / (nrm(q) * nrm(n))) }
        .sortBy { case (_, n, c) => (-c, n) }.take(5).zipWithIndex
        .map { case ((_, n, c), i) => (q, i + 1, n, c) }
    }.toSet
    val got = Similarity.annMultiprobeLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
    // every returned neighbor really is within Hamming distance 1
    assert(got.forall { case (q, _, n, _) =>
      java.lang.Long.bitCount(bucketOf(q) ^ bucketOf(n)) <= 1 })
  }

  // ----------------------------------------------------- text_rake_keywords

  test("textRakeKeywords: hand-computed RAKE scores on a crafted corpus — " +
       "longer collocations outrank their sub-phrases") {
    val sub = writeDocs("rake", Seq(
      (1L, "deep learning of deep learning models", "en"),
      (2L, "learning rate and deep models", "en")))
    // phrases: [deep learning], [deep learning models], [learning rate],
    // [deep models]; freq deep=3 learning=3 models=2 rate=1;
    // deg deep=7 learning=7 models=5 rate=2
    val got = TextAnalysis.textRakeKeywords(spark, sub).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    val byPhrase = got.toMap
    assert(byPhrase == Map(
      "deep learning models" -> ((1L, 2333333L + 2333333L + 2500000L)),
      "deep models"          -> ((1L, 2333333L + 2500000L)),
      "deep learning"        -> ((1L, 2333333L + 2333333L)),
      "learning rate"        -> ((1L, 2333333L + 2000000L))))
    // output order is the rank order
    assert(got.map(_._1).toSeq == Seq(
      "deep learning models", "deep models", "deep learning", "learning rate"))
  }

  // ------------------------------------------------------- ann_range_search

  test("annRangeSearch: every hit clears the radius, and every IVF top-k " +
       "hit above the radius is contained in the range result") {
    val range = Similarity.annRangeSearch(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(range.forall(_._2 >= 0.25))
    val rangeKeys = range.map(_._1).toSet
    val topk = Similarity.annIvfTopk(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val shouldBeIn = topk.filter(_._2 >= 0.25).map(_._1)
    assert(shouldBeIn.forall(rangeKeys.contains),
      s"top-k hits above radius missing from range result")
    // and the range result is strictly larger than a k-cut wherever the
    // neighborhood is dense enough to matter (same probed candidates)
    assert(rangeKeys.size >= shouldBeIn.size)
  }
}
