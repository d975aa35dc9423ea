package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/**
 * Laws for the round-4 pipeline operators (chunking, duplicated-substring
 * scoring, domain mixing, similarity-graph PageRank, two-stage
 * retrieval) — structural invariants the DuckDB hash gate can't express,
 * plus plain-Scala differential twins for the iterative/ranked paths.
 */
class CorpusOps2Spec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark
  private val sf = graft.TestSpark.Sf0001

  private var dir: String = _
  override def beforeAll(): Unit =
    dir = java.nio.file.Files.createTempDirectory("graft_ops2").toString
  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }

  private def writeDocs(name: String, docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val sub = s"$dir/$name"
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
              lit("synthetic").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$sub/documents.parquet")
    sub
  }

  // ------------------------------------------------------------ text_chunks

  test("textChunks tiles every document: stride-spaced starts, full coverage, short tail") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val chunks = TextAnalysis.textChunks(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet) // every doc chunked, none invented
    for ((docId, cs) <- chunks) {
      val len = docs(docId)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong)) // dense ids
      assert(sorted.forall { case (_, cid, start, _) => start == 1 + cid * 24 })
      // every chunk is non-empty, within bounds, and the last one ends at len
      assert(sorted.forall { case (_, _, start, n) => n > 0 && start + n - 1 <= len })
      assert(sorted.map(c => c._3 + c._4 - 1).max == len)
      // full-width chunks everywhere except possibly the tail
      assert(sorted.init.forall(_._4 == 32))
      // minimality: the last 32-token window reaches the end of the doc,
      // the one before it does not (so no chunk is redundant)
      assert(sorted.last._3 + 31 >= len)
      assert(sorted.size == 1 || sorted.init.last._3 + 31 < len)
    }
  }

  // ----------------------------------------------------------- dedup_substr

  test("dedupSubstr flags shared and self-repeated spans, not unique text") {
    def span(seed: Int) = {
      val r = new scala.util.Random(seed)
      (1 to 10).map(_ => "w" + r.nextInt(100000)).mkString(" ")
    }
    val shared = span(1)
    val d = writeDocs("substr", Seq(
      1L -> s"${span(11)} $shared ${span(12)}",   // shares a span with doc 2
      2L -> s"${span(21)} $shared",               // shares with doc 1
      3L -> s"${span(31)} ${span(32)} ${span(33)}", // unique
      4L -> s"${span(41)} ${span(41)}"            // repeats its own span
    ))
    val out = Dedup.dedupSubstr(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 >= 1 && out(2L)._2 >= 1) // the shared 10-gram is caught
    assert(out(3L)._2 == 0)                    // unique text stays clean
    assert(out(4L)._2 >= 1)                    // within-doc repetition counts
    // every occurrence of a window is a window of its doc
    assert(out.values.forall { case (nw, nd) => nd <= nw })
  }

  // ------------------------------------------------------------ mix_domains

  test("mixDomains hits the target mix to integer rounding and never upsamples") {
    val rows = Sampling.mixDomains(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 1)
    assert(rows.forall { case (_, _, n, k) => k <= n && k >= 1 })
    // replicate the quota arithmetic exactly: c = min(n*1e6 div w),
    // k = (c*w) div 1e6
    val c = rows.map { case (_, w, n, _) => n * 1000000L / w }.min
    assert(rows.forall { case (_, w, _, k) => k == c * w / 1000000L })
    // proportionality: kept/w constant across domains up to floor rounding
    assert(rows.forall { case (_, w, _, k) =>
      c * w / 1000000L == k && (c - 1000000L / w) * w / 1000000L <= k })
  }

  // --------------------------------------------------------- graph_pagerank

  test("graphPagerank == plain-Scala integer PageRank on the same graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSeq
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = deg.map { case (n, _) =>
        n -> (150000L + 850000L * contrib(n) / 1000000L)
      }
    }
    val got = Graph.graphPagerank(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == deg.keySet)
    assert(got.forall { case (n, (d, _)) => d == deg(n) })
    assert(got.forall { case (n, (_, p)) => p == pr(n) }) // bit-exact twin
    // integer damping only ever loses mass to truncation
    assert(got.values.map(_._2).sum <= deg.size * 1000000L)
  }

  // -------------------------------------------------------- graph_triangles

  test("graphTriangles == brute-force triple enumeration on the same graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def adj(x: Long, y: Long) = pairs((math.min(x, y), math.max(x, y)))
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if adj(nodes(i), nodes(j))
      k <- (j + 1) until nodes.length
      if adj(nodes(j), nodes(k)) && adj(nodes(i), nodes(k))
    } {
      expected(nodes(i)) += 1; expected(nodes(j)) += 1; expected(nodes(k)) += 1
    }
    val got = Graph.graphTriangles(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap, s"\ngot:      $got\nexpected: ${expected.toMap}")
    // corner credits are triple-counted: the sum is divisible by 3
    assert(got.values.sum % 3 == 0)
  }

  // ------------------------------------------------------------- dedup_incr

  test("dedupIncremental matches new docs against the old index only") {
    import spark.implicits._
    val sub = s"$dir/incr"
    // src0 = incoming batch; srcX = existing corpus. Doc 1 clones old doc
    // 10; doc 2 is unique; old docs 11/12 clone each other (must NOT
    // produce a match — old-old pairs are the batch pipeline's job).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val uniq = "one two three four five six seven eight nine ten " * 3
    Seq((1L, base, "src0"), (2L, uniq, "src0"),
        (10L, base, "srcA"), (11L, s"$base extra", "srcA"),
        (12L, s"$base extra", "srcB"))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
              col("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$sub/documents.parquet")
    val out = Dedup.dedupIncremental(spark, sub)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L))      // one row per NEW doc only
    assert(out(1L)._1 >= 1)                // the clone is caught...
    assert(out(1L)._2 == 10L)              // ...earliest old match
    assert(out(2L) == (0L, -1L))           // clean doc: 0 matches, NULL
  }

  // ------------------------------------------------------------ ann_pq_topk

  test("annPqTopk returns dense per-query top-5 with monotone ADC scores") {
    val rows = Similarity.annPqTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 8 && rows.length == 40)
    for ((q, rs) <- byQ) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5))        // dense ranks
      assert(sorted.forall(_._3 != q))                  // never itself
      // scores non-increasing in rank (ties broken by neighbor id)
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
  }

  // ------------------------------------------------------------- ann_rerank

  test("annRerank == bruteforce top-k on this corpus (coarse stage loses nothing)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("rnk"), col("neighbor_id"))
        .collect().map(_.mkString("|")).sorted.toSeq
    // int8 coarse scoring keeps the true top-5 inside its top-40 candidates
    // for every query of this corpus, so the rerank output is exactly the
    // exact-search output — recall@5 = 1.0 (a data-dependent but
    // deterministic property; the hash gate pins the rerank output itself)
    assert(canon(Similarity.annRerank(spark, sf)) ==
           canon(Similarity.annBruteforceTopk(spark, sf)))
  }
}
