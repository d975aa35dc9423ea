package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/**
 * Semantics the DuckDB hash gate can't express for the lexical-retrieval
 * additions: BM25's ranking laws on controlled corpora, and containment
 * catching sub-document duplication that Jaccard structurally misses.
 */
class RetrievalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark

  private var dir: String = _
  override def beforeAll(): Unit =
    dir = java.nio.file.Files.createTempDirectory("graft_retr").toString
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

  // -------------------------------------------------------------- text_bm25

  test("bm25: higher tf at equal length ranks higher; longer doc at equal tf ranks lower") {
    // pad with tokens that are not query terms so dl is controlled
    def doc(joins: Int, pad: Int) =
      (Seq.fill(joins)("join") ++ Seq.fill(pad)("pad")).mkString(" ")
    val d = writeDocs("bm25_laws", Seq(
      1L -> doc(4, 16), // tf=4, dl=20
      2L -> doc(2, 18), // tf=2, dl=20  -> must score below doc 1
      3L -> doc(2, 38), // tf=2, dl=40  -> must score below doc 2
      4L -> doc(0, 20)  // no query terms -> score 0, still a corpus member
    ))
    val out = TextAnalysis.textBm25(spark, d)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(out(1L) > out(2L), s"tf law violated: $out")
    assert(out(2L) > out(3L), s"dl law violated: $out")
    assert(!out.contains(4L) || out(4L) == 0.0)
  }

  test("bm25: a rarer term outscores a common one at identical tf/dl") {
    // 'vector' appears in 1 of 6 docs, 'join' in all 6 — idf(vector) > idf(join)
    val d = writeDocs("bm25_idf", Seq(
      1L -> "vector pad pad pad",
      2L -> "join pad pad pad",
      3L -> "join pad pad pad",
      4L -> "join pad pad pad",
      5L -> "join pad pad pad",
      6L -> "join pad pad pad"
    ))
    val out = TextAnalysis.textBm25(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(out(1L) > out(2L), s"idf law violated: $out")
  }

  // ------------------------------------------------------ dedup_containment

  test("containment flags a chapter pasted into a book; jaccard misses it") {
    val chapter = (1 to 40).map(i => s"w$i").mkString(" ")
    val filler = (1000 to 1400).map(i => s"f$i").mkString(" ")
    val d = writeDocs("containment", Seq(
      1L -> chapter,                  // the small doc
      2L -> (filler + " " + chapter), // contains it verbatim, 10x larger
      3L -> (1 to 40).map(i => s"z$i").mkString(" ") // unrelated control
    ))
    val cont = Dedup.dedupContainment(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == Set((1L, 2L)), s"expected exactly the contained pair, got $cont")
    val jac = Dedup.dedupNgramJaccard(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)),
      "jaccard should miss sub-document duplication (that's why containment exists)")
  }

  test("containment is bounded by 1 and symmetric in pair orientation (doc_a < doc_b)") {
    val out = Dedup.dedupContainment(spark, graft.TestSpark.Sf0001).collect()
    for (r <- out) {
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.8 && c <= 1.0, s"containment out of range: $c")
    }
  }

  // --------------------------------------------------------- text_classifier

  test("classifier inference is one scan + one doc-keyed aggregate (single exchange)") {
    val q = TextAnalysis.textClassifier(spark, graft.TestSpark.Sf0001)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
    // score reconstructs from the emitted integers: sigmoid(s/(1000 n))
    val rows = q.collect()
    for (r <- rows.take(50)) {
      val expected = BigDecimal(
        1.0 / (1.0 + math.exp(-(r.getLong(2).toDouble / (r.getLong(1) * 1000).toDouble))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expected, s"score mismatch: $r")
    }
    val bands = rows.map(_.getString(4)).toSet
    assert(bands.subsetOf(Set("keep", "review", "drop")))
  }

  // ------------------------------------------------------------- bpe_merges

  test("bpe merge selection == plain-Scala reference (greedy leftmost, weighted, tie-broken)") {
    // crafted corpus: 'aaaa' stresses greedy-leftmost (one (a,a) merge
    // must yield TWO pairs per word, (aa)(aa), not (aa)a a)
    val d = writeDocs("bpe", Seq(
      1L -> "aaaa aaaa aaaa banana banana bandana",
      2L -> "aaaa banana bandana cabana",
      3L -> "na na na batman"
    ))
    // reference implementation: greedy leftmost merge over symbol vectors
    def mergePairs(w: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { out += (a + b); i += 2 }
        else { out += w(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] = {
      val toks = Seq("aaaa", "aaaa", "aaaa", "banana", "banana", "bandana",
                     "aaaa", "banana", "bandana", "cabana",
                     "na", "na", "na", "batman")
      toks.groupBy(identity).map { case (t, g) =>
        t.map(_.toString).toVector -> g.size.toLong }
    }
    val expected = (1 to 4).map { round =>
      val counts = vocab.toSeq.flatMap { case (w, f) =>
        w.zip(w.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.toSeq.map { case (w, f) => mergePairs(w, a, b) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (round.toLong, a, b, cnt)
    }
    val got = TextAnalysis.bpeMerges(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  // --------------------------------------------------------- pack_sequences

  /** Replay a packing result shard by shard: every chunk's (pack_id,
    * offset, crosses) must equal the running concat total's derivation. */
  private def checkPackingReplay(dir: String): Unit = {
    val out = TextAnalysis.packSequences(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
                 (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
                  r.getBoolean(7))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2))).toMap
    assert(out.nonEmpty)
    for ((shard, chunks) <- out) {
      var cum = 0L
      for ((doc, cid, n, packId, offset, crosses) <- chunks) {
        assert(packId == cum / 256, s"$shard doc=$doc chunk=$cid")
        assert(offset == cum % 256, s"$shard doc=$doc chunk=$cid")
        assert(crosses == (cum % 256 + n > 256), s"$shard doc=$doc chunk=$cid")
        cum += n
      }
    }
  }

  test("packing tiles each shard's token stream exactly: no gaps, no overlaps, correct cuts") {
    checkPackingReplay(graft.TestSpark.Sf0001)
  }

  test("packing replay law holds on randomized corpora (doc lengths 1..600, shard boundaries)") {
    val rnd = new scala.util.Random(7)
    // lengths stress the edges: single-token docs, exactly one chunk (32),
    // exactly the pack capacity (256), and long multi-chunk docs; doc_ids
    // span multiple 100-doc shards
    val lens = Seq(1, 31, 32, 33, 256, 600) ++ (1 to 44).map(_ => 1 + rnd.nextInt(600))
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i * 7L) -> (1 to len).map(k => s"t$k").mkString(" ") // ids cross shards
    }
    checkPackingReplay(writeDocs("pack_rand", docs))
  }

  // --------------------------------------------------------- ann_hybrid_rrf

  test("rrf: fused output is consistent with its two channels' ranks") {
    import org.apache.spark.sql.expressions.Window
    val sf = graft.TestSpark.Sf0001
    val out = Similarity.annHybridRrf(spark, sf).collect()
    assert(out.length == 10)
    for (r <- out) {
      val (rl, rd) = (Option(r.get(1)), Option(r.get(2)))
      assert(rl.nonEmpty || rd.nonEmpty, "a fused doc must come from some channel")
      val expected =
        rl.map(x => 1.0 / (60 + x.asInstanceOf[Int])).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x.asInstanceOf[Int])).getOrElse(0.0)
      assert(r.getDouble(3) == expected, s"rrf score mismatch on $r")
    }
    // monotone: output is sorted by fused score desc
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
    // a doc present in BOTH channels at rank 1 would dominate any
    // single-channel doc; more weakly: the top fused doc's score must be
    // >= the best achievable single-channel score
    assert(scores.head >= 1.0 / 61)
  }

  test("rrf: each channel is cut to its depth before any window (no global sort)") {
    val q = Similarity.annHybridRrf(spark, graft.TestSpark.Sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  // --------------------------------------------------------- events_retention

  test("retention triangle laws: day-0 is the full cohort; cells bounded by cohort size") {
    val out = Events.eventsRetention(spark, graft.TestSpark.Sf0001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (ds, active, size, pm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ds >= 0)
      assert(active >= 1 && active <= size, s"cell exceeds cohort: $r")
      assert(pm == active * 1000 / size)
      if (ds == 0) assert(active == size, s"day-0 must be the whole cohort: $r")
    }
    // cohort sizes sum to the distinct-user universe
    val universe = Tables.events(spark, graft.TestSpark.Sf0001)
      .select("user_id").distinct().count()
    val sums = out.filter(_.getLong(1) == 0).map(_.getLong(3)).sum
    assert(sums == universe, s"cohorts must partition users: $sums != $universe")
  }

  // ------------------------------------------------------ cms_heavy_hitters

  test("count-min: estimate >= exact for the reported users; overcount column agrees") {
    val out = Sketches.cmsHeavyHitters(spark, graft.TestSpark.Sf0001).collect()
    assert(out.length == 10)
    for (r <- out) {
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS one-sided guarantee violated: est=$est < exact=$exact")
      assert(over == est - exact)
    }
  }

  test("count-min: the one-sided guarantee holds for EVERY user, not just the top-10") {
    // rebuild the 4x1024 sketch with the query's own hash primitives and
    // probe every distinct user — CMS must never undercount anyone
    import graft.operators.Tables.md5Long
    val ev = Tables.events(spark, graft.TestSpark.Sf0001).select(col("user_id"))
    val cells = ev
      .select(col("user_id"), explode(array((0 until 4).map(lit): _*)).as("r"))
      .select(col("user_id"), col("r"),
              pmod(md5Long(concat_ws("\u0001", col("r"), col("user_id"))), lit(1024)).as("c"))
    val regs = cells.groupBy("r", "c").agg(count(lit(1)).as("cnt"))
    // register mass conservation: each of the 4 rows holds every event once
    val total = ev.count()
    val rowMass = regs.groupBy("r").agg(sum("cnt").as("m")).collect()
    assert(rowMass.length == 4 && rowMass.forall(_.getLong(1) == total), rowMass.toSeq)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
    val est = cells.join(regs, Seq("r", "c"))
      .groupBy("user_id").agg((min("cnt")).as("est"))
    val viol = exact.join(est, "user_id").filter(col("est") < col("exact")).count()
    assert(viol == 0, s"$viol users undercounted")
  }
}
