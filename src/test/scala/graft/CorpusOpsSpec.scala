package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators._

/**
 * Semantics of the round-4 corpus-hygiene operators on hand-built corpora
 * with answers computable by eye: CCNet-style boilerplate removal
 * (chunk-hash document frequency), exact n-gram train/test
 * decontamination (including df-cap ACTIVATION — the hot-gram quadratic
 * edge), and unigram-LM quality scoring.
 *
 * The split assignment is hash-derived, so corpora are built in two
 * phases: probe the split of candidate doc ids first, then place texts on
 * ids with known splits.
 */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private var splitOf: Map[Long, String] = _

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val s = spark
    import s.implicits._
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dirs += dir
    dir
  }

  private val dirs = scala.collection.mutable.Buffer[String]()

  override def beforeAll(): Unit = {
    // probe which split each candidate id hashes into
    val probe = writeDocs((0L until 200L).map(id => (id, "x")))
    splitOf = Sampling.sampleSplit(spark, probe).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    dirs.foreach(d => rm(new java.io.File(d)))
  }

  // ------------------------------------------------------------ boilerplate

  test("text_boilerplate strips shared chunks, keeps unique bodies") {
    // 4 docs: 2-word-aligned unique bodies + a shared 4-token footer.
    // Threshold at 4 docs = max(2, ceil(5%)) = 2, so footer chunks
    // (df = 4) are boilerplate and every unique body chunk (df = 1) stays.
    val footer = "subscribe now legal notice"
    val bodies = Seq(
      "alpha bravo charlie delta",
      "echo foxtrot golf hotel",
      "india juliet kilo lima",
      "mike november oscar papa")
    val dir = writeDocs(bodies.zipWithIndex.map { case (b, i) =>
      (i.toLong, s"$b $footer")
    })
    val out = TextAnalysis.textBoilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    bodies.zipWithIndex.foreach { case (b, i) =>
      val r = out(i.toLong)
      assert(r.getLong(1) == 4, "n_chunks: 2 body + 2 footer")
      assert(r.getLong(2) == 2, "both footer chunks flagged")
      assert(r.getLong(3) == 8 && r.getLong(4) == 4, "kept = body tokens")
      assert(r.getDouble(5) == 0.5)
      assert(r.getString(6) == md5Hex(b), "cleaned text is exactly the body")
    }
  }

  test("text_boilerplate on an all-unique corpus removes nothing") {
    val dir = writeDocs(Seq(
      (0L, "one two three four"),
      (1L, "five six seven eight")))
    TextAnalysis.textBoilerplate(spark, dir).collect().foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == r.getLong(4))
    }
  }

  // ------------------------------------------------------------- decontam

  test("split_ngram_decontam finds planted verbatim overlap and df-caps hot grams") {
    val trainIds = (0L until 200L).filter(splitOf(_) == "train")
    val testIds = (0L until 200L).filter(splitOf(_) == "test")
    assert(trainIds.size >= 80 && testIds.size >= 10, s"probe: ${testIds.size} test ids")

    // a 9-token verbatim quote shared by one train and one test doc
    // -> 5 overlapping 5-grams -> a leak
    val quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    val t1 = trainIds.head; val e1 = testIds.head
    // a hot 5-token phrase planted in 70 docs (df = 70 > cap 64): without
    // the cap every cross-split pair among them would surface ('ok' rows);
    // with it they must vanish entirely
    val hot = "h1 h2 h3 h4 h5"
    val hotIds = trainIds.tail.take(62) ++ testIds.tail.take(8)
    assert(hotIds.exists(splitOf(_) == "train") && hotIds.exists(splitOf(_) == "test"))
    val rows =
      Seq((t1, s"t1pre alpha $quote t1post omega"), (e1, s"e1lead $quote e1tail")) ++
        hotIds.zipWithIndex.map { case (id, i) => (id, s"u${i}a u${i}b $hot u${i}c") }
    val dir = writeDocs(rows)
    val out = Sampling.splitNgramDecontam(spark, dir).collect()
    assert(out.length == 1, s"only the planted pair, got ${out.mkString(";")}")
    val r = out.head
    assert(r.getLong(0) == t1 && r.getLong(1) == e1)
    assert(r.getLong(2) == 5 && r.getString(3) == "leak")
  }

  // ----------------------------------------------------------- unigram LM

  test("text_unigram_lm scores frequent-token docs better and counts OOV") {
    val trainIds = (0L until 200L).filter(splitOf(_) == "train")
    val testIds = (0L until 200L).filter(splitOf(_) == "test")
    // train vocabulary: "common" dominates, "rare" appears once
    val rows = trainIds.take(10).map(id => (id, "common common common common")) ++
      Seq((trainIds(10), "rare common common common"),
          // test docs: one all-common, one with an unseen token
          (testIds.head, "common common common common"),
          (testIds(1), "common oovtoken common rare"))
    val dir = writeDocs(rows)
    val out = TextAnalysis.textUnigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val good = out(testIds.head); val mixed = out(testIds(1))
    assert(good.getLong(3) == 0, "no OOV in the all-common doc")
    assert(mixed.getLong(3) == 1, "exactly the unseen token is OOV")
    assert(good.getDouble(4) < mixed.getDouble(4),
      "frequent tokens -> lower mean negative log-likelihood")
    assert(out(trainIds.head).getString(1) == "train" &&
      mixed.getString(1) == "test")
  }
}
