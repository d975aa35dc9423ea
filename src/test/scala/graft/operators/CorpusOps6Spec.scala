package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/**
 * Laws for the round-14 batch-6 operators: a plain-Scala replay of the
 * token-fertility table, KMV overlap in the exact regime (sketches
 * complete → estimates ARE the exact values), a synthetic >k corpus that
 * activates the estimator path with known ground truth, and a plain-Scala
 * argmax replay of the semantic-decontamination top-1.
 */
class CorpusOps6Spec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark
  private val sf = graft.TestSpark.Sf0001

  private var dir: String = _
  override def beforeAll(): Unit =
    dir = java.nio.file.Files.createTempDirectory("graft_ops6").toString
  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }

  // ---------------------------------------------------- text_token_fertility

  test("textTokenFertility: plain-Scala replay of every count and ratio") {
    val subtok = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    val expect = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
      .groupBy(_._1).map { case (k, rows) =>
        val texts = rows.map(_._2)
        val w = texts.map(_.split("\\s+", -1).length.toLong).sum
        val s = texts.map(t => subtok.findAllIn(t).length.toLong).sum
        val ch = texts.map(_.length.toLong).sum
        k -> (texts.length.toLong, w, s, ch,
              s * 1000000L / w, ch * 1000L / s)
      }
    val got = TextAnalysis.textTokenFertility(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
                 (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
                  r.getLong(6), r.getLong(7)))).toMap
    assert(got == expect)
  }

  // ------------------------------------------------------------ kmv_overlap

  test("kmvOverlap: exact regime at sf0.001 — complete sketches make the " +
       "estimates exactly the true set sizes") {
    val rows = Sketches.kmvOverlap(spark, sf).collect()
    assert(rows.length == 10) // C(5 event types, 2)
    rows.foreach { r =>
      val (kKept, interInK) = (r.getLong(2), r.getLong(3))
      val (estU, estI, estJ) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val (exU, exI) = (r.getLong(7), r.getLong(8))
      assert(kKept < 256, "sf0.001 must be the exact regime (15 users/type)")
      assert(kKept == exU, "complete sketches: union kept == exact union")
      assert(interInK == exI, "complete sketches: in-k intersection is exact")
      assert(estU == exU.toDouble)
      val jacc = BigDecimal(exI.toDouble / exU)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(estJ == jacc)
      assert(estI == BigDecimal(jacc * estU)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("kmvOverlap: estimator activation on a synthetic >k corpus with " +
       "known overlap") {
    import spark.implicits._
    val sub = s"$dir/kmv_big"
    // type A: users 0..999; type B: users 500..1499 — true union 1500,
    // intersection 500, Jaccard 1/3; both sides far above k=256
    val rows = (0L until 1000L).map(u => (u, "A")) ++
               (500L until 1500L).map(u => (u, "B"))
    rows.toDF("user_id", "event_type")
      .select(monotonically_increasing_id().as("event_id"),
              to_timestamp(lit("2026-01-01 00:00:00")).as("ts"),
              col("user_id"), col("event_type"),
              lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$sub/events.parquet")
    val r = Sketches.kmvOverlap(spark, sub).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 256, "estimator path: union sketch saturated at k")
    assert(row.getLong(7) == 1500 && row.getLong(8) == 500, "exact columns")
    val estU = row.getDouble(4); val estJ = row.getDouble(6)
    // KMV relative error ~ 1/sqrt(k) ≈ 6%; assert a loose 3-sigma band
    assert(math.abs(estU - 1500.0) / 1500.0 < 0.2, s"est_union $estU")
    assert(math.abs(estJ - 1.0 / 3.0) < 0.12, s"est_jaccard $estJ")
  }

  // ------------------------------------------------- split_semantic_decontam

  test("splitSemanticDecontam: plain-Scala argmax replay — best train " +
       "neighbor, cosine, and flag match per eval vector") {
    val splits = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), Sampling.splitCol(col("vec_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nrm = vecs.map { case (id, v, _) => id -> math.sqrt(dot(v, v)) }.toMap
    val byLabel = vecs.groupBy(_._3)
    val expect = vecs.filter(v => splits(v._1) != "train").flatMap {
      case (eid, ev, lbl) =>
        val train = byLabel(lbl).filter(t => splits(t._1) == "train")
        if (train.isEmpty) None
        else {
          val scored = train.map { case (tid, tv, _) =>
            (r6(dot(ev, tv) / (nrm(eid) * nrm(tid))), -tid)
          }
          val best = scored.max
          Some(eid -> (-best._2, best._1, train.length.toLong, best._1 >= 0.3))
        }
    }.toMap
    val got = Similarity.splitSemanticDecontam(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  // ---------------------------------------------------------- eval_knn_label

  test("evalKnnLabel: per-label counts partition the evaluated set, " +
       "accuracy is the exact ppm division, and coverage is total when " +
       "no vector is alone in its bucket") {
    val rows = Similarity.evalKnnLabel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, ppm) =>
      assert(c >= 0 && c <= n)
      assert(ppm == c * 1000000L / n)
    }
    val labelTotals = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // evaluated n per label can only be <= the label's population
    rows.foreach { case (l, n, _, _) => assert(n <= labelTotals(l)) }
  }

  // ------------------------------------------------------------ events_scd2

  test("eventsScd2: plain-Scala replay — change points, versions, " +
       "intervals and the is_current flag") {
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val changes = sorted.zipWithIndex.filter { case (e, i) =>
        i == 0 || sorted(i - 1)._4 != e._4
      }.map(_._1)
      changes.zipWithIndex.map { case (e, i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
        (uid, i + 1, e._4, e._2) -> ((to, to.isEmpty))
      }
    }.toMap
    val rows = Events.eventsScd2(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)) ->
        ((if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    }.toMap
    assert(rows == expect)
    assert(rows.nonEmpty)
  }

  // -------------------------------------------------- graph_clustering_coeff

  test("graphClusteringCoeff: agrees with graphTriangles and the exact " +
       "ppm formula; coefficients live in [0, 1e6]") {
    val sf001 = "/root/testdata/sf0.01"
    val tri = Graph.graphTriangles(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Graph.graphClusteringCoeff(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, deg, n, c) = (r.getLong(0), r.getLong(1), r.getLong(2),
                             if (r.isNullAt(3)) None else Some(r.getLong(3)))
      assert(n == tri.getOrElse(id, 0L), s"triangle count mismatch at $id")
      if (deg >= 2) {
        assert(c.contains(n * 2000000L / (deg * (deg - 1))))
        assert(c.get >= 0 && c.get <= 1000000L, s"coeff out of range at $id")
      } else assert(c.isEmpty, s"deg-1 node $id must have NULL coeff")
    }
    // every triangle-carrying node appears in the coefficient table
    assert(tri.keySet.subsetOf(rows.map(_.getLong(0)).toSet))
  }
}
