package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Laws for the round-14 batch-9 operators: plain-Scala replays of the
 * Kneser–Ney bigram table (every conditioning count and both integer
 * quantization stages), the Church–Gale burstiness table (tf/df/Σc² and
 * both milli ratios, plus the Cauchy–Schwarz non-negativity the integer
 * division relies on), and the per-user bot-filter features (min gap,
 * span, 10-minute peak burst, rate, and the rule flag).
 */
class CorpusOps7Spec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = graft.TestSpark.spark
  private val sf = graft.TestSpark.Sf0001

  private var dir: String = _
  override def beforeAll(): Unit =
    dir = java.nio.file.Files.createTempDirectory("graft_ops7").toString
  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }

  // ------------------------------------------------------- text_kneser_ney

  test("textKneserNey: plain-Scala replay of counts, fan-in/out, and both " +
       "quantization stages") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val ts = t.split("\\s+", -1)
      if (ts.length < 2) Iterator.empty else ts.sliding(2).map(p => (p(0), p(1)))
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val fanout = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val fanin = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tTypes = c12.size.toLong
    val expect = c12.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(200)
      .map { case ((w1, w2), c) =>
        val pcont = fanin(w2) * 1000000000L / tTypes
        val knp = ((4L * c - 3L) * 1000000000L + 3L * fanout(w1) * pcont) /
                  (4L * c1(w1))
        (w1, w2, c, c1(w1), fanout(w1), fanin(w2), pcont, knp)
      }
    val got = TextAnalysis.textKneserNey(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expect)
    // the KN telescoping sanity: every probability is in (0, 1]
    assert(got.forall(r => r._8 > 0L && r._8 <= 1000000000L))
  }

  // ------------------------------------------------------- text_burstiness

  test("textBurstiness: plain-Scala replay of tf/df/Σc² and both milli " +
       "ratios; numerator non-negative by Cauchy–Schwarz") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
    val nDocs = rows.length.toLong
    val perDoc = rows.flatMap { r =>
      r.getString(1).split("\\s+", -1).groupBy(identity)
        .map { case (tok, v) => (tok, r.getLong(0), v.length.toLong) }
    }
    val expect = perDoc.groupBy(_._1).map { case (tok, v) =>
      val tf = v.map(_._3).sum
      val df = v.length.toLong
      val sumSq = v.map(c => c._3 * c._3).sum
      assert(nDocs * sumSq - tf * tf >= 0L, s"CS violated for $tok")
      tok -> (tf, df, nDocs, tf * 1000L / df,
              (nDocs * sumSq - tf * tf) * 1000L / (nDocs * tf))
    }.toSeq.sortBy { case (tok, t) => (-t._1, tok) }.take(300)
    val got = TextAnalysis.textBurstiness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  // ----------------------------------------------------- events_bot_filter

  test("eventsBotFilter: plain-Scala replay of every cadence feature and " +
       "the rule flag; both flag classes present") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts").cast("timestamp")).as("us"),
              col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val gaps = sorted.sliding(2).collect {
        case Array(a, b) => b._3 - a._3
      }.toSeq
      val minGap = if (gaps.isEmpty) None else Some(gaps.min)
      val spanS = (sorted.last._3 - sorted.head._3) / 1000000L
      val burst = rows.groupBy(_._3 / 600000000L).values.map(_.length).max.toLong
      val n = rows.length.toLong
      val rate = if (spanS > 0) Some((n - 1L) * 86400000L / spanS) else None
      val isBot = minGap.exists(_ < 120000000L) || rate.exists(_ >= 5000L)
      u -> ((n, rows.map(_._4).distinct.length.toLong, spanS, minGap, burst,
             rate, isBot))
    }
    val got = Events.eventsBotFilter(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getBoolean(7)))
    }.toMap
    assert(got == expect)
    val flags = got.values.map(_._7).toSet
    assert(flags == Set(true, false),
      "sf0.001 must exercise both flag classes")
  }

  // ------------------------------------------------------ graph_modularity

  test("graphModularity: accounting identities vs the LP labels, and a " +
       "plain-Scala replay of the signed ppm quantization") {
    val mod = Graph.graphModularity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(mod.nonEmpty)
    val m = mod.head._5
    assert(mod.forall(_._5 == m), "m is a single global count")
    // handshake: community degree sums partition 2m exactly
    assert(mod.map(_._4).sum == 2 * m)
    // intra-community edges can never exceed the total
    assert(mod.map(_._3).sum <= m)
    // the label/size table must agree with graph_label_propagation
    val lp = Graph.graphLabelProp(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val lpSizes = lp.groupBy(_._1).map { case (l, v) => (l, v.head._2) }
    assert(mod.map(r => (r._1, r._2)).toMap == lpSizes)
    // replay the signed quantization from the query's own exact columns
    for ((label, _, eIn, degSum, mm, got) <- mod) {
      val num = 4L * mm * eIn - degSum * degSum
      val expect =
        if (num >= 0) 1000000L * num / (4L * mm * mm)
        else -(1000000L * -num / (4L * mm * mm))
      assert(got == expect, s"community $label contrib_ppm")
    }
    // global Q is a proper modularity: within (-1, 1]
    val q = mod.map(_._6).sum
    assert(q > -1000000L && q <= 1000000L)
  }

  // -------------------------------------------------------- layout_binpack

  test("layoutBinpack: full plain-Scala replay of the prefix sums and " +
       "file assignment") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }
    var run = 0L
    val expect = docs.map { case (id, n) =>
      val before = run; run += n
      (id, n, before, before / 65536L)
    }.toSeq
    val got = Layout.layoutBinpack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (id, n, _, _) => (-n, id) }.toSeq
    assert(got == expect)
    // NFD guarantee: every file except the last fills to within one doc
    // of the target (the straddling doc stays in the PREVIOUS file, so
    // the slack is bounded by the global max doc size)
    val byFile = got.groupBy(_._4)
    val lastFile = byFile.keys.max
    val maxDoc = got.map(_._2).max
    for ((f, rows) <- byFile if f != lastFile)
      assert(rows.map(_._2).sum > 65536L - maxDoc, s"file $f underfilled")
  }

  // --------------------------------------------------- graph_assortativity

  test("graphAssortativity: moment replay against a plain-Scala degree " +
       "walk over the LSH pair graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val directed = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = directed.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = directed.length.toLong
    val sumX = directed.map(e => deg(e._1)).sum
    val sumX2 = directed.map(e => deg(e._1) * deg(e._1)).sum
    val sumXY = directed.map(e => deg(e._1) * deg(e._2)).sum
    val r = Graph.graphAssortativity(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
           ((m, sumX, sumX2, sumXY)))
    val den = m * sumX2 - sumX * sumX
    if (den == 0) assert(r.isNullAt(4))
    else {
      val expect = BigDecimal((m * sumXY - sumX * sumX).toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expect)
      assert(math.abs(r.getDouble(4)) <= 1.0) // Pearson r is bounded
    }
  }

  // -------------------------------------------------- text_bigram_coverage

  test("textBigramCoverage: plain-Scala replay of the coverage curve; " +
       "monotone in k and complete at k >= vocab") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val counts = texts.flatMap { t =>
      val ts = t.split("\\s+", -1)
      if (ts.length < 2) Iterator.empty else ts.sliding(2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val total = counts.map(_._2).sum
    val vsize = counts.length.toLong
    val sorted = counts.sortBy { case ((w1, w2), c) => (-c, w1, w2) }.map(_._2)
    val prefix = sorted.scanLeft(0L)(_ + _)
    val expect = Seq(16L, 64L, 256L, 1024L).map { k =>
      val covered = prefix(math.min(k, vsize).toInt)
      (k, covered, total, vsize, covered * 1000000L / total)
    }
    val got = TextAnalysis.textBigramCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.map(_._5) == got.map(_._5).sorted) // coverage monotone in k
    assert(got.filter(r => r._1 >= r._4).forall(_._5 == 1000000L))
  }

  // ---------------------------------------------------- mix_js_divergence

  test("mixJsDivergence: nano-nat replay on the crafted skewed corpus; " +
       "bounded by ln 2 and ordered like KL") {
    import spark.implicits._
    val sub = s"$dir/js"
    val bulk = (1L to 18L).map(i =>
      (i, (1 to 10).map(k => s"common${(i + k) % 7}").mkString(" "), "en", "bulk"))
    val odd = Seq((100L, (1 to 20).map(k => s"rare$k").mkString(" "), "en", "odd"))
    (bulk ++ odd).toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
              length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$sub/documents.parquet")
    val got = Sampling.mixJsDivergence(spark, sub).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val B = 512L
    val toks = (bulk ++ odd).flatMap { case (_, t, _, s) =>
      t.split("\\s+").toSeq.map(tok =>
        (s, Tables.md5LongOf(tok.getBytes("UTF-8")) % B))
    }
    val cSb = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cB = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nS = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    for ((src, (nTok, jspFp, jsqFp, jsNats)) <- got) {
      assert(nTok == nS(src))
      val (ep, eq) = (0L until B).map { b =>
        val p = (cSb.getOrElse((src, b), 0L) + 1).toDouble / (nS(src) + B)
        val q = (cB.getOrElse(b, 0L) + 1).toDouble / (n + B)
        val m = (p + q) / 2
        (math.round(p * math.log(p / m) * 1000000000L),
         math.round(q * math.log(q / m) * 1000000000L))
      }.foldLeft((0L, 0L)) { case ((a, b2), (x, y)) => (a + x, b2 + y) }
      assert(jspFp == ep && jsqFp == eq, s"source $src")
      assert(jsNats == BigDecimal((ep + eq).toDouble / 2e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // JS is non-negative and bounded by ln 2 (quantization slack 1e-6)
      assert(jsNats >= -1e-6 && jsNats <= 0.693148)
    }
    assert(got("odd")._4 > got("bulk")._4, "disjoint vocabulary drifts more")
  }

  // -------------------------------------------------- embed_pq_distortion

  test("embedPqDistortion: occupancy partitions the corpus per subspace; " +
       "MSE is the exact integer quotient; errors non-negative") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val rows = Similarity.embedPqDistortion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(rows.map(_._1).toSet == (0L until 8L).toSet)
    for ((sub, g) <- rows.groupBy(_._1))
      assert(g.map(_._3).sum == n, s"subspace $sub occupancy != corpus")
    for ((sub, code, nv, errSum, mse) <- rows) {
      assert(code >= 0 && code < 16 && nv > 0 && errSum >= 0,
        s"($sub,$code) bounds")
      assert(mse == errSum / nv, s"($sub,$code) mse replay")
    }
  }

  // ---------------------------------------------------- events_stickiness

  test("eventsStickiness: plain-Scala replay of DAU/WAU over observed days") {
    val ud = spark.read.parquet(s"$sf/events.parquet")
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000L"),
              col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val obs = ud.map(_._1).toSet
    val expect = obs.toSeq.sorted.map { d =>
      val dau = ud.count(_._1 == d).toLong
      val wau = ud.filter(u => u._1 >= d - 6 && u._1 <= d).map(_._2)
        .distinct.length.toLong
      (d, dau, wau, dau * 1000000L / wau)
    }
    val got = Events.eventsStickiness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expect)
    // stickiness is a proper fraction of ppm
    assert(got.forall(r => r._4 > 0 && r._4 <= 1000000L))
  }

  // ------------------------------------------------ text_branching_entropy

  test("textBranchingEntropy: nano-nat replay; bounded by ln(fanout)") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val c12 = texts.flatMap { t =>
      val ts = t.split("\\s+", -1)
      if (ts.length < 2) Iterator.empty else ts.sliding(2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = c12.groupBy(_._1._1).map { case (w1, m) =>
      val c1 = m.values.sum
      val hFp = m.values.map { c =>
        val p = c.toDouble / c1.toDouble
        math.round(-p * math.log(p) * 1000000000L)
      }.sum
      w1 -> ((c1, m.size.toLong, hFp))
    }
    val got = TextAnalysis.textBranchingEntropy(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap == expect)
    for ((w1, (_, fanout, _, hNats)) <- got) {
      assert(hNats >= -1e-6, s"$w1 entropy non-negative")
      assert(hNats <= math.log(fanout.toDouble) + 1e-6, s"$w1 max-entropy bound")
    }
  }

  // ------------------------------------------------------ events_lifecycle

  test("eventsLifecycle: plain-Scala replay; classes partition DAU and " +
       "churn conserves") {
    val ud = spark.read.parquet(s"$sf/events.parquet")
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000L"),
              col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = ud.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val statuses = for ((u, days) <- byUser.toSeq; (d, i) <- days.zipWithIndex)
      yield {
        val gap = if (i == 0) None else Some(d - days(i - 1))
        (d, gap match {
          case None => "new"
          case Some(1) => "retained"
          case Some(g) if g <= 7 => "returning"
          case _ => "resurrected"
        })
      }
    val byDay = statuses.groupBy(_._1).view.mapValues { v =>
      (v.length.toLong, v.count(_._2 == "new").toLong,
       v.count(_._2 == "retained").toLong, v.count(_._2 == "returning").toLong,
       v.count(_._2 == "resurrected").toLong)
    }.toMap
    val got = Events.eventsLifecycle(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))
    }.toMap
    assert(got.view.mapValues(v =>
      (v._1, v._2, v._3, v._4, v._5)).toMap == byDay)
    for ((d, (dau, nn, nret, nretn, nres, churn)) <- got) {
      assert(nn + nret + nretn + nres == dau, s"day $d classes partition DAU")
      churn.foreach { c =>
        assert(c == byDay(d - 1)._1 - nret && c >= 0, s"day $d churn")
      }
      if (churn.isEmpty) assert(!byDay.contains(d - 1))
    }
  }

  // --------------------------------------------------------- events_pareto

  test("eventsPareto: decile replay from per-user counts; shares sum to " +
       "the corpus and concentrate at the top") {
    val counts = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nUsers = counts.length.toLong
    val total = counts.map(_._2).sum
    val ranked = counts.sortBy { case (u, n) => (-n, u) }.zipWithIndex
    val expect = ranked.groupBy { case (_, i) => (i.toLong * 10) / nUsers }
      .view.mapValues { v =>
        val e = v.map(_._1._2).sum
        (v.length.toLong, e, e * 1000000L / total)
      }.toMap
    val got = Events.eventsPareto(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == nUsers)
    assert(got.values.map(_._2).sum == total)
    assert(got(0L)._3 >= got(9L)._3, "top decile carries at least the bottom's share")
  }

  // ------------------------------------------------------ join_asof_nearest

  test("joinAsofNearest: plain-Scala nearest replay (ties to backward, " +
       "equal-ts tie order mirrored); prev arm equals the backward as-of") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts").cast("timestamp")).as("ts_us"),
              col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getString(3)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._1).view
      .mapValues(_.map(c => (c._3, c._2)).sorted).toMap
    val expect = ev.filter(_._4 == "purchase").map { p =>
      val cs = clicks.getOrElse(p._1, Array.empty[(Long, Long)]).toSeq
      // backward: max ts <= t, tie -> max click_id (asofJoin "last wins")
      val prev = cs.filter(_._1 <= p._3).sorted.lastOption
      // forward: min ts >= t, tie -> min click_id (negated tie order)
      val next = cs.filter(_._1 >= p._3).sorted.headOption
      val (cid, dir, gap) = (prev, next) match {
        case (Some((pt, pid)), n)
            if n.isEmpty || p._3 - pt <= n.get._1 - p._3 =>
          (Some(pid), Some("prev"), Some(p._3 - pt))
        case (_, Some((nt, nid))) => (Some(nid), Some("next"), Some(nt - p._3))
        case _ => (None, None, None)
      }
      (p._2, (p._1, p._3, cid, dir, gap))
    }.toMap
    val got = JoinsExt.joinAsofNearest(spark, sf).collect().map { r =>
      r.getLong(1) -> ((r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    }.toMap
    assert(got == expect)
    // the prev arm must agree with the backward-only as-of query
    val backward = JoinsExt.joinAsofClicks(spark, sf).collect().map { r =>
      r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toMap
    for ((pid, (_, _, cid, dir, _)) <- got if dir.contains("prev"))
      assert(backward(pid) == cid, s"purchase $pid prev mismatch")
    assert(got.values.flatMap(_._5).forall(_ >= 0), "gaps are magnitudes")
    assert(got.values.flatMap(_._4).toSet == Set("prev", "next"),
      "both directions exercised at sf0.001")
  }
}
