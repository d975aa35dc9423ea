package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/**
 * Sketch operators [EXT] with exactly-reproducible results: where HLL /
 * approx quantile implementations differ between engines (and so can't be
 * differentially tested), a KMV (k-minimum-values) distinct sketch built
 * on the shared md5-derived hash is deterministic in BOTH Spark and
 * DuckDB — the oracle checks the sketch itself, not just its error bound.
 *
 * Scale: the k smallest hashes per group is a windowed top-k over the
 * deduped (group, hash) pairs — two hash exchanges, no per-group state
 * beyond k rows, mergeable across partitions (min-of-mins); at 100 TB
 * you'd lift the same math into a typed Aggregator to skip the
 * pre-distinct, with identical output.
 */
object Sketches {

  private val K = 32
  /** Hash space of [[Tables.md5Long]]: 15 hex digits = 60 bits. */
  private val M = 1L << 60

  /** KMV distinct-user estimate per event type, next to the exact count:
    * estimate = (k-1) * |hash space| / kth-minimum-hash (the classic KMV
    * estimator); exact when the group has fewer than k distinct values. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), md5Long(col("user_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col("event_type"), col("n_kept"), col("kth_min"),
              when(col("n_kept") < K, col("n_kept").cast("double"))
                .otherwise(round(lit((K - 1).toDouble) * lit(M.toDouble) / col("kth_min"), 6))
                .as("est_distinct"))
  }

  /** HLL geometry: 2^8 = 256 registers; the remaining 52 hash bits feed
    * the leading-zero rank, so register values lie in [1, 53]. */
  private val HllP = 8
  private val HllM = 1 << HllP                    // 256 registers
  private val HllW = 60 - HllP                    // 52 rank bits
  private val Pow53 = 1L << (HllW + 1)            // 2^53, the "register 0" term
  /** α_256 (Flajolet et al.) times m²·2^53: the raw-estimate numerator,
    * computed ONCE in Scala double arithmetic and inlined into both
    * engines as the same IEEE value. (Writing the formula as SQL literals
    * is a trap: Spark parses `0.7213` as DECIMAL, not DOUBLE, and the
    * decimal arithmetic rounds differently than DuckDB's — measured as a
    * 6th-decimal estimate divergence at sf0.1. The ×256×256×2^53 factors
    * are exact powers of two, so this product carries α's mantissa
    * unrounded.) */
  private val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * Pow53.toDouble

  /**
   * HyperLogLog distinct-count sketch from scratch, exactly reproducible
   * [EXT]: registers derive from the shared md5 hash (bucket = low 8 bits,
   * rank = leading-zero position of the remaining 52 bits via the binary
   * string length — integer-only), and the harmonic-mean denominator
   * Σ 2^-M_j is kept EXACT by summing 2^(53-M_j) as integers (≤ 256·2^53
   * < 2^63) and dividing once at the end — double summation would be
   * accumulation-order-dependent. The only inexact steps are one long→
   * double conversion, one division, and the small-range ln correction
   * (rounded to 6 decimals), all deterministic — so the DuckDB oracle
   * checks the sketch registers (via s_int and zeros) and the estimate
   * itself, not just an error bound.
   *
   * Scale: duplicates hit the same register with the same rank, so NO
   * pre-distinct is needed — one pass, groupBy(group, bucket) with
   * map-side partial max, then a 256-row-per-group final agg; registers
   * merge by max, the textbook mergeable-sketch dataflow. The exact
   * count_distinct alongside is the verification column (it shuffles every
   * distinct pair; the sketch is what survives at 100 TB).
   */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val hashed = ev.select(col("event_type"),
        md5Long(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        pmod(col("h"), lit(HllM)).as("bucket"),
        shiftright(col("h"), HllP).as("w"))
      .select(col("event_type"), col("bucket"),
        when(col("w") === 0, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(col("w")))).as("rho"))
    val regs = hashed.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
    val g = regs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
           sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${HllW + 1} - m_j AS INT))"))
             .as("s_present"))
      .select(col("event_type"),
        (lit(HllM) - col("n_buckets")).as("zeros"),
        (col("s_present") + (lit(HllM) - col("n_buckets")) * lit(Pow53)).as("s_int"))
      .withColumn("e_raw", lit(HllNumerator) / col("s_int").cast("double"))
      .withColumn("hll_estimate",
        round(when(col("e_raw") <= lit(2.5 * HllM) && col("zeros") > 0,
                   lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
                .otherwise(col("e_raw")), 6))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    g.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("zeros"), col("s_int"),
              col("hll_estimate"))
  }

  val hllDistinctSql: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM events),
       |b AS (SELECT event_type, h % $HllM AS bucket, h >> $HllP AS w FROM h),
       |r AS (
       |  SELECT event_type, bucket,
       |         MAX(CASE WHEN w = 0 THEN ${HllW + 1}
       |                  ELSE ${HllW + 1} - length(bin(w)) END) AS m_j
       |  FROM b GROUP BY 1, 2),
       |g AS (
       |  SELECT event_type, COUNT(*) AS n_buckets,
       |         CAST(SUM(CAST(1 AS BIGINT) << (${HllW + 1} - m_j)) AS BIGINT) AS s_present
       |  FROM r GROUP BY 1),
       |e AS (
       |  SELECT event_type,
       |         $HllM - n_buckets AS zeros,
       |         s_present + ($HllM - n_buckets) * ${Pow53} AS s_int
       |  FROM g),
       |est AS (
       |  SELECT event_type, zeros, s_int,
       |         CAST('$HllNumerator' AS DOUBLE) / CAST(s_int AS DOUBLE) AS e_raw
       |  FROM e)
       |SELECT est.event_type,
       |       CAST(x.n_exact AS BIGINT) AS n_exact,
       |       zeros, s_int,
       |       round(CASE WHEN e_raw <= ${2.5 * HllM} AND zeros > 0
       |                  THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
       |                  ELSE e_raw END, 6) AS hll_estimate
       |FROM est
       |JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |      FROM events GROUP BY 1) x
       |  ON est.event_type = x.event_type""".stripMargin

  /**
   * [[hllDistinct]] through the native [[graft.functions.HllSketchAgg]]
   * UDAF: ONE aggregate holds the 256-byte register state per group
   * (update = shift+max, merge = element-wise max, partials ship as the
   * bare bytes) instead of the declarative explode → groupBy(bucket) →
   * re-aggregate — no intermediate (group, bucket) rows at all. The
   * harmonic-sum finish runs on the returned register array with the
   * SAME expressions as the declarative path, so this query shares
   * [[hllDistinctSql]] verbatim: native == declarative == DuckDB is the
   * three-way differential.
   */
  def hllNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.select(col("event_type"), col("user_id"),
        md5Long(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.functions.HllSketch.hllSketch(col("h")).as("regs"),
           countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)").as("zeros"),
        expr("aggregate(regs, CAST(0 AS BIGINT), " +
             "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 53 - r))").as("s_int"))
      .withColumn("e_raw", lit(HllNumerator) / col("s_int").cast("double"))
      .withColumn("hll_estimate",
        round(when(col("e_raw") <= lit(2.5 * HllM) && col("zeros") > 0,
                   lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
                .otherwise(col("e_raw")), 6))
      .select(col("event_type"), col("n_exact"), col("zeros"), col("s_int"),
              col("hll_estimate"))
  }

  val kmvDistinctSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
       |h AS (SELECT event_type,
       |             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |      FROM d),
       |r AS (SELECT event_type, h,
       |             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
       |      FROM h),
       |k AS (SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth_min
       |      FROM r WHERE rnk <= $K GROUP BY 1)
       |SELECT event_type, n_kept, kth_min,
       |       CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
       |            ELSE round(CAST(${(K - 1).toDouble} AS DOUBLE) * ${M.toDouble} / kth_min, 6)
       |       END AS est_distinct
       |FROM k""".stripMargin

  // -------------------------------------------------- KMV set operations

  /** Sketch depth for the pairwise-overlap estimator — deeper than
    * [[kmvDistinct]]'s K=32 because the intersection resolution is 1/k. */
  private val OvK = 256

  /**
   * KMV audience-overlap estimation [EXT] — the sketch SET OPERATION the
   * single-set estimators ([[kmvDistinct]], [[hllDistinct]]) cannot do:
   * for every pair of event types, estimate the distinct-user union,
   * intersection, and Jaccard from the two bottom-[[OvK]] sketches alone
   * (Beyer et al., SIGMOD'07: merge both sketches, keep the k smallest of
   * the union — a valid KMV of the union set; the fraction ρ of those
   * that sit in BOTH input sketches estimates Jaccard, and ρ · est_union
   * the intersection). Exact distinct union/intersection ride along as
   * verification columns, same contract as the CMS/HLL gates — the oracle
   * checks the sketch itself, not an error band.
   *
   * Scale story: only the per-type sketch build touches the corpus (the
   * same shape as [[kmvDistinct]]); everything pairwise happens on
   * T·k rows — at 100 TB the T² pair stage is KB-sized no matter the
   * corpus, which is exactly why warehouses ship sketch set-ops instead
   * of re-scanning for every pair. The exact columns are the one
   * corpus-sized join and exist only to verify; production keeps the
   * sketches.
   */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    // three consumers (sketch build, exact counts, exact intersection)
    // read the deduped pairs — cut, or the corpus distinct re-executes
    // per consumer (the stats_psi_drift lesson)
    val d = Checkpoints.cut(events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    // T·k rows feeding four pair-stage consumers — the cheapest cut there is
    val sk = Checkpoints.cut(d.select(col("event_type"),
                      md5Long(col("user_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= OvK)
      .select(col("event_type"), col("h")))
    val types = sk.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("type_a"))
      .join(broadcast(types.select(col("event_type").as("type_b"))),
            col("type_a") < col("type_b"))
    // membership-flagged union of the two sketches, per pair
    val memb = pairs.join(sk.withColumnRenamed("event_type", "type_a"), Seq("type_a"))
        .select(col("type_a"), col("type_b"), col("h"),
                lit(1).as("in_a"), lit(0).as("in_b"))
      .union(
        pairs.join(sk.withColumnRenamed("event_type", "type_b"), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("h"),
                  lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wu = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h").asc)
    val est = memb.withColumn("urnk", row_number().over(wu))
      .filter(col("urnk") <= OvK)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("k_kept"), max(col("h")).as("kth_min"),
           sum(col("in_a") * col("in_b")).as("inter_in_k"))
      .select(col("type_a"), col("type_b"), col("k_kept"), col("inter_in_k"),
        when(col("k_kept") < OvK, col("k_kept").cast("double"))
          .otherwise(round(lit((OvK - 1).toDouble) * lit(M.toDouble) / col("kth_min"), 6))
          .as("est_union"),
        round(col("inter_in_k").cast("double") / col("k_kept"), 6).as("est_jaccard"))
      .withColumn("est_intersection", round(col("est_jaccard") * col("est_union"), 6))
    // exact verification columns (the corpus-sized path the sketch replaces)
    val cnt = d.groupBy(col("event_type")).agg(count(lit(1)).as("nx"))
    val ex = d.select(col("event_type").as("type_a"), col("user_id"))
      .join(d.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_intersection"))
    est.join(ex, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("exact_intersection"))
      .join(broadcast(cnt.select(col("event_type").as("type_a"), col("nx").as("na"))), Seq("type_a"))
      .join(broadcast(cnt.select(col("event_type").as("type_b"), col("nx").as("nb"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("k_kept"), col("inter_in_k"),
              col("est_union"), col("est_intersection"), col("est_jaccard"),
              (col("na") + col("nb") - col("exact_intersection")).as("exact_union"),
              col("exact_intersection"))
  }

  /** Oracle: the identical sketch, merge, and estimator arithmetic. */
  val kmvOverlapSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
       |h AS (SELECT event_type,
       |             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |      FROM d),
       |sk AS (SELECT event_type, h FROM (
       |         SELECT event_type, h,
       |                row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
       |         FROM h) WHERE rnk <= $OvK),
       |ty AS (SELECT DISTINCT event_type FROM sk),
       |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
       |          FROM ty a JOIN ty b ON a.event_type < b.event_type),
       |memb AS (
       |  SELECT type_a, type_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
       |    SELECT p.type_a, p.type_b, s.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk s ON s.event_type = p.type_a
       |    UNION ALL
       |    SELECT p.type_a, p.type_b, s.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN sk s ON s.event_type = p.type_b)
       |  GROUP BY 1, 2, 3),
       |kept AS (SELECT * FROM (
       |    SELECT memb.*,
       |           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h ASC) AS urnk
       |    FROM memb) WHERE urnk <= $OvK),
       |ag AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS k_kept,
       |              MAX(h) AS kth_min,
       |              CAST(SUM(in_a * in_b) AS BIGINT) AS inter_in_k
       |       FROM kept GROUP BY 1, 2),
       |est AS (SELECT type_a, type_b, k_kept, inter_in_k,
       |  CASE WHEN k_kept < $OvK THEN CAST(k_kept AS DOUBLE)
       |       ELSE round(CAST(${(OvK - 1).toDouble} AS DOUBLE) * ${M.toDouble} / kth_min, 6)
       |  END AS est_union,
       |  round(CAST(inter_in_k AS DOUBLE) / k_kept, 6) AS est_jaccard
       |  FROM ag),
       |cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nx FROM d GROUP BY 1),
       |ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |              CAST(COUNT(*) AS BIGINT) AS exact_intersection
       |       FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
       |       GROUP BY 1, 2)
       |SELECT e.type_a, e.type_b, e.k_kept, e.inter_in_k, e.est_union,
       |       round(e.est_jaccard * e.est_union, 6) AS est_intersection, e.est_jaccard,
       |       ca.nx + cb.nx - coalesce(ex.exact_intersection, 0) AS exact_union,
       |       coalesce(ex.exact_intersection, CAST(0 AS BIGINT)) AS exact_intersection
       |FROM est e
       |LEFT JOIN ex ON ex.type_a = e.type_a AND ex.type_b = e.type_b
       |JOIN cnt ca ON ca.event_type = e.type_a
       |JOIN cnt cb ON cb.event_type = e.type_b""".stripMargin

  // ------------------------------------------------------ count-min sketch

  /** CMS geometry: 4 independent hash rows × 1024 columns = 4096 integer
    * registers total, regardless of corpus size. */
  private val CmsDepth = 4
  private val CmsWidth = 1024
  private val CmsTopK = 10

  /**
   * Count-Min heavy hitters [EXT]: per-user event counts estimated from a
   * fixed 4×1024 integer sketch, reported for the true top-10 users next
   * to their exact counts. The registers are plain integer sums, so the
   * oracle reproduces the whole sketch bit-for-bit — the gate checks the
   * sketch, not an error bound — and CMS's one-sided guarantee
   * (estimate ≥ exact) is part of the output contract (`overcount ≥ 0`).
   *
   * Scale story: the exact top-k needs a full groupBy over every distinct
   * user (fine here, the verification column); the sketch needs O(1)
   * state — 4096 counters — merged by + across partitions. At 100 TB the
   * sketch is what you keep: registers aggregate map-side to ≤4096 rows
   * per partition before one tiny exchange; point queries then cost 4
   * register lookups (the broadcast join below).
   */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate to (user_id, exact_cnt) BEFORE sketching (r17): the
    // CMS cell of a user is a pure function of user_id, so register
    // values are identical whether raw events or per-user totals are
    // hashed in (sum of counts = count of events) — but the per-user
    // table is ~20x smaller than the event stream, so the xCmsDepth
    // explode, the md5-of-string cell addressing, and the register
    // aggregation all run over users, not events. The exact top-K side
    // reads the SAME aggregate: one corpus scan total, was two. At
    // 100 TB a batch CMS build over a keyed table should collapse the
    // key first; the no-pre-agg streaming build is the HllSketchAgg /
    // stream-gate territory, not this query's.
    val byUser = Checkpoints.cut(
      events(spark, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("exact_cnt")),
      eager = false) // two consumers: register build + exact top-K
    val cells = byUser
      .select(col("user_id"), col("exact_cnt"),
              explode(array((0 until CmsDepth).map(lit): _*)).as("r"))
      .select(col("exact_cnt"), col("r"),
              pmod(md5Long(concat_ws("", col("r"), col("user_id"))),
                   lit(CmsWidth)).as("c"))
    val regs = cells.groupBy(col("r"), col("c")).agg(sum(col("exact_cnt")).as("cnt"))
    val top = byUser
      .orderBy(col("exact_cnt").desc, col("user_id").asc)
      .limit(CmsTopK)
    // point query: est = min over the 4 rows of the addressed register
    val probes = top
      .select(col("user_id"), col("exact_cnt"),
              explode(array((0 until CmsDepth).map(lit): _*)).as("r"))
      .select(col("user_id"), col("exact_cnt"), col("r"),
              pmod(md5Long(concat_ws("", col("r"), col("user_id"))),
                   lit(CmsWidth)).as("c"))
    probes.join(broadcast(regs), Seq("r", "c"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("user_id"), col("exact_cnt"), col("est_cnt"),
              (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }

  val cmsHeavyHittersSql: String =
    s"""WITH rows AS (SELECT unnest(range(0, $CmsDepth)) AS r),
       |cells AS (
       |  SELECT e.user_id, rows.r,
       |         CAST(('0x' || substring(md5(CAST(rows.r AS VARCHAR) || chr(1) || CAST(e.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % $CmsWidth AS c
       |  FROM events e CROSS JOIN rows),
       |regs AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
       |top AS (
       |  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1
       |  ORDER BY exact_cnt DESC, user_id ASC LIMIT $CmsTopK),
       |probes AS (
       |  SELECT t.user_id, t.exact_cnt, rows.r,
       |         CAST(('0x' || substring(md5(CAST(rows.r AS VARCHAR) || chr(1) || CAST(t.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % $CmsWidth AS c
       |  FROM top t CROSS JOIN rows)
       |SELECT p.user_id, p.exact_cnt, MIN(g.cnt) AS est_cnt,
       |       MIN(g.cnt) - p.exact_cnt AS overcount
       |FROM probes p JOIN regs g ON g.r = p.r AND g.c = p.c
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- sliding HLL

  /** Sliding-window width in hours (current + 2 preceding). */
  private val SlideHours = 2

  /**
   * Sliding-window distinct-user HLL [EXT] — the MERGEABILITY of the
   * sketch made visible at the query level: hourly HLL registers are
   * built once (the [[hllDistinct]] register dataflow keyed by hour),
   * then every 3-hour window's sketch is the register-wise MAX of its
   * hours. SPARSE slide (r13): each present hourly register row is
   * replicated into the ≤ SlideHours+1 window-end hours it is visible
   * in (the same explode idiom the exact column already uses), then a
   * two-level max-per-(window,bucket) / sum-over-buckets aggregate.
   * No dense hours × types × buckets grid, no window function, no
   * left join: work ∝ PRESENT registers × 3, not ∝ the full grid —
   * the r12 dense-grid plan did ~m× the needed work when most
   * (hour, bucket) cells were empty (2.6× the oracle at sf0.1).
   * Absent cells never materialize; `zeros = m − n_buckets` recovers
   * them exactly as [[hllDistinct]] does. This is exactly why sketches
   * beat exact distinct at 100 TB: hourly registers are tiny (256 per
   * type), merge is associative, and any window/rollup combination is
   * post-hoc register algebra. The exact windowed distinct alongside
   * (the same replicate-into-visible-windows explode over raw events)
   * is the verification column that would not survive at scale.
   *
   * Determinism: identical to [[hllDistinct]] — integer registers,
   * exact integer harmonic sums, one double division + ln correction
   * rounded to 6.
   */
  def hllSliding(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"),
              expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hnum"),
              col("user_id"))
    val hashed = ev
      .select(col("event_type"), col("hnum"),
              md5Long(col("user_id").cast("string")).as("hh"))
      .select(col("event_type"), col("hnum"),
              pmod(col("hh"), lit(HllM)).as("bucket"),
              shiftright(col("hh"), HllP).as("w"))
      .select(col("event_type"), col("hnum"), col("bucket"),
              when(col("w") === 0, lit(HllW + 1))
                .otherwise(lit(HllW + 1) - length(bin(col("w")))).as("rho"))
    val regsHourly = hashed.groupBy(col("event_type"), col("hnum"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
    // No mx clip on the sketch side: a register exists for a window iff an
    // event fell in it, so the final INNER join with `exact` (which is
    // clipped at the last observed hour) drops the ≤ SlideHours phantom
    // windows past mx for free — one fewer exchange + events scan than a
    // broadcast-bound filter here.
    val merged = regsHourly
      .select(col("event_type"), col("bucket"), col("m_j"),
              explode(sequence(col("hnum"), col("hnum") + SlideHours)).as("hnum"))
      .groupBy(col("event_type"), col("hnum"), col("bucket"))
      .agg(max(col("m_j")).as("m_w"))
    val g = merged
      .groupBy(col("event_type"), col("hnum"))
      .agg(count(lit(1)).as("n_buckets"),
           sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${HllW + 1} - m_w AS INT))"))
             .as("s_present"))
      .select(col("event_type"), col("hnum"),
        (lit(HllM) - col("n_buckets")).as("zeros"),
        (col("s_present") + (lit(HllM) - col("n_buckets")) * lit(Pow53)).as("s_int"))
      .withColumn("e_raw", lit(HllNumerator) / col("s_int").cast("double"))
      .withColumn("hll_estimate",
        round(when(col("e_raw") <= lit(2.5 * HllM) && col("zeros") > 0,
                   lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
                .otherwise(col("e_raw")), 6))
    // hour upper bound, derived INSIDE the plan (no job at construction,
    // empty input → empty result); broadcast so the clip is map-side —
    // windows sliding past the last observed hour don't exist.
    val bounds = broadcast(ev.agg(max(col("hnum")).as("mx")))
    val exact = ev
      .select(col("event_type"), col("user_id"),
              explode(sequence(col("hnum"), col("hnum") + SlideHours)).as("g"))
      .crossJoin(bounds)
      .filter(col("g") <= col("mx"))
      .groupBy(col("event_type"), col("g").as("hnum"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    g.join(exact, Seq("event_type", "hnum"))
      .select(col("event_type"), col("hnum"), col("n_exact"), col("zeros"),
              col("s_int"), col("hll_estimate"))
  }

  val hllSlidingSql: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |         epoch_us(date_trunc('hour', ts)) // 3600000000 AS hnum,
       |         user_id
       |  FROM events),
       |h AS (
       |  SELECT event_type, hnum,
       |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
       |  FROM ev),
       |b AS (SELECT event_type, hnum, hh % $HllM AS bucket, hh >> $HllP AS w FROM h),
       |r AS (
       |  SELECT event_type, hnum, bucket,
       |         MAX(CASE WHEN w = 0 THEN ${HllW + 1}
       |                  ELSE ${HllW + 1} - length(bin(w)) END) AS m_j
       |  FROM b GROUP BY 1, 2, 3),
       |slid AS (
       |  SELECT event_type, g AS hnum, bucket, MAX(m_j) AS m_w
       |  FROM (SELECT event_type, bucket, m_j,
       |               unnest(range(hnum, hnum + ${SlideHours + 1})) AS g
       |        FROM r) x
       |  GROUP BY 1, 2, 3),
       |gg AS (
       |  SELECT event_type, hnum, COUNT(*) AS n_buckets,
       |         CAST(SUM(CAST(1 AS BIGINT) << CAST(${HllW + 1} - m_w AS INT)) AS BIGINT) AS s_present
       |  FROM slid GROUP BY 1, 2),
       |e AS (
       |  SELECT event_type, hnum,
       |         $HllM - n_buckets AS zeros,
       |         s_present + ($HllM - n_buckets) * ${Pow53} AS s_int
       |  FROM gg),
       |est AS (
       |  SELECT event_type, hnum, zeros, s_int,
       |         CAST('$HllNumerator' AS DOUBLE) / CAST(s_int AS DOUBLE) AS e_raw
       |  FROM e),
       |mx AS (SELECT MAX(hnum) AS mx FROM r),
       |exact AS (
       |  SELECT event_type, g AS hnum, COUNT(DISTINCT user_id) AS n_exact
       |  FROM (SELECT event_type, user_id,
       |               unnest(range(hnum, hnum + ${SlideHours + 1})) AS g
       |        FROM ev) x CROSS JOIN mx
       |  WHERE g <= mx.mx
       |  GROUP BY 1, 2)
       |SELECT est.event_type, est.hnum,
       |       CAST(exact.n_exact AS BIGINT) AS n_exact,
       |       zeros, s_int,
       |       round(CASE WHEN e_raw <= ${2.5 * HllM} AND zeros > 0
       |                  THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
       |                  ELSE e_raw END, 6) AS hll_estimate
       |FROM est JOIN exact USING (event_type, hnum)""".stripMargin

  // ---------------------------------------------------------- Bloom filter

  /** Bloom geometry: m bits as m/32 32-bit-mask words (shift ≤ 31 — DuckDB checks signed-shift overflow at 63), k probes per key via
    * Kirsch–Mitzenmacher double hashing h_i = (h1 + i·h2) mod m. */
  private val BloomBits = 16384L
  private val BloomK = 4

  /**
   * Bloom-filter membership [EXT] — the incremental-ingest dedup gate: a
   * 100 TB corpus cannot equi-join every incoming batch against all
   * history, so ingestion keeps a Bloom filter of historical content
   * hashes and only the "maybe" fraction pays the exact check. Built
   * from scratch (like the [[hllDistinct]]/[[cmsHeavyHitters]] siblings)
   * so every bit is oracle-reproducible: the index side (sources ≠
   * 'src0') ORs its k probe bits into 512 words; the probe side (src0)
   * tests all k bits and splits into definitely-new vs maybe-duplicate;
   * the exact content-hash join then exposes TRUE duplicates, making
   * the false-positive count a first-class output — the number the
   * m/k sizing trade-off is tuned by.
   *
   * Scale shape: the build is ONE aggregate whose shuffle carries
   * (word, mask) partials — 512 rows regardless of corpus size; the
   * probe joins against the 512-row word table broadcast; the exact
   * residual join runs only on content hashes. All-integer end to end.
   */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("source"),
      md5Long(col("text")).as("h1"),
      md5Long(concat(lit("bloom2:"), col("text"))).as("h2"))
    def bits(df: DataFrame): DataFrame = df.select(col("doc_id"), col("h1"),
        explode(array((0 until BloomK).map(i =>
          (col("h1") + lit(i.toLong) * col("h2")) % BloomBits): _*)).as("bit"))
      .select(col("doc_id"), col("h1"), expr("bit div 32").as("w"),
              expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask"))
    val idx = d.filter(col("source") =!= "src0")
    val probe = d.filter(col("source") === "src0")
    val words = bits(idx).groupBy(col("w")).agg(expr("bit_or(mask)").as("wv"))
    val tested = bits(probe)
      .join(broadcast(words), Seq("w"), "left")
      .withColumn("hit", (coalesce(col("wv"), lit(0L)).bitwiseAND(col("mask"))) =!= 0L)
      .groupBy(col("doc_id"), col("h1"))
      .agg(min(col("hit").cast("int")).as("all_set"))
    val truth = tested.join(
      idx.select(col("h1")).distinct().withColumn("dup", lit(1)),
      Seq("h1"), "left")
      .select(col("doc_id"), (col("all_set") === 1).as("maybe"),
              (col("dup").isNotNull).as("is_dup"))
    truth.agg(
      count(lit(1)).as("n_probe"),
      sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
      sum(when(!col("maybe"), 1L).otherwise(0L)).as("n_definitely_new"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_dup"),
      sum(when(col("maybe") && !col("is_dup"), 1L).otherwise(0L)).as("n_false_pos"),
      sum(when(!col("maybe") && col("is_dup"), 1L).otherwise(0L)).as("n_missed"))
  }

  val bloomMembershipSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h1,
       |    CAST(('0x' || substring(md5('bloom2:' || text), 1, 15)) AS BIGINT) AS h2
       |  FROM documents),
       |idx_bits AS (
       |  SELECT (h1 + i * h2) % $BloomBits AS bit
       |  FROM d, UNNEST(range(0, $BloomK)) AS u(i)
       |  WHERE source <> 'src0'),
       |words AS (
       |  SELECT bit // 32 AS w, bit_or(1::BIGINT << CAST(bit % 32 AS INT)) AS wv
       |  FROM idx_bits GROUP BY 1),
       |probe_bits AS (
       |  SELECT doc_id, h1, (h1 + i * h2) % $BloomBits AS bit
       |  FROM d, UNNEST(range(0, $BloomK)) AS u(i)
       |  WHERE source = 'src0'),
       |tested AS (
       |  SELECT p.doc_id, p.h1,
       |    MIN(CASE WHEN (coalesce(w.wv, 0) & (1::BIGINT << CAST(p.bit % 32 AS INT))) <> 0
       |             THEN 1 ELSE 0 END) AS all_set
       |  FROM probe_bits p LEFT JOIN words w ON w.w = p.bit // 32
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT t.doc_id, t.all_set = 1 AS maybe,
       |         EXISTS (SELECT 1 FROM d i WHERE i.source <> 'src0' AND i.h1 = t.h1) AS is_dup
       |  FROM tested t)
       |SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_probe,
       |  CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       |  CAST(SUM(CASE WHEN NOT maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_definitely_new,
       |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dup,
       |  CAST(SUM(CASE WHEN maybe AND NOT is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |  CAST(SUM(CASE WHEN NOT maybe AND is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
       |FROM truth""".stripMargin

  // ------------------------------------------------------ quantile sketch

  /** Sample size of the bottom-k quantile sketch. */
  private val QsK = 256

  /** Sketch salt — its own hash stream, independent of every other
    * sampling decision in the library. */
  private val QsSalt = "graft_qsk_v1:"

  /** (percent, rank of the estimate in the k-sample, rank-error budget in
    * per-mille): the budget is ceil(3000·σ) with σ = sqrt(p(1-p)/k) — the
    * 3-sigma CLT band for the empirical p-quantile of a uniform k-sample.
    * Computed once in Scala so both engines assert the SAME literals. */
  private val QsPcts: Seq[(Int, Int, Int)] =
    Seq(1, 5, 25, 50, 75, 95, 99).map { p =>
      val prob = p / 100.0
      val sigma = math.sqrt(prob * (1.0 - prob) / QsK)
      (p, math.ceil(prob * QsK).toInt, math.ceil(3000.0 * sigma).toInt)
    }

  /**
   * Mergeable quantile sketch [EXT]: estimate the value distribution of
   * `events.value` from the [[QsK]] rows with the smallest salted hash —
   * a uniform sample whose selection is a pure function of event_id, so
   * (unlike reservoir sampling or `TABLESAMPLE`) it is deterministic,
   * engine-independent, AND mergeable: the bottom-k of a union is the
   * bottom-k of per-partition bottom-k's, the same sketch algebra as
   * [[kmvDistinct]]. The p-quantile estimate is the sample's own
   * p-quantile (rank ceil(p·k) in the sorted sample); the query then
   * verifies itself against the full table — one conditional-count pass
   * computes each estimate's TRUE rank, and the emitted `within_bound`
   * verdict asserts the rank error sits inside the precomputed 3σ band.
   * Like `agg_approx`, the oracle hashes the verdicts, so an estimator
   * regression in either engine is a gate failure, not a silent drift.
   *
   * Scale shape: the sketch build is `TakeOrderedAndProject` — each
   * partition keeps its k smallest hashes, the driver merges k-row
   * partials (never a global sort) and ranks the 256-row sample in
   * Scala; the verification is ONE conditional-count pass over the
   * table with the 7 estimates baked in as literals. At 100 TB only the
   * k-row partials ever move.
   */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_id"), col("value"))
    // build the sketch: TakeOrderedAndProject merges per-partition
    // bottom-k partials, and the k-row sample lands on the driver — the
    // same collect-and-rebroadcast the centroid/codebook operators use.
    // Ranking 256 rows happens in Scala (same (value, hk) order the
    // window gave); the earlier formulation ranked them in a
    // one-partition window and THETA-JOINED events against the 7
    // estimates, materializing ~7x the table into the verification
    // aggregate — the literal-threshold conditional counts below verify
    // in ONE pass with zero joins (measured 2.0 s -> 0.5 s at sf0.1).
    val rows = ev
      .select(col("value"),
        md5Long(concat_ws("", lit(QsSalt), col("event_id").cast("string")))
          .as("hk"))
      .orderBy(col("hk").asc, col("value").asc).limit(QsK)
      .collect()
    // a fixture smaller than the deepest rank (max rq = ceil(0.99*QsK))
    // must fail with a clear message, not an ArrayIndexOutOfBounds; a
    // null value would NPE getDouble — name the row instead
    val maxRank = QsPcts.map(_._2).max
    require(rows.length >= maxRank,
      s"quantile_sketch needs >= $maxRank events rows (deepest rank of " +
        s"QsPcts at k=$QsK); the table has only ${rows.length}")
    val sketch = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"quantile_sketch: null value/hash in bottom-k sample row $r")
      (r.getDouble(0), r.getLong(1))
    }.sortBy(identity)
    val est = QsPcts.map { case (p, rq, b) => (p, b, sketch(rq - 1)._1) }
    // one conditional-count pass over the full table: n_total plus each
    // estimate's true rank, the estimates baked in as literals
    val aggs = count(lit(1)).as("n_total") +:
      est.zipWithIndex.map { case ((_, _, v), i) =>
        sum(when(col("value") <= lit(v), 1L).otherwise(0L)).as(s"le_$i") }
    ev.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(est.zipWithIndex.map { case ((p, b, v), i) =>
        struct(lit(p).as("pct"), lit(v).as("est_value"),
          lit(p * 10L).as("target_pm"),
          expr(s"le_$i * 1000 div n_total").as("est_rank_pm"),
          (abs(lit(p * 10L) - expr(s"le_$i * 1000 div n_total")) <= lit(b))
            .as("within_bound"))
      }: _*)).as("q"))
      .select(col("q.pct"), col("q.est_value"), col("q.target_pm"),
        col("q.est_rank_pm"), col("q.within_bound"))
  }

  val quantileSketchSql: String = {
    val targetRows = QsPcts.map { case (p, rq, b) => s"($p, $rq, $b)" }
      .mkString(", ")
    s"""WITH samp AS (
       |  SELECT value,
       |    CAST(('0x' || substring(md5('$QsSalt' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
       |  FROM events ORDER BY hk ASC, value ASC LIMIT $QsK),
       |ranked AS (
       |  SELECT value, row_number() OVER (ORDER BY value ASC, hk ASC) AS r
       |  FROM samp),
       |targets(pct, rq, bound_pm) AS (VALUES $targetRows),
       |est AS (
       |  SELECT pct, bound_pm, value AS est_value
       |  FROM ranked JOIN targets ON r = rq),
       |cnt AS (
       |  SELECT pct, bound_pm, est_value, COUNT(*) AS n_le
       |  FROM events e JOIN est ON e.value <= est.est_value
       |  GROUP BY 1, 2, 3),
       |tot AS (SELECT COUNT(*) AS n_total FROM events)
       |SELECT pct, est_value,
       |  CAST(pct * 10 AS BIGINT) AS target_pm,
       |  CAST((n_le * 1000) // n_total AS BIGINT) AS est_rank_pm,
       |  abs(pct * 10 - (n_le * 1000) // n_total) <= bound_pm AS within_bound
       |FROM cnt CROSS JOIN tot""".stripMargin
  }
}
