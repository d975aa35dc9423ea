package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the k-means queries (not part of the
  * library surface): times the Lloyd training collects separately from
  * the final probe/search job. */
object KmProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"KMPROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (rep <- 1 to 4) {
      println(s"--- rep $rep")
      val c = graft.operators.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
                col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm",
          sqrt(graft.functions.VectorFunctions.dotProduct(col("v"), col("v"))))
      time("corpus count")(c.count())
      def centsOf(assigned: org.apache.spark.sql.DataFrame) = {
        val rows = assigned
          .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim"))
          .agg((sum(floor(col("x") * lit(1e6))).cast("double")
                  / (count(lit(1)).cast("double") * lit(1e6))).as("m"))
          .collect()
        rows.groupBy(_.getAs[Number]("cluster").longValue()).map { case (cl, rs) =>
          val cv = rs.sortBy(_.getAs[Number]("dim").longValue())
            .map(_.getAs[Double]("m")).toSeq
          var acc = 0.0; cv.foreach(x => acc += x * x)
          (cl, cv, math.sqrt(acc))
        }.toSeq.sortBy(_._1)
      }
      def assign(cents: Seq[(Long, Seq[Double], Double)]) = {
        val scores = array(cents.map { case (cl, cv, cn) =>
          struct(
            (graft.functions.VectorFunctions.dotProduct(col("v"),
               array(cv.map(lit): _*)) / (col("nrm") * lit(cn))).as("ccos"),
            lit(-cl).as("negc"))
        }: _*)
        c.withColumn("cluster", -array_max(scores).getField("negc"))
          .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("cluster"))
      }
      val cents0 = time("cent0 agg+collect")(centsOf(
        c.select(col("label").as("cluster"), col("v"))))
      time("assign(cents0) count")(assign(cents0).count())
      val cents1 = time("cent1 assign+agg+collect")(centsOf(
        assign(cents0).select(col("cluster"), col("v"))))
      time("assign(cents1) count")(assign(cents1).count())
      // final-query sub-stages with precomputed cents1
      locally {
        import org.apache.spark.sql.expressions.Window
        import spark.implicits._
        val assigned = assign(cents1)
        val cent = cents1.toDF("cluster", "cv", "cn")
        def cosine(a: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
          graft.functions.VectorFunctions.dotProduct(a, b) / (na * nb)
        val q = c.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("ccos").desc, col("cluster").asc)
        val probes = q.crossJoin(broadcast(cent))
          .select(col("q_id"), col("qv"), col("qn"), col("cluster"),
                  cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("ccos"))
          .withColumn("crnk", row_number().over(wq))
          .filter(col("crnk") <= 2)
          .select(col("q_id"), col("qv"), col("qn"), col("cluster"))
        time("probes count")(probes.count())
        val scored = assigned.join(broadcast(probes), Seq("cluster"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
                  cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cos"))
        val scoredNoCos = assigned.join(broadcast(probes), Seq("cluster"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"))
        time("assign noop-write")(assigned.write.format("noop")
          .mode("overwrite").save())
        time("assign noop-write 2nd")(assigned.write.format("noop")
          .mode("overwrite").save())
        time("scored-no-cos count")(scoredNoCos.count())
        time("scored-no-cos count 2nd")(scoredNoCos.count())
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        time("scored-no-cos nocodegen")(scoredNoCos.count())
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        time("scored planning only")(scored.queryExecution.executedPlan)
        time("scored count")(scored.count())
        val assignedCut = time("assigned localCheckpoint")(
          assigned.localCheckpoint(true))
        val scoredCut = assignedCut.join(broadcast(probes), Seq("cluster"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
                  cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cos"))
        time("scored-cut count")(scoredCut.count())
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        time("final window count")(scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5).count())
      }
      time("full ann_kmeans_topk") {
        graft.SparkEntry.queries("ann_kmeans_topk")(spark, dir).count()
      }
      graft.operators.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
