package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Data profiling / validation [EXT] — the pre-ingestion quality gate a
 * training pipeline runs on every table: per-column null counts, distinct
 * cardinalities, and ranges, one row per column.
 *
 * Scale shape: ONE scan of the table computes every column's statistics
 * as parallel aggregates (partial+final, so the shuffle carries one
 * partial-state row per partition), then the single result row is
 * unpivoted to (column, stats) rows driver-side — the unpivot is over a
 * row, not the data. The count-distincts are the only expensive members
 * (Spark expands them into a multi-distinct aggregate); a 100 TB profile
 * would swap them for approx_count_distinct or the [[Sketches]] HLL.
 *
 * Cross-engine contract: numeric min/max are emitted as DOUBLE and
 * timestamps as epoch micros — never as casted strings, because Spark
 * and DuckDB format doubles differently ("1.0E7" vs "10000000.0");
 * string columns get their own min/max columns.
 */
object Profiling {

  private case class Col(name: String, kind: String) // kind: num | ts | str

  private val OrderCols = Seq(
    Col("o_orderkey", "num"), Col("o_custkey", "num"),
    Col("o_orderstatus", "str"), Col("o_totalprice", "num"),
    Col("o_orderdate", "ts"), Col("o_orderpriority", "str"))

  /** Profile of the orders table: one output row per column. */
  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "orders")
    def numView(c: Col): Column = c.kind match {
      case "num" => col(c.name).cast("double")
      // NTZ → TZ cast is exact under the UTC session timezone, matching
      // DuckDB's epoch_us on the same ntz value
      case "ts"  => unix_micros(col(c.name).cast("timestamp")).cast("double")
      case _     => lit(null).cast("double")
    }
    def strView(c: Col): Column =
      if (c.kind == "str") col(c.name) else lit(null).cast("string")
    val aggs = OrderCols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c.name))).as(s"${c.name}__nulls"),
          countDistinct(col(c.name)).as(s"${c.name}__distinct"),
          min(numView(c)).as(s"${c.name}__min_num"),
          max(numView(c)).as(s"${c.name}__max_num"),
          min(strView(c)).as(s"${c.name}__min_str"),
          max(strView(c)).as(s"${c.name}__max_str"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = OrderCols.map { c =>
      struct(lit(c.name).as("column_name"),
             col(s"${c.name}__nulls").as("n_nulls"),
             col(s"${c.name}__distinct").as("n_distinct"),
             col(s"${c.name}__min_num").as("min_num"),
             col(s"${c.name}__max_num").as("max_num"),
             col(s"${c.name}__min_str").as("min_str"),
             col(s"${c.name}__max_str").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  val dataProfileSql: String = {
    def numExpr(c: Col): String = c.kind match {
      case "num" => c.name
      case "ts"  => s"epoch_us(${c.name})"
      case _     => "NULL"
    }
    val agg = OrderCols.flatMap { c =>
      Seq(s"COUNT(*) - COUNT(${c.name}) AS ${c.name}__nulls",
          s"COUNT(DISTINCT ${c.name}) AS ${c.name}__distinct",
          s"CAST(MIN(${numExpr(c)}) AS DOUBLE) AS ${c.name}__min_num",
          s"CAST(MAX(${numExpr(c)}) AS DOUBLE) AS ${c.name}__max_num",
          (if (c.kind == "str") s"MIN(${c.name})" else "CAST(NULL AS VARCHAR)") +
            s" AS ${c.name}__min_str",
          (if (c.kind == "str") s"MAX(${c.name})" else "CAST(NULL AS VARCHAR)") +
            s" AS ${c.name}__max_str")
    }.mkString(",\n    ")
    val unions = OrderCols.map { c =>
      s"""SELECT '${c.name}' AS column_name,
         |  CAST(${c.name}__nulls AS BIGINT) AS n_nulls,
         |  CAST(${c.name}__distinct AS BIGINT) AS n_distinct,
         |  ${c.name}__min_num AS min_num, ${c.name}__max_num AS max_num,
         |  ${c.name}__min_str AS min_str, ${c.name}__max_str AS max_str
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |  SELECT
       |    $agg
       |  FROM orders)
       |$unions""".stripMargin
  }
}
