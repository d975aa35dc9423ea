package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query surface. */
object Tables {

  /** Load one driver testdata table (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * Exact-money arithmetic bridge for the DuckDB oracle: the testdata money
   * columns are 2-decimal doubles; summing doubles is order-dependent, so a
   * Spark sum and a DuckDB sum can differ in the last ulp and break the
   * driver's hash compare. Casting to decimal first makes every sum exact
   * and order-independent in BOTH engines; the final cast back to double is
   * then deterministic. Oracle side uses the same
   * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` shape.
   */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
