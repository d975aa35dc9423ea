package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query surface. */
object Tables {

  /** Load one driver testdata table (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * Load the events table. Its `ts` column is parquet TIMESTAMP(NANOS),
   * which Spark 4 refuses outright (PARQUET_TYPE_ILLEGAL) — even when `ts`
   * is pruned away, because footer schema conversion happens first. The
   * legacy conf reads it as a long (nanos since epoch); we then truncate to
   * microseconds, which is bit-identical to how DuckDB (µs-native) reads
   * the same file, keeping timestamp values oracle-comparable.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

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
