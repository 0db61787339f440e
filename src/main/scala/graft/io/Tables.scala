package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver corpus (TESTDATA.md) and engine-side sinks.
  *
  * The reference loads its catalogs from ad-hoc `.npy` arrays and CSV sheets
  * (ref `src/az_proc.py:414-438`, `:275`); the engine standardizes on columnar
  * Parquet with explicit schemas so scans are vectorized, column-pruned, and
  * predicate-pushed at any scale.
  */
object Tables {

  /** Load one corpus table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame   = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = table(spark, d, "region")
  /** The events parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long (legacy conf, runtime-settable) and
    * convert to a microsecond timestamp with *integer* division — double
    * division would lose precision above 2^53 ns. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
