package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Evidence for `io_partitioned_prune`'s layout claims: a Hive-style
  * `partitionBy(lang)` write produces per-language directories, a read
  * with a lang predicate prunes at the DIRECTORY level (only the matching
  * partitions are listed into the scan), and the residual data predicate
  * is pushed to the parquet reader — the two mechanisms that keep a
  * language-scoped job on a 100 TB corpus from touching the other
  * languages' bytes at all. */
class PartitionPruneSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes directories and pushes data filters") {
    val path = graft.io.Sinks.scratchDir("spec_partitioned_docs")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)

    val q = spark.read.parquet(path)
      .filter(col("lang").isin("en", "zh") && col("n_chars") > 100)
      .groupBy("lang").count()

    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // root whose children are not populated until execution
    val scans = q.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val scan = scans.head

    // lang is a partition column: the predicate must land in
    // partitionFilters (directory pruning), NOT in dataFilters
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang predicate not in partitionFilters: ${scan.partitionFilters}")
    // the scan must list only the 2 selected of 5 lang directories
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned partitions, got ${scan.selectedPartitions.partitionCount}")
    // n_chars is a data column: pushed to the parquet row-group reader
    assert(scan.dataFilters.exists(_.references.exists(_.name == "n_chars")),
      s"n_chars predicate not in dataFilters: ${scan.dataFilters}")
    assert(scan.metadata("PushedFilters").contains("GreaterThan(n_chars,100)"),
      s"n_chars not pushed to parquet: ${scan.metadata("PushedFilters")}")

    // and the pruned read returns exactly the unpartitioned answer
    val expected = docs.filter(col("lang").isin("en", "zh") && col("n_chars") > 100)
      .groupBy("lang").count().orderBy("lang").collect().toSeq
    assert(q.orderBy("lang").collect().toSeq == expected)
  }
}
