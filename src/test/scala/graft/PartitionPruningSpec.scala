package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partition-pruning leg of the 100 TB posture (ARCHITECTURE "Scale
  * design"): fact tables land date/source-partitioned, so a query that
  * filters on the partition column must read ONLY the matching
  * directories — the scan's partition count, not a post-scan filter, is
  * what turns 100 TB into the day's slice. This spec pins that contract
  * on the physical plan: the partition filter appears in the scan node,
  * the selected-partition count equals the predicate's, and the
  * data-filter path is NOT used for the partition column.
  */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("source-partitioned corpus: a source filter prunes to its directories") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "lang", "text")
    docs.write.mode("overwrite").partitionBy("source").parquet(tmp)
    val nSources = docs.select("source").distinct().count()
    assert(nSources > 1, "vacuous: single-source corpus")

    val pruned = spark.read.parquet(tmp).filter(col("source") === "src0")
      .select("doc_id", "text")
    val scan = scanOf(pruned)

    // the predicate lands in partitionFilters, not dataFilters
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filter in scan: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "source")),
      "source predicate leaked into data filters (full scan + post-filter)")
    // exactly one of the source directories is selected
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.selectedPartitions.partitionCount}")

    // and the pruned read returns exactly the filtered rows
    val expected = docs.filter(col("source") === "src0").count()
    assert(pruned.count() == expected)
  }

  test("unfiltered read still sees every partition (no accidental pruning)") {
    val tmp = Files.createTempDirectory("graft_part_all").toString
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    docs.write.mode("overwrite").partitionBy("source").parquet(tmp)
    val nSources = docs.select("source").distinct().count()

    val all = spark.read.parquet(tmp)
    assert(scanOf(all.select("doc_id")).selectedPartitions.partitionCount == nSources)
    assert(all.count() == docs.count())
  }
}
