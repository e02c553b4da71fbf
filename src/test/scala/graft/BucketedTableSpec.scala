package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join leg of the 100 TB posture (ARCHITECTURE "Scale
  * design"): persisting both sides of a recurring join bucketed by the
  * join key lets Spark plan the join with ZERO exchanges — the shuffle
  * is paid once at write time, not per query. This is the storage-layout
  * contract a production deployment would use for the events/documents
  * fact tables and their per-subject/per-doc derived state.
  */
class BucketedTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed writes make the doc-key join exchange-free") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    // Another suite may have created the shared session first, putting the
    // warehouse at the DEFAULT location — a fresh in-memory catalog then
    // collides with managed-table dirs left by a previous JVM. Drop both
    // the catalog entries and the on-disk locations before writing.
    for (t <- Seq("q_bucketed", "l_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = new java.io.File(wh, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (loc.exists) rm(loc)
    }
    // two derived per-doc tables, bucketed by the join key at write time
    graft.llm.TextAnalysis.quality(docs, "doc_id", "text")
      .write.mode("overwrite").bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("q_bucketed")
    graft.llm.TextAnalysis.langId(docs, "doc_id", "text")
      .write.mode("overwrite").bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("l_bucketed")

    val joined = spark.table("q_bucketed").join(spark.table("l_bucketed"), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free, got:\n$plan")
    assert(joined.count() == docs.count())

    // control: the same join over plain parquet DOES shuffle both sides
    val tmp = Files.createTempDirectory("graft_plain").toString
    graft.llm.TextAnalysis.quality(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/q")
    graft.llm.TextAnalysis.langId(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/l")
    val plain = spark.read.parquet(s"$tmp/q")
      .join(spark.read.parquet(s"$tmp/l"), "doc_id")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
