package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the q134 lifecycle cost breakdown (round 12). */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("CODEGEN_CACHE", "5000"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val io = s"${sys.props("user.dir")}/src/test/resources/io"
    val base = java.nio.file.Files.createTempDirectory("q134prof").toFile
    val mixed = new java.io.File(base, "in"); mixed.mkdirs()
    java.nio.file.Files.copy(new java.io.File(s"$io/e4.zip").toPath,
      new java.io.File(mixed, "subjA.zip").toPath)
    java.nio.file.Files.copy(new java.io.File(s"$io/mapped.csv").toPath,
      new java.io.File(mixed, "subjB.csv").toPath)
    val opts = graft.ops.RunPipeline.Options(segSize = 1, e4Dtype = "PPG",
      csvDtype = "EDA", csvFs = 1,
      csvMapping = Map("when" -> "Timestamp", "microsiemens" -> "EDA",
        "temp_c" -> "TEMP"))
    t("warm-up")(spark.range(10).count())
    import org.apache.spark.sql.functions._
    val zipPath = new java.io.File(mixed, "subjA.zip").getPath
    val bvp = t("e4Modality BVP read")(
      graft.io.Readers.e4Modality(spark, zipPath, "BVP.csv")
        .withColumn("subject", lit(1L)).withColumnRenamed("BVP", "value"))
    t("bvp count")(bvp.count())
    val beats = t("vanGent build")(
      graft.kernels.PpgDetectors.vanGent(bvp, 64).select("subject", "idx"))
    t("vanGent count")(beats.count())
    t("vanGent count again")(beats.count())
    val annotated = bvp.join(beats.withColumn("beat", lit(1)),
      Seq("subject", "idx"), "left")
      .withColumn("artifact", lit(null).cast("int"))
    val metrics = t("metrics build")(
      graft.sqa.Cardio.computeMetrics(annotated, 64, 1))
    t("metrics count")(metrics.count())
    t("annotated write")(graft.io.Readers.writeCsvSingle(annotated, s"$base/w1"))
    t("zip route (BVP cardiac)")(graft.ops.RunPipeline.run(spark,
      zipPath, s"$base/t1", s"$base/r1", opts))
    t("csv route (EDA)")(graft.ops.RunPipeline.run(spark,
      new java.io.File(mixed, "subjB.csv").getPath,
      s"$base/t2", s"$base/r2", opts))
    spark.stop()
  }
}
