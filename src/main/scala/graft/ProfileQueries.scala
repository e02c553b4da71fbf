package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): per query, splits
  * wall time into plan construction, analysis+physical planning, and
  * execution, and counts jobs / stages / tasks plus executor-side task
  * time via a listener. Run with SPARK_GRAFT_ONLY to target queries:
  *
  *   SPARK_GRAFT_ONLY=q153_pagerank java ... graft.ProfileQueries
  *
  * Diagnostic only — never part of the bench/driver contract. */
object ProfileQueries {

  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var lastJobEndNs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1
      if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
        val cs = j.stageInfos.lastOption.map { si =>
          si.name + " | " + si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileQueries"))
            .getOrElse("?")
        }.getOrElse("?")
        jobStartNs.put(j.jobId, System.nanoTime())
        jobName.put(j.jobId, cs)
      }
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
        val now = System.nanoTime()
        val t0 = jobStartNs.getOrDefault(j.jobId, now)
        val gap = if (lastJobEndNs == 0) 0.0 else (t0 - lastJobEndNs) / 1e6
        lastJobEndNs = now
        System.err.println(
          f"[job] ${j.jobId}%4d dur=${(now - t0) / 1e6}%7.1fms gapBefore=$gap%7.1fms ${jobName.getOrDefault(j.jobId, "?")}")
      }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        taskTimeMs += t.taskMetrics.executorRunTime
        gcTimeMs += t.taskMetrics.jvmGCTime
        shuffleReadB += t.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += t.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      gcTimeMs = 0; shuffleReadB = 0; shuffleWriteB = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config(graft.ops.Quantiles.ModeConf,
        sys.env.getOrElse("SPARK_GRAFT_PCTL", "approx"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // same warm-up as Bench so first-query numbers are comparable
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Seq("events", "lineitem", "documents", "embeddings", "orders",
      "customer", "nation", "region", "part", "supplier").foreach { t =>
      try graft.core.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
        val times = (1 to repeat).map { r =>
          val before = spark.sparkContext.getPersistentRDDs.keySet
          acc.reset()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis + planning
          val t2 = System.nanoTime()
          try df.count() catch {
            case e: Throwable => System.err.println(s"[prof] $name FAILED: $e")
          }
          val t3 = System.nanoTime()
          def ms(a: Long, b: Long) = (b - a) / 1e6
          System.err.println(
            f"[prof] $name%-24s r$r build=${ms(t0, t1)}%7.1f plan=${ms(t1, t2)}%7.1f exec=${ms(t2, t3)}%8.1f ms  " +
              f"jobs=${acc.jobs}%3d stages=${acc.stages}%4d tasks=${acc.tasks}%5d taskTime=${acc.taskTimeMs}%7d gc=${acc.gcTimeMs}%5d " +
              f"shR=${acc.shuffleReadB >> 10}%7dK shW=${acc.shuffleWriteB >> 10}%7dK")
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.collect {
            case (id, rdd) if !before.contains(id) => rdd.unpersist(true)
          }
          (t3 - t0) / 1e9
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.collect {
          case (id, rdd) if !cachedBefore.contains(id) => rdd.unpersist(true)
        }
        System.gc()
        val med = times.sorted.apply((times.length - 1) / 2)
        System.err.println(f"[prof] $name%-24s MEDIAN $med%.3f s")
      }
    spark.stop()
  }
}
