package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q239/q241 cost breakdown (round 14). */
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[time] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warm-up")(spark.range(10).count())

    import graft.llm.TextOps
    import graft.core.Tables
    val docs = Tables.documents(spark, dir)
    t("docs count")(docs.count())
    val grams = docs.select(col("source"), col("doc_id"),
      explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
    t("grams count (1)")(grams.count())
    t("grams count (2)")(grams.count())
    val gramsRep = docs.repartition(32, col("doc_id"))
      .select(col("source"), col("doc_id"),
        explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
    t("grams repart count (1)")(gramsRep.count())
    t("grams repart count (2)")(gramsRep.count())
    val gk = grams.select(col("source"), col("doc_id"),
      substring(md5(col("g")), 1, 16).as("__gk"))
    t("gk count")(gk.count())
    // q239 core: window min over gram key
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("__gk")
    val nov = gk.withColumn("__first", min(col("doc_id")).over(wf))
      .groupBy("source", "doc_id")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__first") === col("doc_id"), 1L).otherwise(0L)).as("__nov"))
    t("q239 window+agg")(nov.count())
    // q241 subtrees
    val sh = docs
      .select(col("source"),
        explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
      .select(col("source"), substring(md5(col("g")), 1, 16).as("gk"))
      .distinct()
      .withColumn("__h", TextOps.wordHash60(col("gk")))
    t("q241 sh distinct count")(sh.count())
    val shC = t("q241 sh localCheckpoint")(sh.localCheckpoint())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("__h"), col("gk"))
    val ret = shC.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= 64)
    t("q241 ret count")(ret.count())
    val inter = shC.select(col("source").as("src_a"), col("gk"))
      .join(shC.select(col("source").as("src_b"), col("gk")), Seq("gk"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("__i"))
    t("q241 inter selfjoin")(inter.count())
    // full queries
    val q239 = graft.queries.LlmQueries.queries("q239_ngram_novelty")
    val q241 = graft.queries.LlmQueries.queries("q241_theta_diff")
    t("q239 full (1)")(q239(spark, dir).count())
    t("q239 full (2)")(q239(spark, dir).count())
    t("q241 full (1)")(q241(spark, dir).count())
    t("q241 full (2)")(q241(spark, dir).count())

    // Lambda-binding shingle variant: evaluate the words array ONCE by
    // binding it to a transform lambda variable, so element_at hits a
    // materialized array instead of re-running filter(split(lower())).
    def shinglesBound(text: org.apache.spark.sql.Column, n: Int) = {
      val bound = transform(array(TextOps.words(text)), ws => {
        val grams = transform(
          sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(k =>
            element_at(ws, (i + k + 1).cast("int"))): _*))
        array_distinct(when(size(ws) >= n, grams).otherwise(
          array().cast("array<string>")))
      })
      element_at(bound, 1)
    }
    val gramsB = docs.repartition(32, col("doc_id"))
      .select(col("source"), col("doc_id"),
        explode(shinglesBound(col("text"), 3)).as("g"))
    t("grams bound count (1)")(gramsB.count())
    t("grams bound count (2)")(gramsB.count())
    t("grams bound count (3)")(gramsB.count())
    val gramsRep2 = docs.repartition(32, col("doc_id"))
      .select(col("source"), col("doc_id"),
        explode(TextOps.shingles(TextOps.words(col("text")), 3)).as("g"))
    t("grams plain count (3)")(gramsRep2.count())
    t("grams plain count (4)")(gramsRep2.count())
    spark.stop()
  }
}
