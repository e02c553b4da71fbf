package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Connected-components dedup clustering: min-label propagation must reach
  * the true component minimum, including on chain graphs where one round
  * of neighbor-mins is not enough. */
class DedupClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("chain component converges to the global minimum across rounds") {
    import spark.implicits._
    // 10-1000-2000-3000-4000 chain: min label 10 must travel 4 hops
    val pairs = Seq((1000L, 10L), (1000L, 2000L), (2000L, 3000L), (3000L, 4000L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 1000L -> 10L, 2000L -> 10L,
      3000L -> 10L, 4000L -> 10L))
  }

  test("separate components keep separate minima; sizes count members") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }
}
