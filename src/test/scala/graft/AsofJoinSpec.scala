package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def fixtures = {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (1L, 330L, "c"), (2L, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 9.0), (1L, 200L, 2.0), (1L, 400L, 4.0), (3L, 1L, 1.0))
      .toDF("k", "t", "v")
    (left, right)
  }

  test("nearest picks the closer side; ties go backward; missing key yields null") {
    val (left, right) = fixtures
    val out = AsofJoin.join(left, right, Seq("k"), "t", "t", Seq("v" -> "v"),
      direction = "nearest")
      .collect().map(r => (r.getString(2), Option(r.get(4)))).toMap
    assert(out("a") == Some(9.0)) // 100: dist 10 back vs 100 fwd
    assert(out("b") == Some(2.0)) // 205: dist 5 back
    assert(out("c") == Some(4.0)) // 330: dist 130 back vs 70 fwd
    assert(out("d") == None) // key 2 has no right rows
  }

  test("tolerance cuts matches beyond the bound") {
    val (left, right) = fixtures
    val out = AsofJoin.join(left, right, Seq("k"), "t", "t", Seq("v" -> "v"),
      tolerance = Some(20L), direction = "nearest")
      .collect().map(r => (r.getString(2), Option(r.get(4)))).toMap
    assert(out("a") == Some(9.0))
    assert(out("b") == Some(2.0))
    assert(out("c") == None) // nearest is 70 away > 20
  }

  test("backward includes exact matches; forward excludes earlier rows") {
    val (left, right) = fixtures
    import spark.implicits._
    val exact = Seq((1L, 200L, "x")).toDF("k", "t", "tag")
    val b = AsofJoin.join(exact, right, Seq("k"), "t", "t", Seq("v" -> "v"),
      direction = "backward").collect().head
    assert(b.get(4) == 2.0)
    val f = AsofJoin.join(exact, right, Seq("k"), "t", "t", Seq("v" -> "v"),
      direction = "forward").collect().head
    assert(f.get(4) == 2.0) // exact match allowed both directions
    val after = Seq((1L, 201L, "y")).toDF("k", "t", "tag")
    val f2 = AsofJoin.join(after, right, Seq("k"), "t", "t", Seq("v" -> "v"),
      direction = "forward").collect().head
    assert(f2.get(4) == 4.0)
  }
}
