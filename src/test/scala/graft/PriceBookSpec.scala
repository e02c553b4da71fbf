package graft

import org.scalatest.funsuite.AnyFunSuite

/** golden/query_prices.tsv — the per-query price book (r18 verdict #1)
  * — plus the book_suspect decision rule. The book carries quiet-box
  * warm-median prices so the bench artifact can flag a query whose
  * suite AND fresh readings are BOTH contention-inflated (ratio ≈ 1,
  * so the fresh/suite recheck is structurally blind to it — r18's
  * q137 shipped 16–18 s against a 1.6–3.1 s true price that way).
  * Staleness is pinned the CensusGoldenSpec way: the book must cover
  * exactly the registered query set, so adding a query without
  * re-pricing fails loudly. */
class PriceBookSpec extends AnyFunSuite {

  private def short(k: String): String = k.takeWhile(_ != '_')

  test("price book covers exactly the registered query set (regen with " +
      "tools/pricebook.py over quiet-box bench_detail runs)") {
    val book = Bench.loadPriceBook()
    assert(book.nonEmpty, "golden/query_prices.tsv missing from classpath")
    val expected = SparkEntry.queries.keySet.map(short)
    val missing = expected -- book.keySet
    val stale = book.keySet -- expected
    assert(missing.isEmpty,
      s"queries missing from the price book: ${missing.toSeq.sorted}")
    assert(stale.isEmpty,
      s"stale price-book rows: ${stale.toSeq.sorted}")
    assert(book.values.forall(v => v > 0.0 && v < 120.0),
      "implausible book price (not in (0, 120) seconds)")
  }

  test("bookSuspects fires only when BOTH suite and fresh exceed " +
      "band x book — the double miss the fresh/suite ratio cannot see") {
    val book = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0)
    val readings = Seq(
      ("q1", 10.0, 9.0), // both inflated → flag
      ("q2", 10.0, 1.1), // suite-only miss (the recheck's case) → no flag
      ("q3", 1.2, 9.0),  // fresh-only miss → no flag
      ("q4", 50.0, 50.0)) // not in the book → never flags (no baseline)
    assert(Bench.bookSuspects(readings, book, 3.0) == Seq(("q1", 1.0)))
    // boundary: exactly band × book is NOT a miss (strictly greater)
    assert(Bench.bookSuspects(Seq(("q1", 3.0, 3.0)), book, 3.0).isEmpty)
    // forced band (the SPARK_GRAFT_BOOK_BAND test hook): every booked
    // query with a fresh reading flags
    assert(Bench.bookSuspects(readings, book, 1e-4).map(_._1) ==
      Seq("q1", "q2", "q3"))
    // empty book (resource missing): structurally cannot flag
    assert(Bench.bookSuspects(readings, Map.empty, 3.0).isEmpty)
  }
}
