package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ratchet for the extra-scale (sf0.1) census failure class.
  *
  * The sf0.1 sweep has a stable, adjudicated failure set — golden-fixture
  * oracles pinned to the sf0.01 gate scale plus single-cell cross-engine
  * double-rounding flips (ARCHITECTURE.md "Cross-engine double rounding").
  * Membership is CODE now, not prose: `golden/census_failures.tsv`, one
  * `name<TAB>reason` row per expected failure. The executable ratchet is
  * `tools/check.py --census <golden>` run against a full sf0.1 Verify
  * dump — it exits nonzero when a query OUTSIDE the golden fails (a new
  * member must be adjudicated in the round that caused it) and flags
  * stale entries that now pass. This spec keeps the golden itself honest
  * between census runs: entries must be well-formed, unique, carry a
  * known reason class, and reference queries that still exist (a renamed
  * or deleted query must leave the list in the same change).
  */
class CensusGoldenSpec extends AnyFunSuite {

  private val ReasonClasses = Set(
    // oracle is a golden fixture generated at the sf0.01 gate scale, so
    // row counts differ at sf0.1 by design (detector/filter kernels)
    "fixture-pinned",
    // one boundary cell: the documented double-rounding-onto-.5 class
    // (~5 per 10^6 derived values), deterministic-green at the gate scale
    "boundary-rounding")

  test("census_failures.tsv is well-formed and references live queries") {
    val in = getClass.getResourceAsStream("/golden/census_failures.tsv")
    assert(in != null, "golden/census_failures.tsv missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    val entries = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val p = l.split("\t")
        assert(p.length == 2, s"expected name<TAB>reason, got: $l")
        (p(0), p(1))
      }
    assert(entries.nonEmpty, "empty census golden — regenerate it")
    val names = entries.map(_._1)
    assert(names.distinct.size == names.size,
      s"duplicate census entries: ${names.diff(names.distinct).distinct}")
    val known = SparkEntry.queries.keySet
    entries.foreach { case (n, _) =>
      assert(known.contains(n), s"stale census entry (no such query): $n")
    }
    entries.foreach { case (n, r) =>
      assert(ReasonClasses.contains(r),
        s"unknown census reason class '$r' for $n — " +
          s"use one of $ReasonClasses or extend the class list WITH " +
          "an adjudication note in ARCHITECTURE.md")
    }
  }
}
