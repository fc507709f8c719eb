package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-freshness gate (round-11 verdict item 8): the audit chain
  * operator → query → oracle is only trustworthy while
  * `docs/COVERAGE.md` stays current with `SparkEntry.queries`, and
  * while every PlanSweep window allowlist entry names a live query
  * with a recorded reason. These checks make the two documented-drift
  * failure modes (a query landing without a coverage row — the
  * round-11 q373–q424 gap; an allowlist entry outliving its query)
  * FAIL THE BUILD instead of waiting for the next audit.
  */
class CoverageGuardSpec extends AnyFunSuite {

  private lazy val coverage: String = {
    val p = java.nio.file.Paths.get("docs/COVERAGE.md")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  /** q-number tokens from the QUERY column (3rd cell) of every table
    * row — check-note prose citing other queries ("the q134 argument")
    * must not count as coverage.
    */
  private lazy val coveredQ: Set[String] = coverage.linesIterator
    .filter(_.trim.startsWith("|"))
    .flatMap { line =>
      val cells = line.split("\\|", -1)
      if (cells.length > 3) "q\\d+".r.findAllIn(cells(3)).toSeq
      else Seq.empty
    }
    .toSet

  private lazy val registryQ: Map[String, String] =
    SparkEntry.queries.keys.map(k => k.takeWhile(_ != '_') -> k).toMap

  test("every registry query has a COVERAGE.md row") {
    val missing = registryQ.collect {
      case (num, full) if !coveredQ.contains(num) => full
    }.toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no docs/COVERAGE.md row (add one per landed " +
        s"query): ${missing.mkString(", ")}")
  }

  test("every COVERAGE.md query row names a live registry query") {
    val stale = (coveredQ -- registryQ.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"COVERAGE.md rows citing queries absent from " +
        s"SparkEntry.queries: ${stale.mkString(", ")}")
  }

  test("plan-sweep window allowlist entries are live and argued") {
    PlanSweep.boundedWindowAllowlist.foreach { case (name, reason) =>
      assert(SparkEntry.queries.contains(name),
        s"allowlist entry $name is not a registry query")
      assert(reason.trim.length >= 20,
        s"allowlist entry $name needs a recorded reason, got: $reason")
    }
  }
}
