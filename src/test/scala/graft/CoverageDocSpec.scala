package graft

/** Structural end to COVERAGE.md drift (the round-13 blemish: 208→209
  * counts stale, q208/q209 rows missing — the exact one-miss shape
  * PlansCoverageSpec already kills for PLANS.md): every declared
  * query must be cited somewhere in COVERAGE.md, and the declared-
  * query COUNTS in COVERAGE.md and README.md must equal the live
  * registry. A query added without its documentation now fails the
  * suite instead of surfacing in the verdict.
  */
class CoverageDocSpec extends SparkTestBase {

  private def qTokens(text: String): Set[String] =
    "q\\d+".r.findAllIn(text).toSet

  test("every declared query is cited in COVERAGE.md") {
    val cov = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    val cited = qTokens(cov)
    val missing = SparkEntry.queries.keySet
      .map(_.takeWhile(_ != '_'))
      .filterNot(cited.contains)
    assert(missing.isEmpty,
      s"declared queries with no COVERAGE.md citation: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add a row to the " +
        "operator table (and to the counts line if the total moved)")
  }

  test("the declared-query counts in COVERAGE.md and README.md match the registry") {
    val n = SparkEntry.queries.size
    val cov = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    val covCount = "All (\\d+) declared queries".r
      .findFirstMatchIn(cov).map(_.group(1).toInt)
    assert(covCount.contains(n),
      s"COVERAGE.md counts $covCount declared queries; the registry has $n")
    val readme = scala.io.Source.fromFile("README.md", "UTF-8").mkString
    val readmeCount = "driver contract: (\\d+) declared queries".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(readmeCount.contains(n),
      s"README.md counts $readmeCount declared queries; the registry has $n")
  }

  test("every oracle key is a declared query and every declared query has an oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles for undeclared queries: ${os -- qs}")
    assert((qs -- os).isEmpty,
      s"declared queries without oracles (driver downgrades them to " +
        s"rows-only checks): ${qs -- os}")
  }
}
