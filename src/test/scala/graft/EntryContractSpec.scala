package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that must hold without running any query:
  * every declared query has an oracle, and the README's stated query
  * count cannot drift from `SparkEntry.queries.size` again.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without query: ${(o -- q).toSeq.sorted}")
  }

  test("README query count matches SparkEntry.queries.size") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")
    val counts = """(\d+) declared queries""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, "README.md no longer states a declared-query count")
    assert(counts.forall(_ == SparkEntry.queries.size),
      s"README says $counts declared queries, SparkEntry has ${SparkEntry.queries.size}")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
  }
}
