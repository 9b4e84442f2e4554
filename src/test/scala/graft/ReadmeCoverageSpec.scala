package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** README's coverage map drifted behind the query registry twice (rounds
  * 3 and 4) — so the sync is now a test, not a chore: every registered
  * query name must appear in README.md. */
class ReadmeCoverageSpec extends AnyFunSuite {

  test("every SparkEntry.queries key is documented in README.md") {
    val readme = new String(
      Files.readAllBytes(Paths.get("README.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(readme.contains)
    assert(missing.isEmpty,
      s"queries missing from README.md coverage map: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
