package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift gate (r14 verdict #5: the hand-written ScalaTest
  * count drifted twice in two rounds despite tools/counts.sh). The
  * counts quoted in README/COVERAGE/SKILL are now ASSERTED against the
  * source-derived values — a doc edit that hand-writes a stale count
  * fails the build, and a code change that moves a count fails until
  * the docs are refreshed (run `tools/counts.sh` and paste).
  *
  * Matching rules (kept deliberately narrow so historical mentions
  * like "r10 swept 214/214" or "the 18-query ANN family" never bind):
  *  - `N ScalaTests`                        → test registration count
  *  - `N suites`                            → SparkSpec subclasses + 1
  *  - `N queries` / `N ...-matched queries` with N ≥ 100 → registry
  *    size (the ≥100 floor skips incidental phrases like "~40
  *    queries" in the runbook examples).
  */
class DocCountsSpec extends AnyFunSuite {
  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  private def walkScala(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).map(read).toSeq
  }

  test("README/COVERAGE/SKILL counts match the source-derived values") {
    val queryCount = SparkEntry.queries.size
    val tests = walkScala("src/test/scala")
    val testCount = tests.map(_.linesIterator.count(
      l => l.matches("""\s+(test|property)\(.*"""))).sum
    // suites = concrete classes extending the shared SparkSpec trait,
    // plus this suite (the one AnyFunSuite that needs no session)
    val suiteCount = tests.map(
      _.linesIterator.count(_.matches("""class \w+ extends SparkSpec.*"""))).sum + 1

    val docs = Seq("README.md", "COVERAGE.md",
      ".claude/skills/verify/SKILL.md")
    val reTests = """(\d+) ScalaTests""".r
    val reSuites = """(\d+) suites""".r
    val reQueries = """(\d+) (?:[\w-]+ )?queries""".r
    docs.foreach { d =>
      val body = read(java.nio.file.Paths.get(d))
      reTests.findAllMatchIn(body).foreach(m =>
        assert(m.group(1).toInt == testCount,
          s"$d says '${m.matched}' but source has $testCount — run tools/counts.sh"))
      reSuites.findAllMatchIn(body).foreach(m =>
        assert(m.group(1).toInt == suiteCount,
          s"$d says '${m.matched}' but source has $suiteCount suites"))
      reQueries.findAllMatchIn(body)
        .filter(_.group(1).toInt >= 100).foreach(m =>
          assert(m.group(1).toInt == queryCount,
            s"$d says '${m.matched}' but the registry has $queryCount — run tools/counts.sh"))
    }
  }
}
