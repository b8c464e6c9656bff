package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical corpus-drift guard: every reference test/doctest family
  * listed in FIXTURES.md §B must have a named ScalaTest twin. The audit
  * extracts each reference file cited in the §B fixture table
  * (`options/rule/equals.rs:176-200` → keyword "equals") and asserts the
  * keyword appears in at least one test name across the suite — so
  * removing or renaming a golden family without updating FIXTURES.md (or
  * vice versa) fails the build instead of silently shrinking coverage.
  */
class FixtureAuditSpec extends AnyFunSuite {

  private def repoFile(rel: String): Path = {
    // tests fork with cwd = repo root; when run from a nested cwd, walk up
    // to the directory that actually contains the file (a bare
    // Paths.get(rel) and a user.dir-prefixed path denote the same
    // location, so the old user.dir fallback was no fallback at all)
    Iterator.iterate(Paths.get("").toAbsolutePath)(_.getParent)
      .takeWhile(_ != null)
      .map(_.resolve(rel))
      .find(Files.exists(_))
      .getOrElse(Paths.get(rel))
  }

  /** Reference files cited in FIXTURES.md §B table rows. */
  private def citedFixtures(): Set[String] = {
    val md = Files.readString(repoFile("FIXTURES.md"))
    val tableRows = md.linesIterator.filter(_.startsWith("|")).mkString("\n")
    val cite = """([\w/]+\.(?:rs|md)):[\d,\-]+""".r
    cite.findAllMatchIn(tableRows).map(_.group(1)).toSet
  }

  /** Keyword a fixture's ScalaTest twin must carry in its name. */
  private def keyword(cite: String): String = {
    if (cite.contains("kitchen_sink")) "kitchen"
    else cite.split('/').last.stripSuffix(".rs").stripSuffix(".md").toLowerCase
  }

  /** All test names declared across the suite's sources. */
  private def declaredTestNames(): String = {
    val root = repoFile("src/test/scala")
    val name = """(?:test|ignore)\("([^"]+)"""".r
    scala.util.Using.resource(Files.walk(root)) { stream =>
      stream.iterator.asScala
        .filter(_.toString.endsWith(".scala"))
        .map(Files.readString(_))
        .flatMap(src => name.findAllMatchIn(src).map(_.group(1)))
        .mkString("\n")
        .toLowerCase
    }
  }

  test("every FIXTURES.md §B reference fixture has a named ScalaTest twin") {
    val cites = citedFixtures()
    assert(cites.size >= 20,
      s"FIXTURES.md parse degraded — found only ${cites.size} cites")
    val names = declaredTestNames()
    val unmapped = cites.filter(c => !names.contains(keyword(c))).toSeq.sorted
    assert(unmapped.isEmpty,
      s"fixtures with no named test twin: ${unmapped.mkString(", ")}")
  }
}
