package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.b is the declared query contract the per-round audit
  * checks the repo against — a drifted declaration hides real gaps (the
  * round-9 verdict caught `q_graph_labelprop` implemented, benched, and
  * correctness-green but never declared). This suite pins the contract
  * three ways: §2.b's row set must equal `SparkEntry.queries`' key set
  * exactly, every query must carry a DuckDB oracle, and `Bench`/`Verify`
  * run the same inventory (they both iterate `SparkEntry.queries`).
  */
class SurveyContractSuite extends AnyFunSuite {

  /** Query names declared as §2.b table rows: lines `| \`q_...\` | ...`
    * between the `### 2.b` heading and the next top-level section. */
  private def declaredQueries: Set[String] = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val start = lines.indexWhere(_.startsWith("### 2.b"))
    assert(start >= 0, "SURVEY.md has no '### 2.b' heading")
    val section = lines.drop(start + 1)
      .takeWhile(l => !l.startsWith("## ") && !l.startsWith("### "))
    val row = """^\|\s*`([qs]_[a-z0-9_]+)`""".r
    section.flatMap(l => row.findFirstMatchIn(l).map(_.group(1))).toSet
  }

  test("SURVEY §2.b row set equals SparkEntry.queries key set") {
    val declared = declaredQueries
    val implemented = SparkEntry.queries.keySet
    val undeclared = implemented -- declared
    val unimplemented = declared -- implemented
    assert(undeclared.isEmpty,
      s"implemented but not declared in SURVEY §2.b: ${undeclared.toSeq.sorted.mkString(", ")}")
    assert(unimplemented.isEmpty,
      s"declared in SURVEY §2.b but not implemented: ${unimplemented.toSeq.sorted.mkString(", ")}")
  }

  test("every query has a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle: ${missing.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no query name collides across operator files") {
    // SparkEntry.queries is built by ++ over per-file maps; a duplicate
    // key would silently shadow an earlier registration. Count the
    // registrations per name across the contributing maps.
    val maps: Seq[Map[String, _]] = SparkEntry.queryMaps
    val counts = maps.flatMap(_.keys).groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"query names registered more than once: ${dups.mkString(", ")}")
  }
}
