package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract on the query registry: every declared query must
  * carry a DuckDB oracle (a missing one silently downgrades the driver's
  * check to rows-only), names must be stable identifiers, and the bench
  * headline set must be a subset of the verified queries. */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle — no silent rows-only downgrades") {
    val all = Registry.all
    val missing = all.collect { case (name, d) if d.oracle.isEmpty => name }
    assert(missing.isEmpty,
      s"queries without oracle SQL (driver would only check row counts): $missing")
    assert(graft.SparkEntry.queries.keySet === graft.SparkEntry.oracleSql.keySet)
  }

  test("registry is well-formed: stable names, non-empty, headlines verified") {
    val all = Registry.all
    assert(all.size >= 61, s"query registry shrank to ${all.size}")
    assert(all.keys.forall(_.matches("[a-z0-9_]+")), "names must be snake_case ids")
    val headlines = all.filter(_._2.headline).keys.toSet
    assert(headlines.nonEmpty && headlines.subsetOf(all.keySet))
    // oracle SQL must be single statements (the driver runs them verbatim)
    assert(Registry.oracleSql.values.forall(sql => !sql.trim.endsWith(";")))
    // no cross-module name collisions (all would throw, but pin the count
    // identity so a future refactor of the guard can't regress silently)
    assert(Registry.modules.flatMap(_.defs.keys).size === Registry.all.size)
  }
}
