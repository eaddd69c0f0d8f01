package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract sanity for the driver-facing registry. */
class RegistrySpec extends AnyFunSuite {
  test("query names are unique (Map adaptation loses nothing)") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).filter(_._2.size > 1).keys.mkString(","))
  }

  test("every oracle belongs to a declared query and is non-empty SQL") {
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"), n)
    }
  }

  test("entry() smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSession.spark).count() > 0)
  }

  test("SparkEntry maps mirror the registry") {
    assert(SparkEntry.queries.keySet === Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ===
      Registry.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }
}
