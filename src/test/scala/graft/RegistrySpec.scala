package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing registries. */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("query names are unique (Map construction would silently drop dups)") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
