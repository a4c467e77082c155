package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-dump JSON escaping is harness-critical: every oracleSql
  * string must round-trip through a strict JSON parser. */
class JsonEscapeSpec extends AnyFunSuite {

  private def parses(json: String): Boolean = {
    // strict-enough check without a JSON dep: Jackson ships with Spark
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(json) != null
  }

  test("escapes quotes, backslashes, and all control characters") {
    val nasty = "a\"b\\c\nd\re\tfg"
    val quoted = JsonEscape.quote(nasty)
    assert(parses(quoted))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(quoted).asText() == nasty) // lossless round-trip
  }

  test("every registered oracle is valid inside a JSON document") {
    val doc = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonEscape.quote(k)}: ${JsonEscape.quote(v)}" }
      .mkString("{", ",", "}")
    assert(parses(doc))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(doc)
    assert(node.size() == SparkEntry.oracleSql.size)
  }
}
