package graft.diff

import com.fasterxml.jackson.databind.JsonNode
import org.scalatest.Assertions
import scala.jdk.CollectionConverters._

/** Shared golden-test comparator: expected ⊆ actual, in the lenient
  * JSONAssert sense the reference's own suite used — every expected field
  * must be present and equal; extra actual fields are allowed.
  */
object JsonSubset extends Assertions {

  /** objects field-wise recursive, arrays same length and element-wise in
    * order, scalars by value (numbers compared numerically).
    */
  def assertSubset(expected: JsonNode, actual: JsonNode, path: String): Unit = {
    if (expected.isObject) {
      assert(actual != null && actual.isObject, s"$path: expected object, got $actual")
      expected.properties().asScala.foreach { e =>
        val a = actual.get(e.getKey)
        assert(a != null, s"$path.${e.getKey}: missing in actual")
        assertSubset(e.getValue, a, s"$path.${e.getKey}")
      }
    } else if (expected.isArray) {
      assert(actual != null && actual.isArray, s"$path: expected array, got $actual")
      assert(expected.size() == actual.size(),
        s"$path: array size ${expected.size()} != ${actual.size()}\nexpected=$expected\nactual=$actual")
      expected.elements().asScala.zip(actual.elements().asScala).zipWithIndex.foreach {
        case ((e, a), i) => assertSubset(e, a, s"$path[$i]")
      }
    } else if (expected.isNumber) {
      assert(actual.isNumber && expected.decimalValue().compareTo(actual.decimalValue()) == 0,
        s"$path: ${expected} != ${actual}")
    } else {
      assert(expected == actual, s"$path: ${expected} != ${actual}")
    }
  }
}
