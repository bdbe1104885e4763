package graft.diff

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.diff.DiffModel._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden acceptance tests for the diff engine: the reference's 4 fixture
  * cases (ported from `src/test/resources/diffservice/case*` of the
  * reference, incl. cases 1–3 that its own suite had disabled,
  * `DiffServiceTest.java:41-44`). Comparison is lenient in the JSONAssert
  * sense the reference used: every expected field must be present and equal
  * in the actual output; extra fields in the actual (e.g. the `type` tag on
  * nested replace members) are allowed.
  */
class DiffEngineGoldenSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val base = "src/test/resources/diffservice"

  private def readJson(path: String): JsonNode =
    mapper.readTree(Files.readString(Paths.get(path)))

  /** Fixture before/after files: {task: [{content, timestamp}]}. */
  private def loadState(path: String): Map[String, Seq[CheckpointData]] = {
    val node = readJson(path)
    node.properties().asScala.map { e =>
      val cds = e.getValue.elements().asScala.map { item =>
        CheckpointData(
          item.get("content").asText().getBytes(StandardCharsets.UTF_8),
          item.get("timestamp").asLong(),
          "", "", e.getKey)
      }.toVector
      e.getKey -> (cds: Seq[CheckpointData])
    }.toMap
  }

  private def assertSubset(expected: JsonNode, actual: JsonNode, path: String): Unit =
    JsonSubset.assertSubset(expected, actual, path)

  // cases 1–4 are the reference's fixtures; case5 is OURS — it exercises
  // the JSON canonicalization (D7) through the golden path, which the
  // reference corpus never does (its contents are all plain text): the
  // expected output encodes Jackson default-pretty-printer line shapes
  // (`"k" : v`, inline `[ "a", "b" ]` arrays) hand-derived from the spec.
  for (c <- Seq("case1_addition", "case2_removal", "case3_modification",
    "case4_multiple_changes", "case5_json_canonical")) {
    test(s"golden $c matches expected.json") {
      val before = loadState(s"$base/$c/before.json")
      val after = loadState(s"$base/$c/after.json")
      val expected = readJson(s"$base/$c/expected.json")
      val diff = DiffEngine.computeDiff(before, after, sequenceNumber = 1)
      assert(diff.isDefined, s"$c produced an empty diff")
      val actual = mapper.readTree(DiffModel.toJson(diff.get))
      assertSubset(expected, actual, "$")
    }
  }

  test("identical states produce no diff (D10 empty-diff filter)") {
    val s = loadState(s"$base/case1_addition/after.json")
    assert(DiffEngine.computeDiff(s, s, 1).isEmpty)
  }

  test("canonicalization makes whitespace-insensitive JSON diffs empty") {
    def cd(s: String) = CheckpointData(s.getBytes(StandardCharsets.UTF_8), 1000L, "", "", "t")
    val a = Map("t" -> (Seq(cd("""{"a":[1,2],"b":1}"""))))
    val b = Map("t" -> (Seq(cd("{ \"a\" :\n [1,\n 2],  \"b\" : 1 }"))))
    assert(DiffEngine.computeDiff(a, b, 1).isEmpty)
  }
}
