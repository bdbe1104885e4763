package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contract's load-bearing artifact is ONE JSON line on stdout
  * (r21 was the first round the driver ever parsed — BENCH_r01..r20 all
  * came back `parsed: null`). This spec pins that the line `Bench.main`
  * prints (a) parses as JSON with a strict parser and (b) carries the
  * driver-read fields `metric` / `value` / `queries` with the documented
  * semantics (value = Σ per-query minima; cold = first sample), including
  * under error strings that need escaping. No Spark session involved —
  * the assembly function is exactly what main prints.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode = {
    // strict: the driver's parser reads the whole line as one document
    val node = mapper.readTree(line)
    assert(node != null && node.isObject, s"not a JSON object: $line")
    node
  }

  test("metric line parses and carries metric/value/queries with min-of-reps semantics") {
    val results = Seq(
      ("q1_agg", 1.5, Seq(3.0, 1.5, 2.0)),
      ("q2_filter_project", 0.25, Seq(0.5, 0.3, 0.25)))
    val line = Bench.metricLine(
      results,
      phases = Seq("q1_agg" -> Map("index_build" -> 2.5)),
      calib = 0.4, calibMt = 0.5,
      probeTimeline = Seq((0, "<start>", -1, 0.41, 0.02)),
      reps = 3, sfDir = "/root/testdata/sf0.1",
      failuresInOrder = Nil)
    assert(!line.contains("\n"), "must stay one line")
    val node = parse(line)
    assert(node.get("metric").asText() == "total")
    assert(math.abs(node.get("value").asDouble() - 1.75) < 1e-9,
      "value must be the sum of per-query minima")
    val qs = node.get("queries")
    assert(qs.size() == 2 && math.abs(qs.get("q1_agg").asDouble() - 1.5) < 1e-9)
    assert(math.abs(node.get("cold").get("q1_agg").asDouble() - 3.0) < 1e-9,
      "cold must be the chronologically first sample")
    assert(node.get("samples").get("q2_filter_project").size() == 3)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("reps").asInt() == 3)
    assert(node.get("errors").size() == 0)
    assert(math.abs(node.get("phases").get("q1_agg").get("index_build").asDouble() - 2.5) < 1e-9)
  }

  test("error strings with quotes/backslashes/newlines stay parseable") {
    val line = Bench.metricLine(
      Seq(("q1_agg", 1.0, Seq(1.0))),
      phases = Nil, calib = 0.4, calibMt = 0.5,
      probeTimeline = Nil, reps = 1, sfDir = "/x",
      failuresInOrder = Seq("q9: Analysis \"quoted\" \\ back\nslash"))
    val node = parse(line)
    assert(!line.contains("\n"), "escaping must keep the line single-line")
    val err = node.get("errors").get(0).asText()
    assert(err.contains("\"quoted\"") && err.contains("\\ back") &&
      err.contains("slash"))
  }
}
