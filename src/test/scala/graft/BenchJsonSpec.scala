package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

/** The bench output line IS the driver's bench record for the round —
  * a malformed line silently zeroes it. Assert the contract: valid
  * JSON under a comma-decimal locale, qNN key shortening, the -1
  * both-passes-failed marker excluded from the total, and the cdc
  * extras.
  */
class BenchJsonSpec extends AnyFunSuite {

  private def render(results: Seq[(String, Double)],
      ingest: Option[(Double, Double)],
      multi: Option[(Double, Double)] = None,
      spread: Seq[(String, Double)] = Nil): String =
    Bench.renderJson(results, spread, ingest, multi, "/tmp/sf")

  /** Minimal JSON sanity without a parser dep: balanced braces, no
    * locale commas in numbers, expected keys present.
    */
  test("line is one valid JSON object with shortened keys") {
    val line = render(Seq("q01_pricing_summary" -> 1.5,
      "q92_join_cardinality" -> 0.25), Some((2.0, 18000.9)))
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"q01\":1.50"))
    assert(line.contains("\"q92\":0.25"))
    assert(line.contains("\"cdc\":2.00"))
    assert(line.contains("\"cdc_ingest_rows_per_sec\":18000"))
    assert(line.contains("\"value\":3.750")) // 1.5 + 0.25 + 2.0
    assert(line.contains("\"queries_total\":1.750")) // 1.5 + 0.25, no cdc
    assert(line.contains("\"passes\":2") && line.contains("\"agg\":\"min\""))
  }

  test("third-pass selection: >=2x disagreement and failed passes " +
      "qualify; spread survives a failed retry and skips " +
      "single-sample queries") {
    val inf = Double.PositiveInfinity
    // agreement inside the floor: no third pass
    assert(!Bench.needsThirdPass(Seq(1.0, 1.4)))
    // >=2x disagreement: contaminated, re-measure
    assert(Bench.needsThirdPass(Seq(1.0, 2.0)))
    // ONE failed pass: the min rests on a single (possibly
    // JIT-contaminated first-execution) sample — re-measure; a double
    // failure gets one bounded retry rather than a guaranteed -1
    assert(Bench.needsThirdPass(Seq(14.0, inf)))
    assert(Bench.needsThirdPass(Seq(inf, inf)))
    // spread over FINITE samples only: a failed third pass must not
    // hide the real 2.5x pass1/pass2 disagreement it was meant to
    // arbitrate
    assert(Bench.spreadRatio(Seq(2.0, 5.0, inf)).contains(2.5))
    // fewer than two successful samples: no ratio to report
    assert(Bench.spreadRatio(Seq(2.0, inf)).isEmpty)
    assert(Bench.spreadRatio(Seq(inf, inf)).isEmpty)
    // inside the floor: not worth line budget
    assert(Bench.spreadRatio(Seq(1.0, 1.2, 1.4)).isEmpty)
  }

  test("p3_n records the targeted-third-pass count, omitted when zero") {
    val withP3 = Bench.renderJson(Seq("q01_x" -> 1.0), Nil, None, None,
      "/tmp/sf", thirdPassed = 4)
    assert(withP3.contains("\"p3_n\":4"), withP3)
    val noP3 = Bench.renderJson(Seq("q01_x" -> 1.0), Nil, None, None,
      "/tmp/sf")
    assert(!noP3.contains("p3_n"), noP3)
  }

  test("multi-table ingest adds cdcm timing and its rate/table-count keys") {
    val line = render(Seq("q01_x" -> 1.0), Some((2.0, 18000.0)),
      Some((3.5, 9000.7)))
    assert(line.contains("\"cdcm\":3.50"))
    assert(line.contains("\"cdc_multi_rows_per_sec\":9000"))
    assert(line.contains(s""""cdc_multi_tables":${Bench.MultiTables}"""))
    assert(line.contains("\"value\":6.500")) // 1.0 + 2.0 + 3.5
    assert(line.contains("\"queries_total\":1.000")) // ingest excluded
  }

  test("decimal rendering survives a comma-decimal default locale") {
    val prev = Locale.getDefault
    Locale.setDefault(Locale.GERMANY)
    try {
      val line = render(Seq("q01_x" -> 1.5), None)
      assert(line.contains("\"q01\":1.50"), line)
      assert(!line.matches(""".*\d,\d.*"""), line)
    } finally Locale.setDefault(prev)
  }

  test("failed queries (-1 marker) stay visible but never inflate the total") {
    val line = render(Seq("q01_ok" -> 2.0, "q02_broken" -> -1.0), None)
    assert(line.contains("\"q02\":-1.00"))
    assert(line.contains("\"value\":2.000"))
  }

  test("failed list names every -1 query explicitly, with the true count") {
    val line = render(Seq("q01_ok" -> 2.0, "q02_broken" -> -1.0,
      "q03_broken" -> -1.0), None)
    assert(line.contains(""","failed_n":2,"failed":["q02","q03"]"""), line)
  }

  test("all-green run still emits an empty failed list (affirmative signal)") {
    val line = render(Seq("q01_ok" -> 2.0), None)
    assert(line.contains(""","failed_n":0,"failed":[]"""), line)
  }

  test("calibration samples and their median render; absent when not " +
      "measured (spec-only renders)") {
    val line = Bench.renderJson(Seq("q01_x" -> 1.0), Nil, None, None,
      "/tmp/sf", cal = Seq(0.51, 0.48, 0.55))
    assert(line.contains(""","cal":[0.51,0.48,0.55],"cal_med":0.51"""),
      line)
    assert(!render(Seq("q01_x" -> 1.0), None).contains("cal"))
  }

  test("medianOf (each cal sample is a median of 3 back-to-back probe " +
      "runs — the single-shot probe spread ±30% within one session, " +
      "wider than the drift it measures) picks the middle, not a tail") {
    assert(Bench.medianOf(Seq(0.67, 0.36, 0.51)) == 0.51)
    assert(Bench.medianOf(Seq(9.0, 0.5, 0.48)) == 0.5) // one-off stall out
    assert(Bench.medianOf(Seq(1.0)) == 1.0)
  }

  test("mass failure caps the name list but keeps the true count " +
      "(parse-window protection)") {
    val many = (1 to 40).map(i => f"q$i%02d_x" -> -1.0)
    val line = render(many, None)
    assert(line.contains(""","failed_n":40"""), line)
    val failedSection = line.substring(line.indexOf("\"failed\":["))
      .takeWhile(_ != ']')
    assert(failedSection.count(_ == ',') == Bench.FailedCap - 1,
      failedSection) // exactly FailedCap names listed
  }

  test("ingest spreads render only at/above the floor") {
    val withSpread = Bench.renderJson(Seq("q01_x" -> 1.0), Nil,
      Some((2.0, 18000.0)), Some((3.0, 9000.0)), "/tmp/sf",
      ingestSpread = Some(2.5), multiSpread = Some(1.1))
    assert(withSpread.contains(""","cdc_spread":2.50"""), withSpread)
    assert(!withSpread.contains("cdcm_spread"), withSpread)
    val noSpread = Bench.renderJson(Seq("q01_x" -> 1.0), Nil,
      Some((2.0, 18000.0)), None, "/tmp/sf")
    assert(!noSpread.contains("cdc_spread"), noSpread)
  }

  test("no ingest → no cdc keys, total is query sum") {
    val line = render(Seq("q01_x" -> 1.0), None)
    assert(!line.contains("cdc"))
    assert(line.contains("\"value\":1.000"))
  }

  test("spread entries render as a shortened-key ratio map") {
    val line = render(Seq("q17_x" -> 1.0), None,
      spread = Seq("q17_x" -> 8.696, "q11_y" -> 2.0))
    assert(line.contains(""","spread":{"q17":8.70,"q11":2.00}"""), line)
  }

  test("empty spread emits no spread key") {
    assert(!render(Seq("q01_x" -> 1.0), None).contains("spread"))
  }

  test("spread caps at the worst entries to protect the parse window") {
    val many = (1 to 40).map(i => f"q$i%02d_x" -> (1.5 + i * 0.1))
    val line = render(Seq("q01_x" -> 1.0), None, spread = many)
    assert(line.count(_ == ':') <=
      Bench.SpreadCap + 12) // spread keys + fixed keys, no blowup
    assert(line.contains("\"q40\":5.50")) // worst entry always kept
    assert(!line.contains("\"q01\":1.60")) // mildest dropped
  }
}
