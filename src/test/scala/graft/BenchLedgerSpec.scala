package graft

import org.scalatest.funsuite.AnyFunSuite

/** The quiet-band ledger (round-15 item 6): parse tolerance, the
  * 2x-min quiet filter (a firing sits 4-25x over band and must NOT
  * widen the published band), and the per-run cpu/minflt alignment. */
class BenchLedgerSpec extends AnyFunSuite {

  private def tmpLedger(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("graft-ledger", ".jsonl")
    java.nio.file.Files.write(f,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    f.toString
  }

  test("run-1 samples accumulate across lines (warm run-2 samples are " +
    "NOT band material); corrupt lines are skipped") {
    val p = tmpLedger(
      // run-2 cpu 15.0 / minflt 20310 must be ignored: a warm sample
      // in the band would anchor the 2x-min filter at the warm floor
      // and misread every normal cold run as a firing
      """{"heavy":{"e6":{"wall":[12.0,1.6],"cpu":[148.1,15.0],"minflt":[2090000,20310]}}}""",
      """not json at all""",
      """{"heavy":{"e6":{"cpu":[156.5],"minflt":[3230000]},"d5":{"cpu":[137.4],"minflt":[2050000]}}}""")
    val s = Bench.ledgerSamples(p)
    assert(s("e6")._1 == Seq(148.1, 156.5))
    assert(s("e6")._2 == Seq(2090000.0, 3230000.0))
    assert(s("d5")._1 == Seq(137.4))
  }

  test("a firing (cpu past 2x min) is excluded from the band AND its " +
    "minflt sample goes with it") {
    val s = Map("e6" -> (Seq(148.0, 156.0, 892.6), // run 3 fired
                         Seq(2090000.0, 3230000.0, 4560000.0)))
    val json = Bench.quietBandsJson(s)
    assert(json ==
      """{"e6":{"cpu":[148.0,156.0],"minflt":[2090000,3230000],"n":2}}""")
  }

  test("missing ledger yields no bands, empty JSON object") {
    assert(Bench.ledgerSamples("/nonexistent/ledger.jsonl").isEmpty)
    assert(Bench.quietBandsJson(Map.empty) == "{}")
  }

  test("the committed seed ledger parses and bands both amplification " +
    "members") {
    val s = Bench.ledgerSamples("BENCH_LEDGER.jsonl")
    assert(s.contains("e6_dedup_pipeline") && s.contains("d5_ngram_jaccard"))
    val json = Bench.quietBandsJson(s)
    // seed run-1 cpu band 123-157 (d5): any official-run firing
    // appended later (cpu 4-16x) must not widen it
    val d5 = """"d5_ngram_jaccard":\{"cpu":\[(\d+\.\d),(\d+\.\d)\]""".r
    val m = d5.findFirstMatchIn(json)
    assert(m.isDefined, json)
    assert(m.get.group(1).toDouble == 123.0)
    assert(m.get.group(2).toDouble <= 200.0,
      s"a firing widened d5's quiet band: $json")
    assert(json.contains(""""e6_dedup_pipeline":{"cpu":[139.7,156.5]""") ||
      json.contains(""""e6_dedup_pipeline":{"cpu":[148.0,156.5]"""),
      json)
  }
}
