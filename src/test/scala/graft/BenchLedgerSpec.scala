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

  test("samples accumulate across lines; corrupt lines are skipped") {
    val p = tmpLedger(
      """{"heavy":{"e6":{"wall":[12.0],"cpu":[148.1,150.0],"minflt":[2090000,2280000]}}}""",
      """not json at all""",
      """{"heavy":{"e6":{"cpu":[156.5],"minflt":[3230000]},"d5":{"cpu":[137.4],"minflt":[2050000]}}}""")
    val s = Bench.ledgerSamples(p)
    assert(s("e6")._1 == Seq(148.1, 150.0, 156.5))
    assert(s("e6")._2 == Seq(2090000.0, 2280000.0, 3230000.0))
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
    assert(json.contains(""""e6_dedup_pipeline":{"cpu":[148.0,156.5]"""))
    assert(json.contains(""""minflt":[1740000,3230000]"""))
  }
}
