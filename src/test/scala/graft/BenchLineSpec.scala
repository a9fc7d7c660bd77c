package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's final JSON line under the driver's
  * ~2.9 KB log-tail capture. Rounds 9–11 all shipped a final line
  * that overflowed the capture (r11: 5,874 bytes — the artifact held
  * the tail of the CPU map and ZERO wall-clock numbers), so the size
  * budget is enforced here at 120 fake entries — more than the
  * current corpus — with realistic 2–3-digit seconds. Any field
  * added to [[Bench.finalLine]] that re-overflows the capture fails
  * this spec before it can cost another round's artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fakeLine(n: Int): String = {
    val entries = ("alpha_derive", 28.876, 412.3, false) +:
      ("cluster_derive", 2.134, 19.7, false) +:
      (1 to n).map { i =>
        // every 7th entry marked rerun; worst-realistic magnitudes
        (f"q$i%d_some_entry_name_here", 12.345 + i, 123.4 + i, i % 7 == 0)
      }
    Bench.finalLine(entries,
      hostLoad = """{"start":11.312,"end":13.897,"cores":32}""",
      failed = Seq("q999_failed_entry"),
      sf = "/root/testdata/sf0.1",
      ingest = """{"rows":320000,"rps":3961234.5,"rps_disk":4112345.6,"bpr":6.2}""")
  }

  test("final line with 120 entries stays under the 2.8 KB tail budget") {
    val line = fakeLine(120)
    assert(line.length < 2800, s"final bench line is ${line.length} bytes: $line")
  }

  test("mass failure keeps the line under budget (failed is entryKey-compacted)") {
    val entries = (1 to 120).map { i =>
      (f"q$i%d_some_entry_name_here", 12.345 + i, 123.4 + i, false)
    }
    val line = Bench.finalLine(entries,
      hostLoad = """{"start":11.312,"end":13.897,"cores":32}""",
      failed = (1 to 60).map(i => f"q$i%d_some_entry_name_here"),
      sf = "/root/testdata/sf0.1",
      ingest = """{"rows":320000,"rps":3961234.5,"rps_disk":4112345.6,"bpr":6.2}""")
    assert(line.length < 2800, s"mass-failure line is ${line.length} bytes: $line")
    assert(mapper.readTree(line).get("failed").get(0).asText() == "1")
  }

  test("final line is one parseable JSON object with aligned wall/cpu axes") {
    val line = fakeLine(120)
    assert(!line.contains("\n"))
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("queries").size() == 122) // 120 + alpha + cluster
    assert(root.get("cpu_by_query_order").size() == 122)
    assert(root.get("queries").has("34"))
    assert(root.get("rerun").isArray)
    assert(root.get("host_load").get("cores").asInt() == 32)
    assert(root.get("ingest").get("rows").asLong() == 320000L)
    // wall and cpu stay index-aligned: entry i's cpu is array slot i
    assert(root.get("queries").get("alpha").asDouble() == 28.876)
    assert(root.get("cpu_by_query_order").get(0).asDouble() == 412.3)
  }

  test("entryKey compacts numbered entries and derivation lines") {
    assert(Bench.entryKey("q34_jaccard_pairs") == "34")
    assert(Bench.entryKey("q01_pricing_summary") == "01")
    assert(Bench.entryKey("q133_collocations") == "133")
    assert(Bench.entryKey("alpha_derive") == "alpha")
    assert(Bench.entryKey("cluster_derive") == "cluster")
  }
}
