package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's final JSON line under the driver's
  * log-tail capture. Rounds 9–12 all shipped a final line that
  * overflowed the capture (r11: 5,874 bytes; r12: ~2.1 KB against a
  * window the artifact itself measured at ~2.2 KB INCLUDING the sbt
  * `[success]` line — the JSON head with the q01–q09 walls was lost
  * all four rounds). The budget is therefore 1,900 bytes, enforced at
  * 130 fake entries — more than the current corpus — with realistic
  * magnitudes. Any field added to [[Bench.finalLine]] that
  * re-overflows the capture fails this spec before it can cost
  * another round's artifact; the bulky per-entry CPU array lives on
  * the diag line ([[Bench.cpuArrayJson]]) for exactly this reason.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // realistic worst-case magnitudes: most entries are single-digit
  // seconds at sf0.1 (r12 judge sweep: slowest single entry 5.6 s);
  // every 9th entry simulates a pathological tens-of-seconds reading
  private def fakeEntries(n: Int): Seq[(String, Double, Double, Boolean)] =
    ("factor_mart", 28.876, 412.3, false) +:
      ("cluster_derive", 9.134, 119.7, false) +:
      (1 to n).map { i =>
        val wall = if (i % 9 == 0) 40.0 + i / 10.0 else 2.345 + (i % 7)
        (f"q$i%d_some_entry_name_here", wall, 123.4 + i, i % 7 == 0)
      }

  private def fakeLine(n: Int): String =
    Bench.finalLine(fakeEntries(n),
      hostLoad = """{"start":11.312,"end":13.897,"cores":32,"median":12.3,"gt8":128}""",
      failed = Seq("q999_failed_entry"),
      sf = "/root/testdata/sf0.1",
      ingest = """{"rows":320000,"rps":3961234.5,"rps_disk":4112345.6,"bpr":6.2}""",
      newKeys = Set("3", "7"))

  test("final line with 130 entries stays under the 1.9 KB tail budget") {
    val line = fakeLine(130)
    assert(line.length < 1900, s"final bench line is ${line.length} bytes: $line")
  }

  test("mass failure keeps the line under budget (failed list is capped)") {
    val entries = (1 to 130).map { i =>
      // a failed entry records a -1 wall sentinel, so mass failure
      // SHRINKS the wall map; the failed list is the growth risk
      val failed = i <= 60
      (f"q$i%d_some_entry_name_here", if (failed) -1.0 else 2.345 + (i % 7),
        123.4 + i, false)
    }
    val line = Bench.finalLine(entries,
      hostLoad = """{"start":11.312,"end":13.897,"cores":32,"median":12.3,"gt8":128}""",
      failed = (1 to 60).map(i => f"q$i%d_some_entry_name_here"),
      sf = "/root/testdata/sf0.1",
      ingest = """{"rows":320000,"rps":3961234.5,"rps_disk":4112345.6,"bpr":6.2}""")
    assert(line.length < 1900, s"mass-failure line is ${line.length} bytes: $line")
    val f = mapper.readTree(line).get("failed")
    assert(f.get(0).asText() == "1")
    // capped at 12 keys + a "+N" count marker; the full set stays
    // recoverable from the -1 walls in the queries map
    assert(f.size() == 13, f.toString)
    assert(f.get(12).asText() == "+48", f.toString)
  }

  test("mass rerun keeps the line under budget (rerun list is capped)") {
    // a contended host pushes MOST entries over the rerun threshold
    // at once — exactly the round whose artifact must survive the
    // tail capture to explain itself
    val entries = (1 to 130).map { i =>
      (f"q$i%d_some_entry_name_here", 4.345 + (i % 7), 123.4 + i, true)
    }
    val line = Bench.finalLine(entries,
      hostLoad = """{"start":24.312,"end":27.897,"cores":32,"median":25.7,"gt8":130}""",
      failed = Nil,
      sf = "/root/testdata/sf0.1",
      ingest = """{"rows":320000,"rps":3961234.5,"rps_disk":4112345.6,"bpr":6.2}""")
    assert(line.length < 1900, s"mass-rerun line is ${line.length} bytes: $line")
    val r = mapper.readTree(line).get("rerun")
    assert(r.size() == 13, r.toString)
    assert(r.get(12).asText() == "+118", r.toString)
  }

  test("final line is one parseable JSON object; cpu array on the diag side") {
    val entries = fakeEntries(130)
    val line = fakeLine(130)
    assert(!line.contains("\n"))
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("queries").size() == 132) // 130 + mart + cluster
    assert(root.get("queries").has("34"))
    assert(root.get("rerun").isArray)
    assert(root.get("host_load").get("cores").asInt() == 32)
    assert(root.get("ingest").get("rows").asLong() == 320000L)
    assert(root.get("queries").get("mart").asDouble() == 28.876)
    // the total decomposition: derive/build lines vs carried entries
    // vs entries new this round (keys 3 and 7 in the fixture)
    val parts = root.get("parts")
    assert(math.abs(parts.get("derive").asDouble() - (28.876 + 9.134)) < 1e-6)
    val newSum = entries.collect {
      case (k, w, _, _) if Set("3", "7")(Bench.entryKey(k)) => w }.sum
    assert(math.abs(parts.get("new").asDouble() - newSum) < 1e-6)
    assert(math.abs(parts.get("derive").asDouble() + parts.get("entries").asDouble()
      + parts.get("new").asDouble() - root.get("value").asDouble()) < 1e-6)
    // the CPU axis moved to the diag line — index-aligned with the
    // wall map's key order, absent from the final line
    assert(!root.has("cpu_by_query_order"))
    val cpu = mapper.readTree(
      s"""{"cpu_by_query_order":${Bench.cpuArrayJson(entries)}}""")
      .get("cpu_by_query_order")
    assert(cpu.size() == 132)
    assert(cpu.get(0).asDouble() == 412.3)
  }

  test("previousArtifactWalls: exact keys/values from COMMITTED fixtures") {
    // pinned against git-tracked, immutable artifacts — NOT the newest
    // working-dir file, which the driver rewrites after every commit
    // (the r16 suite went red when BENCH_r16.json renamed the derive
    // key 'alpha' → 'mart' under a test that asserted the old key on
    // whatever file was newest). Both artifact generations must parse:
    // r15-style ('alpha' derive line) and r16-style ('mart').
    val r15 = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      Some(new java.io.File("BENCH_r15.json")))
    assert(r15.get("alpha").contains(79.302), r15.get("alpha").toString)
    assert(r15.get("01").contains(0.96))
    val r16 = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      Some(new java.io.File("BENCH_r16.json")))
    assert(r16.get("mart").contains(57.927), r16.get("mart").toString)
    assert(r16.get("01").contains(0.659))
    for (walls <- Seq(r15, r16)) {
      assert(walls.values.forall(v => v == -1.0 || v >= 0.0))
      // compact keys only (the parsed section's map), never full names
      assert(walls.keys.forall(k => !k.contains("_")))
    }
    // SF guard: an artifact from a DIFFERENT scale factor is no
    // baseline — comparing across SFs would mark every entry >2x and
    // double the run on spurious reruns
    assert(Bench.previousArtifactWalls("/root/testdata/sf0.01",
      Some(new java.io.File("BENCH_r16.json"))).isEmpty)
  }

  test("previousArtifactWalls live smoke: newest artifact parses, key-agnostic") {
    // the one assertion allowed to touch the mutable artifact series:
    // the NEWEST BENCH_r*.json must yield a wall map with SOME derive
    // key (whatever this round calls its build line) and the q01 wall.
    // No exact keys/values — those live in the fixture test above.
    val walls = Bench.previousArtifactWalls("/root/testdata/sf0.1")
    assert(walls.nonEmpty, "no artifact parsed from the repo root")
    assert(walls.keySet.exists(Set("alpha", "mart")), walls.keySet.toString)
    assert(walls.contains("01"))
  }

  test("entryKey compacts numbered entries and derivation lines") {
    assert(Bench.entryKey("q34_jaccard_pairs") == "34")
    assert(Bench.entryKey("q01_pricing_summary") == "01")
    assert(Bench.entryKey("q133_collocations") == "133")
    assert(Bench.entryKey("factor_mart") == "mart")
    assert(Bench.entryKey("alpha_derive") == "alpha") // pre-r16 artifacts
    assert(Bench.entryKey("cluster_derive") == "cluster")
  }
}
