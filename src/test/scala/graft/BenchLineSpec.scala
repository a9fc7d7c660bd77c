package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's final JSON line under the driver's
  * log-tail capture. Rounds 9–12 all shipped a final line that
  * overflowed the capture (r11: 5,874 bytes; r12: ~2.1 KB against a
  * window the artifact itself measured at ~2.2 KB INCLUDING the sbt
  * `[success]` line), and round 17 re-overflowed it by ~5 bytes
  * (q167's wall + the median/gt8 fields) — `BENCH_r17.json` carries
  * `parsed: null`. The budget is therefore enforced BY finalLine
  * itself ([[Bench.lineBudget]], with a 1-dp degrade tier) and
  * pinned here at 145 fake entries — ~10 more than the current
  * corpus, the r17 verdict's headroom ask — with realistic
  * magnitudes. The armor baseline is likewise pinned: a broken
  * newest artifact must FALL BACK to the next parseable one, and a
  * committed BENCH_SELF.json sidecar is preferred over both.
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

  // worst-case shape: the below-band annotation fields present
  // (r19 ask #4) so the budget pins cover the line at its longest
  private val fakeIngest =
    """{"rows":320000,"rps":396123.5,"rpsd":411234.6,"bpr":6.2,"iload":{"t":8.2,"d":14.0},"oob":true,"prev":1482345.7}"""

  private def fakeLine(n: Int): String =
    Bench.finalLine(fakeEntries(n),
      hostLoad = """{"start":11.3,"end":13.9,"cores":32,"median":12.3,"gt8":128,"amed":2.4,"ag8":11}""",
      failed = Seq("q999_failed_entry"),
      sf = "/root/testdata/sf0.1",
      ingest = fakeIngest,
      newKeys = Set("3", "7"))

  test("final line with 145 entries stays under the 1.9 KB tail budget") {
    // 145 = current corpus + ~10 headroom entries (r17 verdict ask
    // #1's done condition). The emit-time guard inside finalLine may
    // degrade walls to 1 dp to hold the budget — parseability over
    // precision; the full 3-dp walls live in the sidecar.
    val line = fakeLine(145)
    assert(line.length <= 1900, s"final bench line is ${line.length} bytes: $line")
    assert(mapper.readTree(line).get("queries").size() == 147)
  }

  test("emit-time guard: an oversized corpus degrades precision, not parseability") {
    // far beyond any realistic corpus: the guard's 1-dp tier must
    // still produce one parseable line (growth can cost decimals,
    // never the artifact)
    val line = fakeLine(180)
    val root = mapper.readTree(line)
    assert(root.get("queries").size() == 182)
    assert(line.length <= 1900, s"${line.length} bytes at 180 entries: $line")
  }

  test("mass failure keeps the line under budget (failed list is capped)") {
    val entries = (1 to 145).map { i =>
      // a failed entry records a -1 wall sentinel, so mass failure
      // SHRINKS the wall map; the failed list is the growth risk
      val failed = i <= 60
      (f"q$i%d_some_entry_name_here", if (failed) -1.0 else 2.345 + (i % 7),
        123.4 + i, false)
    }
    val line = Bench.finalLine(entries,
      hostLoad = """{"start":11.3,"end":13.9,"cores":32,"median":12.3,"gt8":128,"amed":2.4,"ag8":11}""",
      failed = (1 to 60).map(i => f"q$i%d_some_entry_name_here"),
      sf = "/root/testdata/sf0.1",
      ingest = fakeIngest)
    assert(line.length <= 1900, s"mass-failure line is ${line.length} bytes: $line")
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
    val entries = (1 to 145).map { i =>
      (f"q$i%d_some_entry_name_here", 4.345 + (i % 7), 123.4 + i, true)
    }
    val line = Bench.finalLine(entries,
      hostLoad = """{"start":24.3,"end":27.9,"cores":32,"median":25.7,"gt8":145,"amed":14.8,"ag8":145}""",
      failed = Nil,
      sf = "/root/testdata/sf0.1",
      ingest = fakeIngest)
    assert(line.length <= 1900, s"mass-rerun line is ${line.length} bytes: $line")
    val r = mapper.readTree(line).get("rerun")
    assert(r.size() == 13, r.toString)
    assert(r.get(12).asText() == "+133", r.toString)
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
    // the kept ingest attempt's start load rides the final line
    // (r17 verdict ask #4) so a below-band rps self-adjudicates
    assert(root.get("ingest").get("iload").get("t").asDouble() == 8.2)
    // walls at 2 dp (budget trim, r17 verdict ask #1); fixed-value
    // fields ("unit":"sec") are gone
    assert(root.get("queries").get("mart").asDouble() == 28.88)
    assert(!root.has("unit"))
    // the total decomposition: derive/build lines (d) vs carried
    // entries (e) vs entries new this round (n — keys 3 and 7 here)
    val parts = root.get("parts")
    assert(math.abs(parts.get("d").asDouble() - (28.876 + 9.134)) < 5e-3)
    val newSum = entries.collect {
      case (k, w, _, _) if Set("3", "7")(Bench.entryKey(k)) => w }.sum
    assert(math.abs(parts.get("n").asDouble() - newSum) < 5e-3)
    assert(math.abs(parts.get("d").asDouble() + parts.get("e").asDouble()
      + parts.get("n").asDouble() - root.get("value").asDouble()) < 3e-2)
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

  test("fallback: a broken newest artifact resolves to the next parseable one") {
    // the r17 failure mode exactly: the newest BENCH_r*.json lost its
    // line head to the tail window (parsed: null) — the armor must
    // walk newest → oldest instead of silently running baseline-less
    // (r17 verdict ask #2)
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_fb").toFile
    dir.deleteOnExit()
    java.nio.file.Files.copy(
      new java.io.File("BENCH_r16.json").toPath,
      new java.io.File(dir, "BENCH_r16.json").toPath)
    // a head-truncated r17-style wrapper: raw tail cut mid-line, no
    // parsed section — the real BENCH_r17.json's shape
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_r17.json").toPath,
      """{"n": 17, "rc": 0, "tail": "41\":0.33,\"sf\":\"trunc", "parsed": null}""")
    val walls = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(walls.get("mart").contains(57.927), walls.get("mart").toString)
    assert(walls.get("01").contains(0.659))
  }

  test("sidecar: preferred over driver artifacts, sf-keyed, bad file degrades") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_sc").toFile
    dir.deleteOnExit()
    java.nio.file.Files.copy(
      new java.io.File("BENCH_r16.json").toPath,
      new java.io.File(dir, "BENCH_r16.json").toPath)
    // merge-write two sf records; the second write must not clobber
    // the first (a local sf0.01 iteration run vs the committed sf0.1)
    Bench.writeSelfBench("/root/testdata/sf0.1",
      """{"sf":"/root/testdata/sf0.1","queries":{"q01_pricing_summary":{"w":0.712,"c":3.1,"l":2.0,"r":false},"factor_mart":{"w":31.5,"c":410.0,"l":2.1,"r":false}}}""",
      dir = dir.getAbsolutePath)
    Bench.writeSelfBench("/root/testdata/sf0.01",
      """{"sf":"/root/testdata/sf0.01","queries":{"q01_pricing_summary":{"w":0.101,"c":0.5,"l":2.0,"r":false}}}""",
      dir = dir.getAbsolutePath)
    // sidecar wins over the r16 artifact in the same dir, per sf
    val w1 = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(w1.get("01").contains(0.712), w1.toString) // sidecar, not r16's 0.659
    assert(w1.get("mart").contains(31.5))
    val w2 = Bench.previousArtifactWalls("/root/testdata/sf0.01",
      searchDir = dir.getAbsolutePath)
    assert(w2.get("01").contains(0.101))
    // unknown sf: sidecar misses → artifact scan; r16 is sf0.1-only
    // so an sf0.001 lookup finds nothing
    assert(Bench.previousArtifactWalls("/root/testdata/sf0.001",
      searchDir = dir.getAbsolutePath).isEmpty)
    // a corrupt sidecar degrades to the artifact scan, never throws
    java.nio.file.Files.writeString(
      new java.io.File(dir, Bench.selfBenchName).toPath, "{not json")
    val w3 = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(w3.get("01").contains(0.659), w3.toString)
    // and a merge-write over the corrupt file preserves it as
    // .corrupt forensics instead of silently absorbing the tear
    Bench.writeSelfBench("/root/testdata/sf0.1",
      """{"sf":"/root/testdata/sf0.1","queries":{"q01_pricing_summary":{"w":0.5,"c":1.0,"l":1.0,"r":false}}}""",
      dir = dir.getAbsolutePath)
    assert(new java.io.File(dir, Bench.selfBenchName + ".corrupt").isFile)
    val w4 = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(w4.get("01").contains(0.5), w4.toString)
  }

  test("previousRoundWalls: driver artifact beats the sidecar (parts.n baseline)") {
    // the newness baseline must be ROUND-stamped: the sidecar absorbs
    // every mid-round local bench iteration, so an entry added this
    // round is already in it by the closing run and parts.n would
    // read 0 for genuinely-new walls (r18's artifact did exactly
    // that). Same fixture dir as the armor case — but here the r16
    // artifact must WIN over a sidecar that already carries the
    // "new" entry.
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_prw").toFile
    dir.deleteOnExit()
    java.nio.file.Files.copy(
      new java.io.File("BENCH_r16.json").toPath,
      new java.io.File(dir, "BENCH_r16.json").toPath)
    Bench.writeSelfBench("/root/testdata/sf0.1",
      """{"sf":"/root/testdata/sf0.1","queries":{"q01_pricing_summary":{"w":0.712,"c":3.1,"l":2.0,"r":false},"q999_added_this_round":{"w":9.9,"c":1.0,"l":1.0,"r":false}}}""",
      dir = dir.getAbsolutePath)
    val round = Bench.previousRoundWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(round.get("01").contains(0.659), round.toString) // the artifact, not the sidecar
    assert(!round.contains("999"), "sidecar leaked into the round baseline")
    // while the ARMOR baseline still prefers the sidecar's fidelity
    val armor = Bench.previousArtifactWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(armor.get("01").contains(0.712))
    assert(armor.contains("999"))
    // no artifact parses → the sidecar is still better than nothing
    assert(new java.io.File(dir, "BENCH_r16.json").delete())
    val fallback = Bench.previousRoundWalls("/root/testdata/sf0.1",
      searchDir = dir.getAbsolutePath)
    assert(fallback.contains("999"), fallback.toString)
  }

  test("previousArtifactWalls live smoke: newest artifact parses, key-agnostic") {
    // the one assertion allowed to touch the mutable artifact series:
    // the repo root must yield a baseline with SOME derive key
    // (whatever this round calls its build line) and the q01 wall —
    // via the sidecar if committed, else the newest PARSEABLE
    // BENCH_r*.json (r17's own artifact is head-truncated; the
    // fallback is what keeps this green and the armor armed).
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

  test("sidecarIngestRps: max-of-mediums per sf record; absent/corrupt reads -1") {
    // the below-band annotation's `prev` axis (r19 verdict ask #4):
    // a contended closing artifact cites the last committed idle
    // reading, so it must parse exactly and degrade silently
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_ir").toFile
    dir.deleteOnExit()
    Bench.writeSelfBench("/root/testdata/sf0.1",
      """{"sf":"/root/testdata/sf0.1","queries":{},"ingest":{"rows":320000,"rps":910000.1,"rpsd":1482345.7,"bpr":6.2}}""",
      dir = dir.getAbsolutePath)
    val f = new java.io.File(dir, Bench.selfBenchName)
    assert(Bench.sidecarIngestRps("/root/testdata/sf0.1", f) == 1482345.7)
    assert(Bench.sidecarIngestRps("/root/testdata/sf0.01", f) == -1.0)
    assert(Bench.sidecarIngestRps("/root/testdata/sf0.1",
      new java.io.File(dir, "absent.json")) == -1.0)
    java.nio.file.Files.writeString(f.toPath, "{not json")
    assert(Bench.sidecarIngestRps("/root/testdata/sf0.1", f) == -1.0)
  }
}
