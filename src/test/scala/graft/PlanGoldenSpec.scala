package graft

/** The plan-shape GOLDEN corpus: every batch entry's executed-plan
  * operator signature ([[PlanAudit.signature]]) at sf0.001, diffed
  * against `src/test/resources/plan_golden.tsv`. The 37+ hand-written
  * pins in the *PlanSpec suites state each entry's load-bearing scale
  * invariant; this snapshot covers the Rest — a Spark version bump or
  * AQE heuristic change that silently reshapes any entry's plan (a
  * lost broadcast, a new exchange, a join strategy flip) fails here
  * with a per-entry diff instead of surfacing as a mystery in a
  * future round's bench.
  *
  * Regenerate after an INTENTIONAL plan change with
  * `SPARK_GRAFT_REGOLD=1 sbt "testOnly graft.PlanGoldenSpec"` and
  * review the diff like source: every changed line is a plan-shape
  * change you are signing off on. Regold MERGES: an entry's observed
  * signature is added to its alternates (`|`-separated), because one
  * axis is legitimately racy — when AQE converts a planned SMJ to a
  * broadcast join, a probe-side ENSURE_REQUIREMENTS exchange that
  * already started materializing survives in the final plan text or
  * not depending on stage-completion order (q50 observed ex=4 vs
  * ex=3 across identical runs). Everything else — the fixture, the
  * test session (local[4], 4 shuffle partitions), the memoized
  * derivations entering plans as cache/checkpoint scans — is
  * deterministic, so alternates stay rare and reviewed.
  */
class PlanGoldenSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/plan_golden.tsv")

  test("every batch entry's plan shape matches the golden corpus") {
    val actual = PlanAudit.goldenEntries.map { case (name, fn) =>
      name -> PlanAudit.signature(PlanAudit.finalPlan(fn(spark, sf)))
    }
    def readGolden(): Map[String, Set[String]] =
      if (!java.nio.file.Files.exists(goldenPath)) Map.empty
      else scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(goldenPath)).asScala
        .filter(_.nonEmpty)
        .map { l =>
          val Array(n, s) = l.split("\t", 2)
          n -> s.split("\\|").toSet
        }.toMap
    if (sys.env.get("SPARK_GRAFT_REGOLD").contains("1")) {
      val prev = readGolden()
      val merged = actual.map { case (n, s) =>
        n -> (prev.getOrElse(n, Set.empty) + s).toSeq.sorted.mkString("|")
      }
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath,
        merged.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n"))
      info(s"regenerated ${goldenPath} with ${merged.size} entries")
    } else {
      val golden = readGolden()
      assert(golden.nonEmpty,
        s"$goldenPath missing — regenerate with SPARK_GRAFT_REGOLD=1")
      val diffs = actual.flatMap { case (name, sig) =>
        golden.get(name) match {
          case None => Some(s"$name: NEW ENTRY (regold to add)\n  now: $sig")
          case Some(g) if !g.contains(sig) =>
            Some(s"$name: SHAPE CHANGED\n  golden: ${g.mkString(" | ")}\n  now:    $sig")
          case _ => None
        }
      } ++ golden.keySet.diff(actual.map(_._1).toSet).toSeq.sorted
        .map(n => s"$n: REMOVED (regold to drop)")
      assert(diffs.isEmpty,
        s"${diffs.size} plan-shape drift(s):\n${diffs.mkString("\n")}")
    }
  }
}
