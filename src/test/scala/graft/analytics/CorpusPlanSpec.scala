package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Plan audits for the training-data-pipeline entries: the scaladocs
  * claim specific scale shapes (broadcast eval/query sides, no corpus
  * shuffles, generator-without-self-join) — pin them so a refactor
  * cannot silently reintroduce an all-pairs join or a full shuffle. */
class CorpusPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("decontamination: eval side broadcasts, corpus side never shuffle-joins") {
    val plan = finalPlan(CorpusQueries.decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("IVF search: two broadcasts + TakeOrdered, zero data exchanges") {
    val plan = finalPlan(CorpusQueries.ivfSearch(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.linesIterator.count(_.contains("BroadcastExchange")) >= 2, plan)
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning")), plan)
  }

  test("chunking: generator carries the token payload, no join at all") {
    val plan = finalPlan(CorpusQueries.chunkDocs(spark, sf))
    assert(plan.contains("Generate posexplode"), plan)
    assert(!plan.contains("Join"), plan)
    // only the final presentation sort may exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("hash split, packing, funnel: exactly one aggregate exchange each") {
    for (q <- Seq(CorpusQueries.hashSplit(spark, sf), CorpusQueries.seqPacking(spark, sf),
        CorpusQueries.filterFunnel(spark, sf))) {
      val plan = finalPlan(q)
      assert(plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1, plan)
    }
  }

  test("BM25: 1-row stats broadcast + TakeOrdered, no corpus-side exchange") {
    val plan = finalPlan(CorpusQueries.bm25Search(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning")
      && !plan.contains("Exchange rangepartitioning"), plan)
  }

  test("LM quality: model broadcast as one row, scoring side never shuffles") {
    val plan = finalPlan(CorpusQueries.lmQualityScore(spark, sf))
    // the unigram model reaches the scoring scan as a broadcast —
    // the corpus is never shuffled to meet it
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    // exactly one hash exchange: the token-count aggregation that
    // fits the model (the presentation sort is rangepartitioning)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1, plan)
  }

  test("merge pairs: pair stream combines map-side, no self-join") {
    val plan = finalPlan(CorpusQueries.mergePairStats(spark, sf))
    assert(!plan.contains("Join"), plan)
    // (lang, pair) count agg + per-lang window = two keyed exchanges,
    // both over the REDUCED pair-count frame
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 2, plan)
  }

  test("int8 ANN: broadcast query + TakeOrdered, no data exchange") {
    val plan = finalPlan(CorpusQueries.int8AnnSearch(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning")
      && !plan.contains("Exchange rangepartitioning"), plan)
  }

  test("ANN recall audit: both sides broadcast-shaped, no shuffle joins") {
    val plan = finalPlan(CorpusQueries.annRecallAudit(spark, sf))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(plan.linesIterator.count(_.contains("BroadcastExchange")) >= 2, plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("repetition: no doc_id join — dup2 rides the wordcount aggregation") {
    val plan = finalPlan(CorpusQueries.repetitionMetrics(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 2, plan)
  }

  test("q127 incremental dedup: bucketed index side joins without an exchange") {
    // the storage contract: the historical fingerprint index is
    // bucketed by fp, so the arrival-vs-index merge join reshuffles
    // only the batch side — the index scan feeds the join directly.
    // Exchange budget: batch-side shuffle to the index bucketing +
    // the winners aggregation + the final per-source rollup = 3; an
    // index-side shuffle would make it 4.
    val plan = finalPlan(CorpusQueries.incrementalDedup(spark, sf))
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 3, s"$ex hash exchanges (index side must not reshuffle):\n$plan")
  }

  test("q134 write-back: generational probe chain, one batch exchange, batch-sized merge") {
    // the day-2 probe joins BOTH index generations bucket-locally:
    // one batch-side exchange to the shared 8-bucket fp layout feeds
    // the gen-0 merge join, whose output keeps the fp partitioning
    // and sort, so the gen-1 join adds no exchange at all. Budget:
    // batch-to-bucket-layout + winners agg + final rollup = 3 for a
    // TWO-generation probe; any index-side or repeated batch-side
    // shuffle pushes it past.
    val plan = finalPlan(CorpusQueries.indexWriteBack(spark, sf))
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) >= 2, plan)
    assert(plan.contains("Bucketed: true"), plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 3, s"$ex hash exchanges (generations must probe bucket-locally):\n$plan")
    // the write-back moved batch-sized data: every gen-1 table this
    // session wrote holds at most day-1's 130 arrivals' fingerprints,
    // never the ~300-fingerprint history
    import spark.implicits._
    val gen1s = spark.catalog.listTables()
      .filter(_.name.startsWith("g134_fp_gen1_")).map(_.name).collect()
    assert(gen1s.nonEmpty)
    gen1s.foreach { t =>
      val n = spark.table(t).count()
      assert(n > 0 && n <= 130, s"$t has $n rows — not batch-sized")
    }
  }

  test("q150 compaction: exchange-free fold, one merge join, chain-identical") {
    val (g0, g1) = CorpusQueries.buildFpGenerations(spark, sf)
    // the fold reads two identically-bucketed generations and writes
    // one: every input bucket file becomes one task whose rows belong
    // to a single output bucket, so NOTHING moves between tasks — the
    // read side plans no exchange and the output holds exactly the
    // input files' worth of bucket files
    val union = spark.table(g0).unionAll(spark.table(g1))
    assert(!union.queryExecution.executedPlan.toString.contains("Exchange"),
      union.queryExecution.executedPlan.toString)
    val gc = CorpusQueries.foldGenerations(spark, g0, g1)
    assert(spark.table(gc).inputFiles.length ==
      spark.table(g0).inputFiles.length + spark.table(g1).inputFiles.length)
    // folded content = union content (disjoint by construction)
    assert(spark.table(gc).count() ==
      spark.table(g0).count() + spark.table(g1).count())
    // the probe against the folded index: ONE bucket-local merge join
    // where the generation chain needs one per generation — the point
    // of compacting. Exchange budget is q134's (batch-to-bucket +
    // winners agg + rollup = 3); the index side must not reshuffle.
    val folded = CorpusQueries.compactionProbe(spark, sf, Seq(gc))
    val plan = finalPlan(folded)
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) == 1, plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 3, s"$ex hash exchanges:\n$plan")
    // day-3 counters identical whether probing the chain or the fold
    val chain = CorpusQueries.compactionProbe(spark, sf, Seq(g0, g1))
      .collect().map(_.toSeq.toVector).toVector
    assert(folded.collect().map(_.toSeq.toVector).toVector == chain)
    assert(chain.nonEmpty)
  }

  test("q161 squash: exchange-free, exactly 8 files, value-identical") {
    val (g0, g1) = CorpusQueries.buildFpGenerations(spark, sf)
    val gc = CorpusQueries.foldGenerations(spark, g0, g1)
    // the fold left more files than buckets — that growth is what the
    // squash exists to stop
    assert(spark.table(gc).inputFiles.length > 8)
    // the squash is EXCHANGE-FREE: under the write's conf (bucketed
    // scan pinned on) the scan reports the hash distribution the
    // keyed repartition declares, so EnsureRequirements elides the
    // exchange — each bucket is one local read→merge-write task
    val abKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAb = spark.conf.get(abKey)
    spark.conf.set(abKey, "false")
    try {
      val repart = spark.table(gc).repartition(8, col("fp"))
      repart.collect()
      val rplan = repart.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!rplan.contains("Exchange"), rplan)
      assert(rplan.contains("Bucketed: true"), rplan)
    } finally spark.conf.set(abKey, prevAb)
    val sq = CorpusQueries.squashGeneration(spark, gc)
    // exactly one file per bucket — also proves repartition's hash
    // aligned with the bucket layout (a mismatch fans each task
    // across buckets, up to 64 files)
    assert(spark.table(sq).inputFiles.length == 8,
      s"${spark.table(sq).inputFiles.length} files")
    // content identical to the fold
    assert(spark.table(sq).exceptAll(spark.table(gc)).isEmpty
      && spark.table(gc).exceptAll(spark.table(sq)).isEmpty)
    // day-3 counters identical across chain / fold / squash
    val chain = CorpusQueries.compactionProbe(spark, sf, Seq(g0, g1))
      .collect().map(_.toSeq.toVector).toVector
    val fold = CorpusQueries.compactionProbe(spark, sf, Seq(gc))
      .collect().map(_.toSeq.toVector).toVector
    val squash = CorpusQueries.compactionProbe(spark, sf, Seq(sq))
      .collect().map(_.toSeq.toVector).toVector
    assert(squash == chain && squash == fold && squash.nonEmpty)
    // the probe against the squashed index keeps q150's shape: one
    // bucket-local merge join, index side never reshuffles
    val plan = finalPlan(CorpusQueries.compactionProbe(spark, sf, Seq(sq)))
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) == 1, plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 3, s"$ex hash exchanges:\n$plan")
  }

  test("q152 band compaction: exchange-free fold, chain-identical probe") {
    val (g0, g1) = CorpusQueries.buildBandGenerations(spark, sf)
    // same fold contract as q150, on the overlapping-key posting
    // layout: read side exchange-free, output = the inputs' files
    val union = spark.table(g0).unionAll(spark.table(g1))
    assert(!union.queryExecution.executedPlan.toString.contains("Exchange"),
      union.queryExecution.executedPlan.toString)
    val gc = CorpusQueries.foldBandGenerations(spark, g0, g1)
    assert(spark.table(gc).inputFiles.length ==
      spark.table(g0).inputFiles.length + spark.table(g1).inputFiles.length)
    assert(spark.table(gc).count() ==
      spark.table(g0).count() + spark.table(g1).count())
    // folded probe: the index side never reshuffles (q135/q139's
    // budget discipline) and candidates form on the bucket key
    val folded = CorpusQueries.bandProbe(spark, sf, Seq(gc))
    val plan = finalPlan(folded)
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // day-3 matches identical whether probing the chain or the fold —
    // and nonempty on BOTH sides of the index: a mutated re-crawl of
    // history (dup_of < 300) and of day 1 (dup_of ≥ 300) each appear
    val rows = folded.collect().map(_.toSeq.toVector).toVector
    val chain = CorpusQueries.bandProbe(spark, sf, Seq(g0, g1))
      .collect().map(_.toSeq.toVector).toVector
    assert(rows == chain && rows.nonEmpty)
    assert(rows.exists(_(1).asInstanceOf[Long] < 300))
    assert(rows.exists(_(1).asInstanceOf[Long] >= 300))
  }

  test("q155 bloom guard: no false negatives, all three outcomes live") {
    val rows = CorpusQueries.bloomGuardedDedup(spark, sf).collect()
    val tot = (c: Int) => rows.map(_.getLong(c)).sum
    val (arrived, bdups, skip, fp, dup) = (tot(1), tot(2), tot(3), tot(4), tot(5))
    // the split partitions the per-fp winners exactly
    assert(skip + fp + dup == arrived - bdups)
    // the pattern's both outcomes fire at this geometry: arrivals
    // proven-absent without probing, and false positives caught by
    // the real join; true dups exist (the re-crawled history)
    assert(skip > 0 && fp > 0 && dup > 0, s"skip=$skip fp=$fp dup=$dup")
    // ZERO false negatives: the guarded dup count equals the plain
    // unguarded membership count computed independently
    val d = graft.Tables.load(spark, sf, "documents")
    val fpc = graft.functions.TextFns.fingerprint(col("text"))
    val idx = d.filter(col("doc_id") < 400).select(fpc.as("fp")).distinct()
    val arrivals = d.filter(col("doc_id") >= 400).select(fpc.as("fp"))
      .unionAll(d.filter(col("doc_id") < 50).select(fpc.as("fp")))
      .unionAll(d.filter(col("doc_id") < 20).select(fpc.as("fp")))
      .distinct()
    val unguarded = arrivals.join(idx, Seq("fp"), "left_semi").count()
    assert(dup == unguarded, s"guarded=$dup unguarded=$unguarded")
    // the probe is bucket-local on the index side (q127's budget):
    // winners agg + batch-to-bucket + rollup, never an index shuffle
    val plan = finalPlan(CorpusQueries.bloomGuardedDedup(spark, sf))
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 3, s"$ex hash exchanges:\n$plan")
  }

  test("q157 incremental k-means: merged statistics == scratch recompute") {
    val (report, updated, scratch, _, _) = CorpusQueries.kmeansUpdateParts(spark, sf)
    // ADDITIVITY, the whole point: centroids from stored-stats +
    // batch-stats cell-wise addition are bit-identical to centroids
    // from one scratch pass over the full corpus
    def cmap(df: org.apache.spark.sql.DataFrame) = df.select("cid", "c")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val (u, sc) = (cmap(updated), cmap(scratch))
    assert(u == sc, s"merged != scratch on cells ${
      (u.keySet ++ sc.keySet).filter(k => u.get(k) != sc.get(k))}")
    val rows = report.collect()
    assert(rows.length == 16)
    // populations partition the corpus across the split
    val emb = graft.Tables.load(spark, sf, "embeddings")
    assert(rows.map(_.getLong(1)).sum == emb.filter(col("vec_id") < 400).count())
    assert(rows.map(_.getLong(2)).sum == emb.filter(col("vec_id") >= 400).count())
    // a cell untouched by new data drifts EXACTLY 0 (serving
    // centroids are the stored-stats quotient, so merge is identity)
    assert(rows.filter(_.getLong(2) == 0).forall(_.getLong(3) == 0))
    // and drift is detected where new data landed
    assert(rows.exists(r => r.getLong(2) > 0 && r.getLong(3) > 0))
  }

  test("q135 incremental near-dup: band index probed bucket-locally") {
    // the persisted posting index is bucketed by (band, bucket): the
    // candidate join reads it without an exchange — only the batch's
    // postings shuffle to the bucket layout. Exchange budget: batch
    // postings bucket-populations agg + batch-to-bucket-layout +
    // candidate distinct + two verify joins = 5; an index-side
    // reshuffle pushes past. (The index BUILD ran before this frame;
    // its exchanges are not in this plan.)
    val plan = finalPlan(CorpusQueries.incrementalNearDup(spark, sf))
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 5, s"$ex hash exchanges (index side must not reshuffle):\n$plan")
  }

  test("q139 band write-back: both generations probe the one batch exchange") {
    // the day-2 batch's postings shuffle ONCE to the (band, bucket)
    // layout; both generation probes are bucket-local merge joins
    // against that shared exchange (the second shows as a
    // ReusedExchange), and gen-1 hits exist — the write-back is live,
    // not dead storage
    val df = CorpusQueries.bandIndexWriteBack(spark, sf)
    val rows = df.collect()
    assert(rows.exists(_.getInt(2) == 1), "no gen-1 hits — write-back not exercised")
    assert(rows.exists(_.getInt(2) == 0))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) >= 2, plan)
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("q126 mixture materialization: rates broadcast, one rollup exchange") {
    val plan = finalPlan(CorpusQueries.mixMaterialize(spark, sf))
    // the 20-row rate table reaches the corpus as a broadcast; the
    // only hash exchanges aggregate (rates build + final rollup)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("q137 k-means: integer-exact rounds are deterministic and converge") {
    val a = CorpusQueries.kmeansTrain(spark, sf).collect()
    assert(a.length == 64) // 4 rounds x 16 centroids
    // every point is assigned every round (population conservation)
    val byRound = a.groupBy(_.getInt(0))
    val pops = byRound.view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(pops.values.toSet.size == 1, s"populations drifted: $pops")
    // Lloyd's with exact integer arithmetic: centroid movement
    // collapses across rounds on this fixture (round-1 shift is the
    // init-to-data jump; round 4 is fine-tuning)
    val shifts = byRound.view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(shifts(4) < shifts(1) / 10, s"no convergence signature: $shifts")
    // bit-determinism: a second derivation in the same session is
    // row-for-row identical (no rand(), no float accumulation order)
    val b = CorpusQueries.kmeansTrain(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("q138 semantic dedup: pairs form within cells only, no cross join") {
    // SemDeDup's scale contract: the candidate join is KEYED on the
    // trained cell — per-cell populations bound the pair count, and
    // no stage degenerates into an all-pairs cartesian (the only
    // nested-loop join allowed is the 1-row centroid-model broadcast)
    val df = CorpusQueries.semanticDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), plan)
    // the pair self-join keys on cell (shows up as an equi-join with
    // cell in its key list, not a BroadcastNestedLoopJoin condition)
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin")) && l.contains("cell")), plan)
  }

  test("q140 KMV sketch: partial buffers merge with no key shuffle") {
    // the sketch's scale contract: distinct-cardinality estimation
    // never shuffles the distinct key set — the kmv aggregate runs
    // partial-per-task then merges over a SinglePartition exchange
    // of k-long buffers; the ONLY hashpartitioning exchange in the
    // plan belongs to the exact-count audit column (which production
    // drops)
    val df = CorpusQueries.kmvDistinct(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("partial_kmv_min_k"), plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1, plan)
  }

  test("q141 overlap: one sketch build reused for both pair sides, BNLJ pairwise") {
    // one corpus scan builds every per-source sketch (a single
    // partial_kmv exchange, reused verbatim for the pair join's
    // build side) and the pairwise stage runs on the sketch frame
    // only — source count, not corpus size, bounds it
    val df = CorpusQueries.kmvSourceOverlap(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ReusedExchange"), plan)
    assert(plan.linesIterator.count(_.contains("partial_kmv_min_k")) == 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q142 winnowing: fingerprint-keyed candidate join, no nested loop") {
    // the miner's scale contract: candidates form on the fingerprint
    // key (population-capped), never via a cartesian/BNLJ, and the
    // WinnowFps kernel runs exactly ONCE — the fingerprint frame is
    // localCheckpointed for its three consumers, so the kernel must
    // be ABSENT from the query plan (it ran at materialization)
    val df = CorpusQueries.winnowNearDup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("winnow_fps"), plan)
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin")) && l.contains("f#")), plan)
  }

  test("q144 dup-gram coverage: window UNION (not sum), linear joins only") {
    val rows = CorpusQueries.dupGramCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = 8
    // coverage is a union of width-k windows: never exceeds the doc,
    // and overlapping windows must compress below the naive n·k sum
    // somewhere in a corpus with contiguous duplicated runs
    assert(rows.forall { r =>
      val (nt, ng, cov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      cov <= nt && cov >= math.min(k.toLong, nt) && cov <= ng * k
    })
    assert(rows.exists(r => r.getLong(3) < r.getLong(2) * k),
      "no doc exercised overlapping-window compression")
    // the dup-flag join back is keyed on the gram hash — a pair-style
    // nested loop or cartesian here would be quadratic in occurrences
    val plan = finalPlan(CorpusQueries.dupGramCoverage(spark, sf))
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the posting frame is localCheckpointed for its two consumers
    // (dup-count agg + join-back): the per-position md5 hash kernel
    // and the corpus-linear explode must be ABSENT from the final
    // plan — they ran exactly once, at materialization (r12 verdict
    // #2; q142's winnow_fps convention)
    assert(!plan.contains("md5"), plan)
    assert(!plan.contains("Generate explode"), plan)
  }

  test("q160 removal: reconciles with q144 row-for-row, posting subtree once") {
    // the audit acted on: every doc q144 reports must lose EXACTLY its
    // covered_tokens, every other doc passes through untouched, and
    // the rebuild is lossless (kept + removed = n_tokens)
    val cov = CorpusQueries.dupGramCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rem = CorpusQueries.exactSubstrRemoval(spark, sf).collect()
    assert(cov.nonEmpty && rem.length > cov.size)
    val removed = rem.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov.forall { case (id, c) => removed(id) == c },
      cov.collect { case (id, c) if removed(id) != c => (id, c, removed(id)) }.take(3).toString)
    assert(rem.filter(r => !cov.contains(r.getLong(0))).forall(_.getLong(2) == 0L))
    assert(rem.forall { r =>
      val kept = if (r.getString(3).isEmpty) 0 else r.getString(3).split(" ").length
      kept == r.getLong(1) - r.getLong(2)
    })
    // posting subtree ran ONCE (at the gramPostings checkpoints): the
    // per-position hash kernel and the gram explode are absent from
    // the final plan, and nothing pairwise appears anywhere
    val plan = finalPlan(CorpusQueries.exactSubstrRemoval(spark, sf))
    assert(!plan.contains("md5"), plan)
    assert(!plan.contains("Generate explode"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q145 shard audit: partitions the corpus exactly, no global order") {
    val rows = CorpusQueries.shardInterleave(spark, sf).collect()
    assert(rows.length == 16)
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total, "shards must partition the corpus")
    // every shard sees more than one source — the interleave property
    assert(rows.forall(_.getLong(3) > 1))
    // the scale argument for hash sharding: NO single-partition
    // window (a row_number over a global ORDER BY would plan one)
    val plan = finalPlan(CorpusQueries.shardInterleave(spark, sf))
    assert(!plan.contains("Window "), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q146 calibration: one keyed aggregate exchange, scale inverts absmax") {
    val rows = CorpusQueries.embedCalibration(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.forall { r =>
      math.abs(r.getDouble(5) * r.getDouble(4) - 127.0) < 1e-3
    })
    val plan = finalPlan(CorpusQueries.embedCalibration(spark, sf))
    // map-side combine onto 64 dims, then exactly one data exchange
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1, plan)
  }

  test("q147 int8 store: coarse probe reads ONLY the int8 codes, ¼ the bytes") {
    // the serving contract: after the one-time encode, the scoring
    // path scans the int8 table alone — the float corpus is neither
    // scanned nor materialized on the probe subtree
    val codes = CorpusQueries.buildInt8Store(spark, sf)
    val probe = CorpusQueries.int8Probe(spark, codes)
    val plan = finalPlan(probe)
    assert(plan.contains("g147_codes"), plan)
    assert(!plan.contains("embeddings"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the probe arithmetic is pure integer: the long fold kernel, no
    // float cosine anywhere on the coarse path
    assert(plan.contains("longvecfold"), plan)
    // the byte play the store exists for: tinyint codes ≈ ¼ of the
    // float corpus on disk
    val codeBytes = spark.table(codes).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    val embBytes = graft.Tables.load(spark, sf, "embeddings").inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    assert(codeBytes.toDouble / embBytes < 0.35,
      s"codes=$codeBytes emb=$embBytes")
    // end to end: shortlist re-rank recovers the float top-10 at this
    // fixture (the audit column the entry carries)
    val rows = CorpusQueries.int8StoredAnn(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getDouble(5) >= 0.9, s"recall=${rows.head.getDouble(5)}")
  }

  test("q148 curation: one flag pass, funnel rides observe, lossless sink") {
    // stage subtree: conjunctive flags over one corpus pass — winner
    // selection is CASE-inside-window, never a filtered self-join, so
    // no pair-shaped operator may appear
    val s3plan = finalPlan(CorpusQueries.curationStage3(spark, sf))
    assert(!s3plan.contains("CartesianProduct"), s3plan)
    // both stage windows are keyed (fp, cluster_id) — no
    // single-partition window anywhere in the funnel
    assert(!s3plan.contains("Exchange SinglePartition"), s3plan)
    // flags frame (post-checkpoint): the mixture stage costs one tiny
    // keyed aggregate + broadcasts; the quality/fingerprint kernels
    // ran exactly once, at materialization, so the hash kernel is
    // ABSENT here (q142/q144's convention — the r12-#2 double-compute
    // flaw cannot reappear)
    // the one per-source aggregate rode the perSrc materialization,
    // so the final plan moves NO corpus-keyed data at all: broadcasts
    // only (plus the 20-row totals' single-partition agg)
    val fplan = finalPlan(CorpusQueries.curationFlags(spark, sf))
    assert(!fplan.contains("md5"), fplan)
    assert(!fplan.contains("Exchange hashpartitioning"), fplan)
    assert(fplan.contains("BroadcastExchange"), fplan)
    // end to end: funnel monotone, the written store replays stage 4
    // exactly, and the layout is one dir per shard with sorted files
    val out = graft.TempDirs.scratch("graft_q148_spec") + "/store"
    val rows = CorpusQueries.curationRun(spark, sf, out).collect()
    assert(rows.length == 6)
    val n = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("0_ingest") >= n("1_quality") && n("1_quality") >= n("2_exact")
      && n("2_exact") >= n("3_canonical") && n("3_canonical") >= n("4_mixture"))
    assert(n("4_mixture") > 0, "mixture stage must keep someone")
    assert(n("5_written") == n("4_mixture"))
    assert(rows.find(_.getString(0) == "5_written").get.getLong(2) ==
      rows.find(_.getString(0) == "4_mixture").get.getLong(2))
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    val written = spark.read.parquet(out)
    assert(shardDirs.length == written.select("shard").distinct().count())
  }

  test("q54 features: decode rides whole-stage codegen, no object boundary") {
    // the SplitMixFeatures expression replaced the mapPartitions batch
    // stub (r13 verdict ask #1): the plan must carry NO
    // serialize/deserialize object boundary — at media-corpus scale
    // that boundary broke codegen and paid per-row serialization
    val plan = finalPlan(CorpusQueries.multimodalFeatures(spark, sf))
    assert(!plan.contains("SerializeFromObject")
      && !plan.contains("DeserializeToObject")
      && !plan.contains("MapPartitions"), plan)
  }

  test("q159 image decode: pure projection, no exchange beyond the sort") {
    val plan = finalPlan(CorpusQueries.imageMetaDecode(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SerializeFromObject"), plan)
  }

  test("q163 resize: pure projection, no exchange beyond the sort") {
    val plan = finalPlan(CorpusQueries.ppmResizeImages(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SerializeFromObject"), plan)
  }

  test("q164 PII scrub: plants found, nothing left after redaction, no UDF") {
    val rows = CorpusQueries.piiScrubCorpus(spark, sf).collect()
    assert(rows.nonEmpty)
    // every planted kind detected on its docs
    assert(rows.filter(_.getLong(0) % 3 == 0).forall(_.getLong(1) >= 1)) // email
    assert(rows.filter(_.getLong(0) % 3 == 1).forall(_.getLong(2) >= 1)) // phone
    assert(rows.filter(_.getLong(0) % 3 == 2).forall(r =>
      r.getLong(3) >= 1 && r.getLong(4) >= 1)) // ip + badge id
    // redaction is COMPLETE: re-running detection on the cleaned text
    // finds zero matches of any pattern, and the tokens are present
    rows.foreach { r =>
      val cleaned = r.getString(5)
      graft.functions.TextFns.piiPatterns.foreach { case (kind, p, _) =>
        assert(!p.r.findFirstIn(cleaned).isDefined,
          s"doc ${r.getLong(0)}: $kind survived redaction in: $cleaned")
      }
    }
    assert(rows.filter(_.getLong(0) % 3 == 0).forall(_.getString(5).contains("[EMAIL]")))
    // pure chained projection: no exchange, no object boundary
    val plan = finalPlan(CorpusQueries.piiScrubCorpus(spark, sf))
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SerializeFromObject") && !plan.contains("BatchEvalPython"), plan)
  }

  test("q166 drift reassign: the selective path is exercised BOTH ways") {
    // the scratch-equality oracle pin only has teeth when a majority
    // of vectors take the keep-assignment branch (an all-flagged
    // fixture would full-argmin everything on both sides and prove
    // nothing) — and it only demonstrates the trigger when at least
    // one cell actually drifts
    val rows = CorpusQueries.kmeansDriftReassign(spark, sf).collect()
    val flagged = rows.count(_.getInt(2) == 1)
    assert(flagged > 0, "no vector flagged — the drift trigger never fired")
    assert(flagged * 2 < rows.length,
      s"$flagged of ${rows.length} flagged — the keep-assignment branch " +
        "(the pin's teeth) is under-exercised; narrow the batch split")
  }

  test("loadSpread: parallelizes the tiny scan without changing content") {
    val plain = graft.Tables.load(spark, sf, "documents")
    val spread = CorpusQueries.loadSpread(spark, sf, "documents", "doc_id")
    // guard fires at this SF (single row group scan) ...
    assert(spread.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    // ... and the frame is the same multiset of rows
    assert(spread.count() === plain.count())
    assert(spread.exceptAll(plain).isEmpty && plain.exceptAll(spread).isEmpty)
  }
}
