package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness proofs for the dedup kernels: the prefix-filtered
  * Jaccard miner and the banded simhash miner must reproduce their
  * brute-force equivalents EXACTLY (no false negatives — that is the
  * design claim that lets q34 keep a DuckDB oracle). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-corpus: 40 docs in 2 blocks, with planted
  // near-duplicates (shared long prefixes) and unrelated noise
  private lazy val docs = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (0 until 40).map { i =>
      val block = s"src${i % 2}"
      val text =
        if (i % 10 == 3) base + s" tail$i"                  // near-dups of each other
        else if (i % 10 == 7) base.toUpperCase + s" T$i"    // second dup family
        else s"document $i carries words w${i}a w${i * 7 % 13}b w${i * 31 % 17}c unique"
      (i.toLong, block, text)
    }
    rows.toDF("doc_id", "source", "text")
  }

  private lazy val shingled = docs.select(col("doc_id"), col("source"),
    TextFns.charShinglesPacked(col("text")).as("sh"))

  private def bruteJaccard(t: Double): Set[(Long, Long)] = {
    val d = shingled.filter(size(col("sh")) > 0)
    val a = d.as("a"); val b = d.as("b")
    a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("j", col("inter") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("j") >= t)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("jaccardPrefixPairs == brute force at t=0.5 (exactness)") {
    val got = DedupFns.jaccardPrefixPairs(shingled, "doc_id", "source", "sh", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteJaccard(0.5))
    assert(got.nonEmpty) // the planted families must surface
  }

  test("jaccardPrefixPairs == brute force at t=0.8") {
    val got = DedupFns.jaccardPrefixPairs(shingled, "doc_id", "source", "sh", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteJaccard(0.8))
  }

  // exactness across band layouts: h=8 is the production threshold
  // (9 bands × ~7 bits; q37), h=16 exercises the uneven-width split
  for (h <- Seq(8, 16))
  test(s"simhashBandedPairs == brute force hamming<=$h (pigeonhole)") {
    val d = docs.select(col("doc_id"), col("source"),
      DedupFns.simhash64(col("text")).as("sh"))
    val a = d.as("a"); val b = d.as("b")
    val brute = a.join(b,
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        DedupFns.hamming(col("a.sh"), col("b.sh")).as("h"))
      .filter(col("h") <= h)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("h"))).toSet
    val got = DedupFns.simhashBandedPairs(d, "doc_id", "source", "sh", h)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("minhash LSH candidates find the planted dup families") {
    val got = DedupFns.minhashCandidates(docs, "doc_id", "text",
        shingleN = 2, k = 12, bands = 6, minJaccard = 0.2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the i%10==3 family shares almost all word bigrams
    assert(got.contains((3L, 13L)) && got.contains((13L, 23L)))
    // unrelated noise docs must not pair
    assert(!got.exists { case (x, y) => x % 10 != y % 10 })
  }

  test("native Md5Hash60Array == per-element portableHash60 Column, bitwise") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map(_ =>
      Seq.fill(rnd.nextInt(30))(rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString)
    ) :+ Seq.empty[String]
    val df = rows.toDF("a")
    for (mod <- Seq(0L, DedupFns.minhashP)) {
      val native = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.Md5Hash60Array(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("a")), mod))
      val hof =
        if (mod > 0) transform(col("a"), x => DedupFns.portableHash60(x) % mod)
        else transform(col("a"), x => DedupFns.portableHash60(x))
      df.select(native.as("n"), hof.as("h")).collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      }
    }
  }

  test("native CharShingles3 == HOF split/zip/distinct formulation, bitwise") {
    // the spec corpus, the REAL documents table, and unicode edges
    // (CJK, accents, an astral emoji — exercises the ascii()/charAt
    // first-code-unit convention) must agree element for element,
    // ORDER INCLUDED (array_distinct keeps first occurrence)
    val uni = Seq("中文测试一二三", "héllo wörld", "😀😃😄x", "ab", "", "aaaa",
      "the same the same the same").toDF("text")
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    for (df <- Seq(docs.select(col("text")), uni, real)) {
      df.select(TextFns.charShinglesPacked(col("text")).as("n"),
          TextFns.charShinglesPackedHof(col("text")).as("h"))
        .collect().foreach { r =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"native=${r.getSeq[Long](0).take(8)} hof=${r.getSeq[Long](1).take(8)}")
        }
    }
  }

  test("native SimHash64 == per-bit HOF majority vote, bitwise") {
    // the HOF formulation the native kernel replaced — kept here as
    // the executable spec of the semantics
    def hofSimhash(hashes: org.apache.spark.sql.Column) = {
      val bits = (0 until 64).map { b =>
        val vote = aggregate(hashes, lit(0),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1).otherwise(-1))
        when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }
      bits.reduce(_ bitwiseOR _)
    }
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      Seq.fill(rnd.nextInt(40))(rnd.nextLong())
    } :+ Seq.empty[Long] // empty array → 0 on both paths
    val df = rows.toDF("h")
    val got = df.select(
        DedupFns.simhash64FromHashes(col("h")).as("native"),
        hofSimhash(col("h")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  // ---- hot-bucket guard: planted pathological buckets ----
  // The guard's recall contract: capping a hot bucket can only drop
  // CANDIDATES (verification re-checks every survivor), and a true
  // pair is lost only if every bucket it shares is hot. Each planted
  // scenario has a boilerplate feature shared by many non-duplicate
  // docs (the hot bucket) plus true pairs that also share rare
  // features — capped output must equal uncapped output, with the
  // exclusion visible in the observed metrics.

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

  // observed metrics live on the queryExecution that RAN — read them
  // from the same Dataset pairSet collected, after the action
  private def observed(df: org.apache.spark.sql.DataFrame, name: String) =
    df.queryExecution.observedMetrics(name)

  test("jaccard hot-shingle cap: bounded candidates, planted recall 1.0") {
    // THE pathological AllPairs case: ascending-dfreq prefix ordering
    // already pushes a hot shingle out of rich documents' prefixes,
    // so the pile is boilerplate-DOMINATED docs (2 shingles) where
    // the hot shingle unavoidably sits inside the prefix — 120 docs
    // sharing shingle 0L (pairwise jaccard 1/3 < 0.5: all-false
    // candidates, O(n²) of them uncapped). 3 planted near-dup pairs
    // share 7 RARE shingles (jaccard 8/10 = 0.8) and survive via
    // their rare prefixes.
    val rows = (0 until 120).map { i =>
      (i.toLong, "blk", Seq(0L, 5000L + i))
    } ++ (0 until 3).flatMap { p =>
      val shared = (1 to 7).map(j => 900000L + p * 10L + j)
      Seq((200L + p * 2, "blk", Seq(0L) ++ shared ++ Seq(777000L + p)),
          (201L + p * 2, "blk", Seq(0L) ++ shared ++ Seq(888000L + p)))
    }
    val df = rows.toDF("doc_id", "source", "sh")
    // the plant IS hot: shingle 0 appears in all 126 docs
    val hot = df.select(explode(col("sh")).as("s")).groupBy("s").count()
      .filter(col("count") > 50).collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(0L))
    val capped = DedupFns.jaccardPrefixPairs(df, "doc_id", "source", "sh",
      threshold = 0.5, maxBucket = 50)
    val cappedPairs = pairSet(capped)
    val uncapped = pairSet(DedupFns.jaccardPrefixPairs(df, "doc_id", "source", "sh",
      threshold = 0.5, maxBucket = Int.MaxValue))
    val planted = Set((200L, 201L), (202L, 203L), (204L, 205L))
    assert(cappedPairs == uncapped, "cap dropped a true pair")
    assert(planted.subsetOf(cappedPairs), s"recall < 1.0: $cappedPairs")
    val m = observed(capped, "jaccard_hot")
    assert(m.getAs[Long]("jaccard_hot_postings") > 0)
    assert(m.getAs[Long]("jaccard_max_bucket") == 126L)
  }

  test("minhash hot-bucket cap: boilerplate pile excluded, planted recall 1.0") {
    // 30 docs: 40-word boilerplate + 1 unique word (pairwise jaccard
    // ~0.95 < the 0.99 threshold -> ALL pile pairs are false
    // candidates, but their signatures collide -> hot band buckets);
    // 3 planted IDENTICAL pairs (jaccard 1.0, tiny buckets)
    val boiler = (1 to 40).map(j => s"w$j").mkString(" ")
    val rows = (0 until 30).map(i => (i.toLong, s"$boiler extra$i")) ++
      (0 until 3).flatMap(p => Seq(
        (100L + p * 2, s"pair $p zig zag alpha beta gamma delta"),
        (101L + p * 2, s"pair $p zig zag alpha beta gamma delta")))
    val df = rows.toDF("doc_id", "text")
    val capped = DedupFns.minhashCandidates(df, "doc_id", "text",
      shingleN = 2, k = 12, bands = 6, minJaccard = 0.99, maxBucket = 8)
    val cappedPairs = pairSet(capped)
    val uncapped = pairSet(DedupFns.minhashCandidates(df, "doc_id", "text",
      shingleN = 2, k = 12, bands = 6, minJaccard = 0.99, maxBucket = Int.MaxValue))
    val planted = Set((100L, 101L), (102L, 103L), (104L, 105L))
    assert(cappedPairs == uncapped, "cap dropped a true pair")
    assert(planted.subsetOf(cappedPairs), s"recall < 1.0: $cappedPairs")
    val m = observed(capped, "minhash_hot")
    assert(m.getAs[Long]("minhash_hot_postings") > 0,
      s"plant failed to create a hot bucket (max=${m.getAs[Long]("minhash_max_bucket")})")
  }

  test("simhash hot-bucket cap: shared band excluded, planted recall 1.0") {
    // synthetic 64-bit hashes, maxHamming=3 -> 4 bands of 16 bits.
    // Pile: 30 hashes sharing band 0 (low 16 bits = 0) but pairwise
    // far apart in the upper 48 bits (splitmix-spread -> hamming >> 3:
    // false candidates in a pop-30 bucket). Planted: 3 identical
    // pairs with unique band values (pop-2 buckets).
    def spread(i: Int): Long = {
      var z = 0x9E3779B97F4A7C15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      (z | 0x8000000000000000L) & ~0xFFFFL | 0L // clear low 16 bits
    }
    val rows = (0 until 30).map(i => (i.toLong, "blk", spread(i))) ++
      (0 until 3).flatMap(p => Seq(
        (100L + p * 2, "blk", 0x1234L + p),
        (101L + p * 2, "blk", 0x1234L + p)))
    val df = rows.toDF("doc_id", "source", "h")
    // sanity: the pile really is pairwise-far
    val hs = (0 until 30).map(spread)
    for (x <- hs; y <- hs if x != y)
      assert(java.lang.Long.bitCount(x ^ y) > 3)
    val capped = DedupFns.simhashBandedPairs(df, "doc_id", "source", "h",
      maxHamming = 3, maxBucket = 8)
    val cappedPairs = pairSet(capped)
    val uncapped = pairSet(DedupFns.simhashBandedPairs(df, "doc_id", "source", "h",
      maxHamming = 3, maxBucket = Int.MaxValue))
    val planted = Set((100L, 101L), (102L, 103L), (104L, 105L))
    assert(cappedPairs == uncapped, "cap dropped a true pair")
    assert(planted.subsetOf(cappedPairs), s"recall < 1.0: $cappedPairs")
    val m = observed(capped, "simhash_hot")
    assert(m.getAs[Long]("simhash_max_bucket") >= 30L)
  }

  test("lshPostings build-time cap: hot buckets excluded from the stored index") {
    // the q135/q139 persisted-index form of the minhash guard: a
    // boilerplate pile whose signatures collide into hot band buckets
    // must be dropped AT BUILD TIME (a stored hot posting list would
    // be re-joined by every future batch), accounted via the
    // lshidx_hot metrics; distinct documents keep their (pop-2)
    // postings so the index still finds real near-dups.
    val boiler = (1 to 40).map(j => s"w$j").mkString(" ")
    val rows = (0 until 30).map(i => (i.toLong, s"$boiler extra$i")) ++
      (0 until 3).flatMap(p => Seq(
        (100L + p * 2, s"pair $p zig zag alpha beta gamma delta"),
        (101L + p * 2, s"pair $p zig zag alpha beta gamma delta")))
    val df = rows.toDF("doc_id", "text")
    val capped = DedupFns.lshPostings(df, "doc_id", "text", maxBucket = 8)
    val posts = capped.collect()
    val m = observed(capped, "lshidx_hot")
    assert(m.getAs[Long]("lshidx_hot_postings") > 0,
      s"plant failed to create a hot bucket (max=${m.getAs[Long]("lshidx_max_bucket")})")
    assert(m.getAs[Long]("lshidx_max_bucket") > 8L)
    // no stored bucket exceeds the cap
    val pops = posts.groupBy(r => (r.getAs[Int]("band"), r.getAs[Long]("bucket")))
      .view.mapValues(_.size)
    assert(pops.nonEmpty && pops.values.max <= 8, s"hot bucket stored: $pops")
    // planted near-dup docs keep their postings (searchable)
    val ids = posts.map(_.getAs[Long]("id")).toSet
    assert((0 until 3).forall(p => ids(100L + p * 2) && ids(101L + p * 2)))
  }

  test("exactDedup keeps min id per fingerprint") {
    val dups = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = DedupFns.exactDedup(dups, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L))) // (keep_id, n_copies)
  }
}
