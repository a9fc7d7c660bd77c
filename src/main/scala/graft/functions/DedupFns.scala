package graft.functions

import graft.expressions.SortedLongIntersectCount
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Deduplication operators for large-scale corpus curation (builder
  * brief): exact, MinHash+LSH, SimHash, n-gram Jaccard. All are
  * shuffle-on-bucket designs: candidate generation is a groupBy/join
  * on a bucket key, never an all-pairs cross join, so they scale to
  * 100 TB (bucket cardinality grows with the corpus, keeping
  * per-bucket work bounded).
  *
  * HOT-BUCKET GUARD: real corpora have pathological buckets — one
  * boilerplate shingle / band value shared by a large fraction of
  * documents — whose candidate pairs grow O(population²). Every pair
  * miner below takes a `maxBucket` population cap: buckets over the
  * cap are EXCLUDED from candidate generation, and the exclusion is
  * accounted, not silent — the query publishes observed metrics
  * (`Dataset.observe`: `<op>_hot_postings` = number of posting rows
  * excluded because their bucket is over the cap — i.e. excluded
  * VOLUME, not distinct buckets — and `<op>_max_bucket` = the largest
  * bucket population seen) that any `QueryExecutionListener` reads
  * per run. Because verification
  * re-checks exact similarity on every surviving candidate, capping
  * can only DROP candidates, never admit false pairs; a TRUE pair is
  * lost only if every bucket it shares is hot (boilerplate-only
  * overlap) — DedupSpec plants exactly that scenario and pins that
  * pairs sharing any rare feature keep recall 1.0. Defaults are far
  * above any non-adversarial population so the testdata oracles are
  * byte-identical with the guard armed.
  */
object DedupFns {

  /** Default bucket-population cap: 2^14 docs sharing one bucket is
    * already ~134M candidate pairs from that bucket alone. */
  val DefaultMaxBucket = 1 << 14

  /** Count-if helper for the observe metrics. */
  private def nOver(c: Column, cap: Int): Column =
    sum(when(c > cap, 1L).otherwise(0L))

  /** |A∩B| of two sorted long arrays via the codegen'd merge
    * expression [[graft.expressions.SortedLongIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cross-engine 60-bit hash: the first 15 hex chars of md5, parsed
    * base-16 — non-negative, fits a signed long, and reproducible in
    * any engine with md5 + hex parsing (DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). The minhash /
    * simhash kernels hash with THIS so the driver's DuckDB oracle can
    * replay them bit for bit; a deployment that doesn't need
    * cross-engine verification can swap in xxhash64 (~3× cheaper) —
    * the kernels are agnostic to the hash's distribution. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup: keep the lowest-id row per canonical fingerprint.
    * One hash aggregation; scale-free. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k permutation-hash minima over word shingles.
    * Permutations are (a·x + b) mod p over [[portableHash60]] of the
    * shingle — deterministic, no broadcast state, DuckDB-replayable.
    * Returns array<long> of size k.
    *
    * The base hashes appear ONCE in the expression tree (the k
    * permutations fold over the same evaluated array via a nested
    * transform), so each shingle is hashed once per row, not k
    * times — n + k·n cheap pmods instead of k·n string hashes. */
  /** p just above 2^32 and a < 1e9 keep h*a+b < 2^63: no overflow
    * under ANSI mode (Spark 4 default). */
  val minhashP = 4294967311L // smallest prime > 2^32

  /** Base shingle hashes for [[minhashSignatureFromHashes]]. Callers
    * should materialize this as its OWN column referenced by the k
    * permutations: HOF lambdas are interpreted (no codegen, no CSE),
    * so an inlined subtree would re-hash every shingle k times —
    * CollapseProject keeps a multiply-referenced expensive column in
    * its own projection, making this a one-pass computation. */
  def minhashBaseHashes(shingles: Column): Column =
    ColumnBridge.column(graft.expressions.Md5Hash60Array(
      ColumnBridge.expression(shingles), mod = minhashP))

  /** k permutation minima over pre-hashed shingles (cheap pmods). */
  def minhashSignatureFromHashes(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val sig = (0 until k).map { i =>
      val a = ((seed + 1) * 1299721L + i.toLong * 7919L) % 999999937L + 1L
      val b = (seed * 31L + i.toLong * 104729L) % minhashP
      array_min(transform(hashes, h => pmod(h * a + b, lit(minhashP))))
    }
    array(sig: _*)
  }

  /** MinHash signature in one expression (hashes inlined — prefer the
    * two-step column form in pipelines; see [[minhashBaseHashes]]). */
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column =
    minhashSignatureFromHashes(minhashBaseHashes(shingles), k, seed)

  /** LSH banding: split a k-sized signature into `bands` bands of
    * `rows` hashes and emit one (band_id, band_hash) bucket key per
    * band. Docs sharing any bucket are near-dup candidates. */
  def lshBuckets(docs: DataFrame, idCol: String, sigCol: String,
                 bands: Int, rows: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        portableHash60(concat_ws("_",
          slice(col(sigCol), b * rows + 1, rows).cast("array<string>"))).as("bucket"))
    }
    docs.select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Posting-list form of the MinHash-LSH index, the PERSISTED state
    * incremental near-dup keeps between batches: one (band, bucket,
    * id) row per band of each document's signature, with the hot-
    * bucket guard applied at BUILD time (a boilerplate bucket is
    * capped once, in the store, instead of re-capped by every probing
    * batch) and accounted through the usual `<prefix>_hot` observed
    * metrics. Stored bucketed by (band, bucket), an arriving batch's
    * postings probe it with a bucket-local join — the index side
    * never reshuffles (see CorpusQueries q135). */
  def lshPostings(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 2, k: Int = 12, bands: Int = 6,
                  seed: Long = 42L, maxBucket: Int = DefaultMaxBucket,
                  metricPrefix: String = "lshidx"): DataFrame = {
    val withSig = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", TextFns.wordShingles(col("text"), shingleN))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig",
        minhashSignatureFromHashes(minhashBaseHashes(col("shingles")), k, seed))
    val buckets = lshBuckets(withSig, "id", "sig", bands, k / bands)
    val pop = buckets.groupBy("band", "bucket").agg(count(lit(1)).as("bpop"))
    buckets.join(pop, Seq("band", "bucket"))
      .observe(s"${metricPrefix}_hot",
        nOver(col("bpop"), maxBucket).as(s"${metricPrefix}_hot_postings"),
        max(col("bpop")).as(s"${metricPrefix}_max_bucket"))
      .filter(col("bpop") <= maxBucket)
      .select(col("band"), col("bucket"), col("id"))
  }

  /** Sorted-distinct base-hash set per document — the exact-Jaccard
    * verification operand ([[sortedIntersectCount]] runs over it). */
  def packedHashSet(text: Column, shingleN: Int = 2): Column =
    array_sort(array_distinct(minhashBaseHashes(
      TextFns.wordShingles(text, shingleN))))

  /** MinHash-LSH candidate pairs: join docs through shared LSH
    * buckets, dedup pairs, verify with true Jaccard over shingles.
    * The join is bucket-keyed (no cross join); verification only
    * touches candidate pairs.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 12, bands: Int = 4,
                        minJaccard: Double = 0.5,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // hv is its own column, referenced k times by the signature and
    // once by the verifier — one string-hash pass per doc total
    val hashed = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("shingles", TextFns.wordShingles(col("text"), shingleN))
      .filter(size(col("shingles")) > 0)
      .withColumn("hv", minhashBaseHashes(col("shingles")))
    val withSig = hashed
      .withColumn("sig", minhashSignatureFromHashes(col("hv"), k))
    val buckets = lshBuckets(withSig, "doc_id", "sig", bands, k / bands)
    // hot-bucket guard: population per (band, bucket) — one narrow
    // map-side-combined aggregation on the SAME key the candidate
    // join shuffles on; over-cap buckets are excluded and accounted
    val pop = buckets.groupBy("band", "bucket").agg(count(lit(1)).as("bpop"))
    val capped = buckets.join(pop, Seq("band", "bucket"))
    val a = capped.observe("minhash_hot",
        nOver(col("bpop"), maxBucket).as("minhash_hot_postings"),
        max(col("bpop")).as("minhash_max_bucket"))
      .filter(col("bpop") <= maxBucket).as("a")
    val b = capped.filter(col("bpop") <= maxBucket).as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // verify on the packed mod-p longs with the codegen'd sorted-
    // merge intersect (same value as jaccard over distinct arrays)
    val sh = hashed.select(col("doc_id"),
      array_sort(array_distinct(col("hv"))).as("shp"))
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("shp").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shp").as("sh_b")), Seq("id_b"))
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** EXACT Jaccard-similar pair mining via AllPairs prefix filtering
    * (Bayardo et al., WWW'07 — public algorithm): if J(A,B) ≥ t, A
    * and B must share a shingle within the first |X|−⌈t·|X|⌉+1
    * shingles of each, under ANY shared total order. Ordering by
    * ascending document frequency pushes the hottest shingles out of
    * every prefix, so posting lists stay short — this replaces the
    * quadratic all-shingle inverted index with one that only indexes
    * rare prefix shingles, with NO false negatives (unlike LSH).
    *
    * Scale: df aggregation + one windowed rank per doc + a bucket-
    * keyed join on (block, prefix shingle) — every stage is keyed on
    * high-cardinality columns; per-shingle fan-out is bounded by the
    * prefix property rather than data luck. */
  def jaccardPrefixPairs(docs: DataFrame, idCol: String, blockCol: String,
                         shinglesCol: String, threshold: Double,
                         maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val d = docs
      .withColumn("n_sh", size(col(shinglesCol)))
      .filter(col("n_sh") > 0)
    val posting = d.select(col(idCol), col(blockCol), col("n_sh"),
      explode(col(shinglesCol)).as("shingle"))
    val dfreq = posting.groupBy(col(blockCol), col("shingle"))
      .agg(count(lit(1)).as("dfreq"))
    val prefix = posting.join(dfreq, Seq(blockCol, "shingle"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(idCol).orderBy("dfreq", "shingle")))
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * lit(threshold)) + lit(1))
    // hot-shingle guard: rk is computed over the FULL shingle order
    // (prefix semantics unchanged); only the candidate join skips
    // postings whose shingle's document frequency exceeds the cap.
    // The ascending-dfreq prefix order already pushes hot shingles
    // out of most prefixes — the cap bounds the residue where a hot
    // shingle IS the prefix (near-boilerplate documents). Accounted
    // via observed metrics on the probe side.
    val aSide = prefix.observe("jaccard_hot",
      nOver(col("dfreq"), maxBucket).as("jaccard_hot_postings"),
      max(col("dfreq")).as("jaccard_max_bucket"))
      .filter(col("dfreq") <= maxBucket)
    val a = aSide.as("a")
    val b = prefix.filter(col("dfreq") <= maxBucket).as("b")
    // PPJoin positional filter: a shared prefix token at positions
    // (rk_a, rk_b) bounds the overlap by min(remaining)+1; J >= t
    // needs overlap >= t/(1+t)*(|A|+|B|). Valid for the FIRST shared
    // token of a pair; keeping a pair if ANY of its shared tokens
    // passes only admits extras, never prunes a true pair.
    val needed = (col("a.n_sh") + col("b.n_sh")) * lit(threshold / (1.0 + threshold))
    val cand = a.join(b,
        col(s"a.$blockCol") === col(s"b.$blockCol")
          && col("a.shingle") === col("b.shingle")
          && col(s"a.$idCol") < col(s"b.$idCol")
          && (least(col("a.n_sh") - col("a.rk"), col("b.n_sh") - col("b.rk"))
            + lit(1) >= needed - lit(1e-9)))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      // candidate rows are two longs but the verify below does an
      // array-intersect per row: AQE coalesces the distinct's output
      // by BYTES (to 1 partition at small SF, event-log profiled) and
      // serializes that compute. An explicit repartition is exempt
      // from AQE coalescing and pins verify parallelism; the extra
      // shuffle moves only the narrow pair set.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id_a"))
    // verify with the codegen'd sorted-merge intersect count
    val sh = d.select(col(idCol), array_sort(col(shinglesCol)).as("shs"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("shs").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shs").as("sh_b")), Seq("id_b"))
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jac_raw",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jac_raw") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac_raw"))
  }

  /** EXACT hamming-≤-h pair mining via pigeonhole banding: split the
    * 64-bit simhash into h+1 bands — two hashes within hamming h
    * cannot differ in every band, so candidates = pairs sharing any
    * (band, value) bucket. No false negatives; the all-pairs self-
    * join becomes a bucket-keyed equi-join. */
  def simhashBandedPairs(docs: DataFrame, idCol: String, blockCol: String,
                         hashCol: String, maxHamming: Int,
                         maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val rem = 64 % nBands
    val widths = Seq.fill(rem)(base + 1) ++ Seq.fill(nBands - rem)(base)
    val offsets = widths.scanLeft(0)(_ + _).init
    val bandCols = widths.zip(offsets).zipWithIndex.map { case ((w, off), i) =>
      struct(lit(i).as("band"),
        shiftright(col(hashCol), off).bitwiseAND(lit((1L << w) - 1)).as("bval"))
    }
    val banded = docs
      .select(col(idCol), col(blockCol), col(hashCol),
        explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col(blockCol), col(hashCol),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    // hot-bucket guard (accounted, as in the minhash miner). The
    // pre-guard version deduped pairs with a first-matching-band
    // bitwise trick instead of distinct(); under a cap that trick
    // would DROP a pair whose first match is a hot bucket even when
    // a cold band also matches it, so dedup is a distinct() over the
    // narrow candidate pairs — a pair survives iff ANY shared bucket
    // is cold, which is the guard's recall contract. Considered and
    // rejected (round-10 advice): a cap-aware first-match ("first
    // COLD matching band") needs each candidate row to know the
    // hotness of its pair's EARLIER bands, i.e. a per-doc hot-band
    // mask — one extra groupBy(doc) shuffle over all (h+1)·n banded
    // rows plus joins into both pair sides, to save one distinct()
    // over the surviving pairs, a set the verification joins shuffle
    // anyway and that the caps keep bounded. The distinct() is the
    // cheaper shape at every corpus profile we can construct.
    val pop = banded.groupBy(blockCol, "band", "bval").agg(count(lit(1)).as("bpop"))
    val capped = banded.join(pop, Seq(blockCol, "band", "bval"))
    val a = capped.observe("simhash_hot",
        nOver(col("bpop"), maxBucket).as("simhash_hot_postings"),
        max(col("bpop")).as("simhash_max_bucket"))
      .filter(col("bpop") <= maxBucket).as("a")
    val b = capped.filter(col("bpop") <= maxBucket).as("b")
    a.join(b,
        col(s"a.$blockCol") === col(s"b.$blockCol")
          && col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        hamming(col(s"a.$hashCol"), col(s"b.$hashCol")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Token hashes for [[simhash64FromHashes]] — materialize as a
    * column so the 64 bit-votes share one tokenize+hash pass (same
    * multi-reference rationale as [[minhashBaseHashes]]). Hashed with
    * [[portableHash60]]: bits 60-63 of the resulting simhash are
    * always 0 (every token votes −1 there), which costs 4 of 64
    * discrimination bits but makes the whole pipeline replayable in
    * the DuckDB oracle. */
  def simhashTokenHashes(text: Column): Column =
    ColumnBridge.column(graft.expressions.Md5Hash60Array(
      ColumnBridge.expression(TextFns.tokens(text))))

  /** 64-bit SimHash: per-bit majority vote over pre-hashed tokens —
    * the native one-pass codegen kernel
    * [[graft.expressions.SimHash64]] (the HOF formulation re-scans
    * the array once per bit, 64 interpreted passes per doc). */
  def simhash64FromHashes(hashes: Column): Column =
    ColumnBridge.column(graft.expressions.SimHash64(
      ColumnBridge.expression(hashes)))

  /** SimHash in one expression (token hashing inlined 64× — prefer
    * the two-step column form in pipelines). */
  def simhash64(text: Column): Column =
    simhash64FromHashes(simhashTokenHashes(text))

  /** Hamming distance between two simhashes (Spark 3.5+: bit_count). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs via OR-amplified
    * hyperplane LSH: `tables` independent nBits-bucket tables (one
    * exploded row per table), candidates = pairs sharing a bucket in
    * ANY table, verified with exact cosine. nBits controls per-bucket
    * size (2^nBits buckets per table, so per-bucket population is
    * n/2^nBits and shrinks as nBits grows); `tables` buys back the
    * recall that narrow buckets cost. Approximate by design — the
    * exact baseline is the brute-force cosine top-k (q35). */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nBits: Int = 12, tables: Int = 3,
                        minCos: Double = 0.95, seed: Long = 42L): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"),
      VectorFns.asDouble(col(vecCol)).as("v"))
    val tableCols = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        VectorFns.hyperplaneBucket(col("v"), dim, nBits, seed + 1000L * t).as("bucket"))
    }
    val bucketed = v
      .select(col("vec_id"), col("v"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket")
        && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        VectorFns.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
