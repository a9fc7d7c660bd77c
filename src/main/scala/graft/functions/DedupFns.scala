package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation (builder
  * brief): exact, MinHash+LSH, SimHash, n-gram Jaccard. All are
  * shuffle-on-bucket designs: candidate generation is a groupBy/join
  * on a bucket key, never an all-pairs cross join, so they scale to
  * 100 TB (bucket cardinality grows with the corpus, keeping
  * per-bucket work bounded).
  */
object DedupFns {

  /** Exact dedup: keep the lowest-id row per canonical fingerprint.
    * One hash aggregation; scale-free. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k permutation-hash minima over word shingles.
    * Permutations are (a·x + b) mod p over xxhash64 of the shingle —
    * deterministic, no broadcast state. Returns array<long> of size k. */
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column = {
    // p just above 2^32 and a < 1e9 keep h*a+b < 2^63: no overflow
    // under ANSI mode (Spark 4 default).
    val p = 4294967311L // smallest prime > 2^32
    val hashes = transform(shingles, sh => abs(xxhash64(sh)) % p)
    val sig = (0 until k).map { i =>
      val a = ((seed + 1) * 1299721L + i.toLong * 7919L) % 999999937L + 1L
      val b = (seed * 31L + i.toLong * 104729L) % p
      array_min(transform(hashes, h => pmod(h * a + b, lit(p))))
    }
    array(sig: _*)
  }

  /** LSH banding: split a k-sized signature into `bands` bands of
    * `rows` hashes and emit one (band_id, band_hash) bucket key per
    * band. Docs sharing any bucket are near-dup candidates. */
  def lshBuckets(docs: DataFrame, idCol: String, sigCol: String,
                 bands: Int, rows: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws("_",
          slice(col(sigCol), b * rows + 1, rows).cast("array<string>"))).as("bucket"))
    }
    docs.select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** MinHash-LSH candidate pairs: join docs through shared LSH
    * buckets, dedup pairs, verify with true Jaccard over shingles.
    * The join is bucket-keyed (no cross join); verification only
    * touches candidate pairs.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 12, bands: Int = 4,
                        minJaccard: Double = 0.5): DataFrame = {
    val withSig = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("shingles", TextFns.wordShingles(col("text"), shingleN))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), k))
    val buckets = lshBuckets(withSig, "doc_id", "sig", bands, k / bands)
    val a = buckets.as("a"); val b = buckets.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sh = withSig.select(col("doc_id"), col("shingles"))
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", TextFns.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * hashes (xxhash64). Codegen-friendly: 64 HOF folds over the token
    * array. Near-dups share buckets on high-bit prefixes or differ in
    * few bits (hamming distance via bit_count(xor)). */
  def simhash64(text: Column): Column = {
    val toks = TextFns.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two simhashes (Spark 3.5+: bit_count). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: candidate
    * pairs must share a random-hyperplane bucket, then are verified
    * with exact cosine. Brute-force all-pairs is avoided by design. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nBits: Int = 12, minCos: Double = 0.95,
                        seed: Long = 42L): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"),
        VectorFns.asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", VectorFns.hyperplaneBucket(col("v"), dim, nBits, seed))
    val a = v.as("a"); val b = v.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", VectorFns.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= minCos)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
