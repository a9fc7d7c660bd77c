package graft.tools

import graft.{LocalSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes the NEXT scale decade from an existing driver SF dir
  * (builder tooling, r16 verdict ask #7): the driver generates
  * sf0.001/0.01/0.1 only, so the ScaleAudit slope table tops out at
  * one measured decade. This tool replicates a source dir K× (default
  * 10 — one more decade) with entity-id offsets, matching how the
  * driver's own SFs scale (sf0.01→sf0.1 grows users 150→1500 and
  * rows 10×: MORE entities, not longer series).
  *
  * Replicas must not be mutual near-duplicates, or the dedup/pair
  * entries (q34 prefix-filtered Jaccard, q152 band compaction) would
  * see every document in 10 near-identical copies and their PAIR
  * OUTPUT would grow quadratically by construction — a fixture
  * artifact, not an engine property. Hence per-replica decorrelation:
  *  - documents: a per-replica SUBSTITUTION CIPHER over letters and
  *    digits (`translate`) — bijective, so within-replica similarity
  *    structure (token lengths, shingle equality/distinctness,
  *    fingerprints) is preserved EXACTLY while every character
  *    n-gram differs across replicas. A token-suffix scheme was
  *    measured insufficient here: q34 shingles on CHAR trigrams, and
  *    suffixed tokens share all interior trigrams, so each rare
  *    prefix shingle's posting list grew 10 deep and the candidate
  *    join went C(10,2)-quadratic — 2.26 s → 47 s at sf1, a pure
  *    fixture artifact the cipher eliminates;
  *  - embeddings: the vector is rotated by k positions (norms and
  *    pairwise within-replica geometry preserved; cross-replica
  *    cosine decorrelated);
  *  - events/lineitem: pure id offsets (the Quotes panel derives
  *    OHLCV arithmetically from (stock, day), so new stock ids ARE
  *    new series by construction).
  *
  * Usage: runMain graft.tools.SynthScale <srcDir> <outDir> [k]
  * outDir's basename must be `sf<number>` (ScaleAudit's contract),
  * e.g. /tmp/graft_scale/sf1.
  */
object SynthScale {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SynthScale <srcDir> <outDir> [k]")
    val (src, out) = (args(0), args(1))
    val k = if (args.length > 2) args(2).toInt else 10
    require(out.split('/').last.matches("sf[0-9.]+"),
      s"outDir basename must be sf<number>: $out")
    val spark = LocalSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synth(spark, src, out, k)
    spark.stop()
  }

  def synth(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    def replicate(t: DataFrame, per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => per(t, i)).reduce(_ unionAll _)

    // id spans from the source's own maxima: offsets never collide
    def span(t: DataFrame, c: String): Long =
      t.agg(max(col(c))).head().getLong(0) + 1

    val ev = Tables.load(spark, src, "events")
    val (uSpan, eSpan) = (span(ev, "user_id"), span(ev, "event_id"))
    replicate(ev, (t, i) => t
      .withColumn("user_id", col("user_id") + lit(i * uSpan))
      .withColumn("event_id", col("event_id") + lit(i * eSpan)))
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    // lineitem and orders share the orderkey space: replicate BOTH
    // with ONE span (max over both tables) or the lineitem⋈orders
    // entries would join only replica 0 — 90% dangling foreign keys
    // reading as spuriously sub-linear join slopes. Customers are
    // copied verbatim, so replicated orders fan their o_custkey onto
    // the same customer set (10x orders per customer — a valid shape)
    val li = Tables.load(spark, src, "lineitem")
    val ord = Tables.load(spark, src, "orders")
    val oSpan = math.max(span(li, "l_orderkey"), span(ord, "o_orderkey"))
    replicate(li, (t, i) => t
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * oSpan)))
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    replicate(ord, (t, i) => t
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * oSpan)))
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val docs = Tables.load(spark, src, "documents")
    val dSpan = span(docs, "doc_id")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    replicate(docs, (t, i) => {
      val txt =
        if (i == 0) col("text")
        else translate(col("text"), lower + upper + digits,
          rot(lower, i * 7) + rot(upper, i * 7) + rot(digits, i))
      t.withColumn("doc_id", col("doc_id") + lit(i * dSpan))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }).repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.load(spark, src, "embeddings")
    val vSpan = span(emb, "vec_id")
    replicate(emb, (t, i) => {
      val e = col("embedding")
      val rot =
        if (i == 0) e
        else concat(slice(e, lit(i + 1), size(e) - i), slice(e, lit(1), lit(i)))
      t.withColumn("vec_id", col("vec_id") + lit(i * vSpan))
        .withColumn("embedding", rot)
    }).repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // small dims copied verbatim (scale-invariant by design)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { name =>
        if (new java.io.File(s"$src/$name.parquet").exists())
          Tables.load(spark, src, name)
            .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }
    println(s"SYNTH done: $out = $k x $src")
  }
}
