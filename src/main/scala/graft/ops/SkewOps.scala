package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed shuffles (SURVEY §2.3 J12; the brief's
  * "salting for skew" technique as a first-class operator).
  *
  * Two complementary mechanisms cover the skewed-join space:
  *  - AQE's skew-join split handles SHUFFLE-SIZE skew at runtime
  *    with no code change (post-shuffle partitions over the
  *    threshold are split and the other side's matching partition
  *    replicated) — pinned working in SkewOpsSpec so the config
  *    path can't silently rot;
  *  - [[saltedJoin]] handles the engineered case AQE cannot: ONE
  *    join key so hot that even a split partition's build rows
  *    must be replicated to many tasks up front (the classic
  *    salt-and-explode rewrite).
  */
object SkewOps {

  /** Skew-safe equi-join: the PROBE (large, skewed) side gets a
    * deterministic salt in [0, n) hashed from its whole row; the
    * BUILD side is exploded n ways so every (key, salt) bucket can
    * match. A hot probe key's rows then spread over n tasks instead
    * of one. Join type is restricted to the probe-preserving kinds —
    * build-side rows are replicated n×, so right/full/ right-semi
    * variants would produce duplicates.
    *
    * Deterministic by construction (hash of the probe row, not
    * rand()): task retries and speculative attempts reproduce the
    * same salt, which non-deterministic salting does not guarantee.
    * Exact duplicate probe rows share a salt — acceptable, they are
    * indistinguishable anyway.
    *
    * Cost model: build side bytes ×n (choose n ≈ the hot key's
    * multiple of a healthy partition), probe side unchanged.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 n: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin replicates the build side; '$joinType' would duplicate rows")
    val saltCol = "__graft_salt"
    val probeCols: Seq[Column] = probe.columns.map(col).toSeq
    val salted = probe.withColumn(saltCol, pmod(hash(probeCols: _*), lit(n)))
    val exploded = build.withColumn(saltCol,
      explode(array((0 until n).map(i => lit(i)): _*)))
    salted.join(exploded, keys :+ saltCol, joinType).drop(saltCol)
  }
}
