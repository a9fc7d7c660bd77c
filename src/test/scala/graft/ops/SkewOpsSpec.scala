package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling pins: the salted-join rewrite must be result-
  * identical to the plain join on a pathologically hot key, and
  * AQE's runtime skew-join split must actually fire under the
  * session's configuration style (it is the default skew answer for
  * everything that doesn't use [[SkewOps.saltedJoin]]). */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 5000 of 5200 probe rows share key 1
  private lazy val probe = ((1 to 5000).map(i => (1L, i.toLong)) ++
    (1 to 200).map(i => ((i % 20 + 2).toLong, i.toLong)))
    .toDF("k", "pv")
  private lazy val build = (1 to 22).map(i => (i.toLong, s"b$i")).toDF("k", "bv")

  test("saltedJoin == plain join on a hot key (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "pv", "bv").orderBy("k", "pv").collect()
      val salted = SkewOps.saltedJoin(probe, build, Seq("k"), n = 8, joinType = jt)
        .select("k", "pv", "bv").orderBy("k", "pv").collect()
      assert(salted.length == plain.length, s"$jt: ${salted.length} vs ${plain.length}")
      salted.zip(plain).foreach { case (a, b) => assert(a == b, s"$jt: $a vs $b") }
    }
  }

  test("saltedJoin spreads the hot key over n salt buckets") {
    val saltCounts = probe.filter(col("k") === 1L)
      .withColumn("s", pmod(hash(probe.columns.map(col): _*), lit(8)))
      .groupBy("s").count().collect().map(_.getLong(1))
    // all 8 buckets populated, none carrying more than half the key
    assert(saltCounts.length == 8 && saltCounts.max < 2500, saltCounts.mkString(","))
  }

  test("saltedJoin edge cases: null keys, n=1, n > build cardinality") {
    // null probe keys must behave exactly like the plain join (dropped
    // by inner, null-extended by left) even though the salt hashes
    // over the null column; keys absent from the build side must
    // null-extend under left despite the build-side explosion
    val probeN = Seq((Some(1L), 1L), (None, 2L), (Some(99L), 3L), (None, 4L))
      .toDF("k", "pv")
    val buildSmall = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    for (jt <- Seq("inner", "left"); n <- Seq(1, 7)) {
      val plain = probeN.join(buildSmall, Seq("k"), jt)
        .select("k", "pv", "bv").orderBy("pv").collect()
      val salted = SkewOps.saltedJoin(probeN, buildSmall, Seq("k"), n, jt)
        .select("k", "pv", "bv").orderBy("pv").collect()
      assert(salted.length == plain.length, s"$jt n=$n: ${salted.length} vs ${plain.length}")
      salted.zip(plain).foreach { case (a, b) => assert(a == b, s"$jt n=$n: $a vs $b") }
    }
    // left_anti on a key missing from the build: survives salting
    val anti = SkewOps.saltedJoin(probeN, buildSmall, Seq("k"), 4, "left_anti")
      .select("pv").collect().map(_.getLong(0)).sorted
    assert(anti.toSeq == Seq(2L, 3L, 4L), anti.mkString(","))
  }

  test("saltedJoin rejects build-duplicating join types") {
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(probe, build, Seq("k"), 4, joinType = "full_outer")
    }
  }

  test("AQE skew-join split fires on a skewed shuffle join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2kb",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1b")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the query must END at the join: an aggregation above would
      // require the join's hash partitioning, and AQE (correctly)
      // refuses to split skewed partitions a parent still needs
      val df = probe.join(build, Seq("k"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        "AQE did not split the skewed join partition:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
