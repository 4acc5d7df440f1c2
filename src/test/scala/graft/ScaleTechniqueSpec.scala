package graft

import graft.operators.{DedupOps, SkewOps}
import org.apache.spark.sql.functions._

/** Cluster-scale join techniques, demonstrated and guarded: bucketed
  * co-located joins (no exchange at all) and salted joins for hot keys
  * (equivalence with the plain join).
  */
class ScaleTechniqueSpec extends SparkSpec {

  test("undersized bloom degrades to pruning less, never to wrong rows") {
    // no-false-negative law: however small the filter, the exact
    // semi-join behind it must still see every true match — verified by
    // probing a 64-bit bloom (saturated, ~everything passes) against
    // the full key set
    val keys = Tables.part(spark, sf("sf0.001"))
      .filter(col("p_size") <= 5).select("p_partkey")
    val bloom = keys.agg(graft.functions.BloomExprs
      .bloomAgg(xxhash64(col("p_partkey")), 4L, 64L).as("bf"))
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val candidates = li.filter(graft.functions.BloomExprs
      .mightContain(bloom, xxhash64(col("l_partkey"))))
    val exactThroughBloom = candidates
      .join(keys, col("l_partkey") === col("p_partkey"), "left_semi").count()
    val plain = li
      .join(keys, col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(exactThroughBloom == plain)
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val o = Tables.orders(spark, sf("sf0.001"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick a shuffle-or-bucket plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
             "bucketed scan should satisfy the join distribution — no shuffle")
      // and the same rows as the plain parquet join
      assert(j.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("date-partitioned cold store prunes partitions on time filters") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    // the 100 TB cold-store layout: events partitioned by event date
    // (the hypertable-chunking analog, SURVEY §4 partition-pruning row)
    Tables.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val filtered = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
           "date predicate must prune directories, not filter rows")
    // pruned read equals the full-scan filter
    val full = Tables.events(spark, sf("sf0.001"))
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(filtered.count() == full && full > 0)
  }

  test("ssjoin prefix index is complete AND smaller than full postings") {
    val dir = sf("sf0.001")
    val cands = DedupOps.ssjoinPrefixCandidates(spark, dir)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val results = DedupOps.ssjoinPrefix(spark, dir)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // completeness: every true pair came through the candidate set
    // (the oracle hash-match proves results == exact truth)
    assert(results.nonEmpty && results.subsetOf(cands))
    // pruning: the prefix index expands far fewer pair slots than the
    // full posting index (Σ C(df,2) over all shingles)
    val fullSlots = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextExprs.wordShingles(col("text"), 3))
        .as("s"))
      .groupBy("s").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0)
    assert(cands.size < fullSlots / 2,
      s"prefix candidates ${cands.size} vs full posting slots $fullSlots")
  }

  test("salted join equals the plain join on a hot-key fixture") {
    val session = spark
    import session.implicits._
    // 10k rows of one hot key + a long tail, joined to a 100-row dim
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => (i.toLong % 100 + 2, i.toLong)))
      .toDF("k", "payload")
    val right = (1 to 100).map(i => (i.toLong, s"dim_$i")).toDF("rk", "name")

    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val salted = SkewOps
      .saltedJoin(left, right, col("k"), col("rk"), col("payload"), 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(plain == salted)
    assert(salted.count(_._1 == 1L) == 10000)
  }

  test("AQE skew-join splits the hot bucket in the LSH verification join shape") {
    val session = spark
    import session.implicits._
    // the dedupMinhashLsh verification join in miniature: candidate pairs
    // joined back to per-doc payloads, with one pathologically hot doc —
    // the skew a boilerplate cluster produces at corpus scale. AQE's
    // skew-join splits the oversized partition at runtime; this pins the
    // behavior (and the thresholds that trigger it) so the scale path
    // stays exercised.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down thresholds so a test-sized hot key trips the same
      // machinery a 256MB-default cluster partition would
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hot = (1 to 20000).map(i => (1L, 100000L + i))
      val tail = (1 to 2000).map(i => (i.toLong + 1, 200000L + i))
      val cand = (hot ++ tail).toDF("doc1", "doc2").repartition(8)
      val payload = (1L to 2001L).map(d => (d, "s" * 64)).toDF("doc_id", "payload")
      val j = cand.join(payload, cand("doc1") === payload("doc_id"))
      // collect() executes THIS QueryExecution, so AQE finalizes the
      // plan we inspect (count() would plan its own execution)
      assert(j.collect().length == 22000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
             s"expected a skew-split join in:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pointer-jumping contracts an adversarial path graph in O(log n) rounds") {
    val session = spark
    import session.implicits._
    // a 512-node PATH is the worst case for min-label propagation
    // (needs ~n rounds); large-star/small-star must do it in ~log2(n).
    // Shuffle node ids so the path order ≠ id order (truly adversarial).
    val n = 512
    val ids = new scala.util.Random(42).shuffle((0L until n.toLong).toVector)
    val pathEdges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc1", "doc2")
    // plus a disjoint triangle and two isolated-pair components
    val extra = Seq((1000L, 1001L), (1001L, 1002L), (1002L, 1000L),
                    (2000L, 2001L), (3000L, 3001L)).toDF("doc1", "doc2")
    val (labels, rounds) =
      graft.operators.DedupOps.starContractLabels(pathEdges.union(extra))
    assert(rounds <= 12, s"path of $n nodes took $rounds rounds (want ~log2)")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n + 7)
    (0L until n.toLong).foreach(d => assert(got(d) == 0L, s"node $d"))
    Seq(1000L, 1001L, 1002L).foreach(d => assert(got(d) == 1000L))
    assert(got(2000L) == 2000L && got(2001L) == 2000L)
    assert(got(3000L) == 3000L && got(3001L) == 3000L)
    labels.unpersist()
  }

  test("minhash k/bands are session-tunable; s-curve explains production k=128") {
    import graft.operators.DedupOps
    // analytic s-curve 1-(1-s^r)^b at the 0.5 Jaccard threshold: dev
    // (b=4, r=4) catches ~23% of threshold pairs per the curve; the
    // production choice k=128 → (b=32, r=4) catches ~87% — the reason
    // the knob exists
    val dev = DedupOps.lshCatchProbability(0.5, bands = 4, rows = 4)
    val prod = DedupOps.lshCatchProbability(0.5, bands = 32, rows = 4)
    assert(math.abs(dev - (1 - math.pow(1 - 0.0625, 4))) < 1e-12 &&
           dev > 0.22 && dev < 0.23)
    assert(prod > 0.85)
    // monotone in s, and monotone in bands at fixed rows
    val curve = (0 to 20).map(i => DedupOps.lshCatchProbability(i / 20.0, 4, 4))
    assert(curve == curve.sorted && curve.head == 0.0 && curve.last == 1.0)
    assert((1 to 32).map(b => DedupOps.lshCatchProbability(0.5, b, 4))
             .sliding(2).forall(p => p(0) < p(1)))

    // conf-driven run at k=32/bands=8: still a valid dedup output (the
    // exact-Jaccard verification is k-independent), and pairs found by
    // both configs carry identical verified scores
    spark.conf.set("graft.minhash.k", "32")
    spark.conf.set("graft.minhash.bands", "8")
    try {
      val alt = DedupOps.dedupMinhashLsh(spark, sf("sf0.001")).cache()
      assert(alt.filter(col("jaccard") < 0.5).isEmpty)
      assert(alt.count() > 0)
      spark.conf.unset("graft.minhash.k")
      spark.conf.unset("graft.minhash.bands")
      val base = DedupOps.dedupMinhashLsh(spark, sf("sf0.001"))
      val disagree = alt
        .select(col("doc1"), col("doc2"), col("jaccard").as("j_alt"))
        .join(base, Seq("doc1", "doc2"))
        .filter(col("jaccard") =!= col("j_alt"))
      assert(disagree.isEmpty)
      alt.unpersist()
      // invalid banding is rejected up front
      spark.conf.set("graft.minhash.k", "10")
      spark.conf.set("graft.minhash.bands", "4")
      intercept[IllegalArgumentException](
        DedupOps.dedupMinhashLsh(spark, sf("sf0.001")))
    } finally {
      spark.conf.unset("graft.minhash.k")
      spark.conf.unset("graft.minhash.bands")
    }
  }

  test("sign-bit LSH width is session-tunable; wider codes refine buckets") {
    val session = spark
    import session.implicits._
    def pairs(): Set[(Long, Long)] =
      graft.operators.VectorOps.embedNearDup(spark, sf("sf0.001"))
        .select("vec1", "vec2").as[(Long, Long)].collect().toSet
    val p8 = pairs() // default 8 bits
    try {
      spark.conf.set("graft.ann.bits", "12")
      val p12 = pairs()
      // a 12-bit bucket match implies an 8-bit prefix match, so wider
      // codes can only LOSE candidates — the recall/volume trade the
      // knob exists to make
      assert(p12.subsetOf(p8))
      spark.conf.set("graft.ann.bits", "0")
      intercept[IllegalArgumentException](
        graft.operators.VectorOps.embedNearDup(spark, sf("sf0.001")))
    } finally spark.conf.unset("graft.ann.bits")
  }

  test("multi-probe LSH probes Hamming-1 codes; never worsens any rank") {
    val session = spark
    import session.implicits._
    def byRank(): Map[(Long, Long), Double] =
      graft.operators.VectorOps.annLshBucketed(spark, sf("sf0.001"))
        .select("query_id", "rank", "cosine")
        .as[(Long, Long, Double)].collect()
        .map { case (q, r, c) => (q, r) -> c }.toMap
    val exact = byRank() // default: exact bucket only
    try {
      spark.conf.set("graft.ann.multiprobe", "1")
      val probed = byRank()
      // flipped-bit probes only ADD candidates
      assert(exact.forall { case (k, c) => probed.get(k).forall(_ >= c - 1e-9) })
      assert(probed.size >= exact.size)
      spark.conf.set("graft.ann.multiprobe", "2")
      intercept[IllegalArgumentException](
        graft.operators.VectorOps.annLshBucketed(spark, sf("sf0.001")))
    } finally spark.conf.unset("graft.ann.multiprobe")
  }

  test("IVF nprobe is session-tunable; more probes never worsen any rank") {
    val session = spark
    import session.implicits._
    def byRank(): Map[(Long, Long), Double] =
      graft.operators.VectorOps.annIvf(spark, sf("sf0.001"))
        .select("query_id", "rank", "cosine")
        .as[(Long, Long, Double)].collect()
        .map { case (q, r, c) => (q, r) -> c }.toMap
    val one = byRank() // default nprobe=1
    try {
      spark.conf.set("graft.ann.nprobe", "3")
      val three = byRank()
      // probing more cells only ADDS candidates, so the cosine at every
      // (query, rank) position can only improve or stay equal
      assert(one.forall { case (k, c1) => three.get(k).forall(_ >= c1 - 1e-9) })
      assert(three.nonEmpty)
      spark.conf.set("graft.ann.nprobe", "0")
      intercept[IllegalArgumentException](
        graft.operators.VectorOps.annIvf(spark, sf("sf0.001")))
    } finally spark.conf.unset("graft.ann.nprobe")
  }

  test("multi-probe flip set is bounded by the code length, not the bit knob") {
    // graft.ann.bits > embedding dim truncates the bucket code to dim
    // chars; flips past the code length used to degenerate to one
    // corrupted code (substr past end is empty), silently replacing
    // recall with duplicate join fan-out. The flip sequence must track
    // length(bucket): a 3-char code probes exactly itself + 3 flips.
    val session = spark
    import session.implicits._
    val codes = Seq("101").toDF("bucket")
      .select(explode(graft.operators.VectorOps.probeCodes(col("bucket"), 1))
        .as("p"))
      .as[String].collect().toSeq
    assert(codes == Seq("101", "001", "111", "100"))
    assert(codes.distinct.size == 4 && codes.forall(_.length == 3))
  }

  test("near-dup cosine threshold is session-tunable; higher = subset") {
    val session = spark
    import session.implicits._
    def pairs(): Set[(Long, Long)] =
      graft.operators.VectorOps.embedNearDup(spark, sf("sf0.001"))
        .select("vec1", "vec2").as[(Long, Long)].collect().toSet
    val base = pairs() // default 0.3
    try {
      spark.conf.set("graft.ann.cosine", "0.5")
      val strict = pairs()
      assert(strict.subsetOf(base) && strict.size < base.size)
      spark.conf.set("graft.ann.cosine", "1.5")
      intercept[IllegalArgumentException](
        graft.operators.VectorOps.embedNearDup(spark, sf("sf0.001")))
    } finally spark.conf.unset("graft.ann.cosine")
  }

  test("pointer-jumping on an empty pair set yields empty labels") {
    val session = spark
    import session.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc1", "doc2")
    val (labels, rounds) = graft.operators.DedupOps.starContractLabels(empty)
    assert(rounds == 0 && labels.isEmpty)
    labels.unpersist()
  }
}
