package graft

import graft.operators.FrameStore
import org.apache.spark.sql.functions._

/** Direct contract tests for the bounded persisted-frame store that now
  * backs the alert store, the span-gram frame, the shingle frame, and
  * the recall-matrix truths.
  */
class FrameStoreSpec extends SparkSpec {

  test("getOrBuild builds once per key and returns the same frame") {
    val store = new FrameStore(4)
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF("n") }
    val a = store.getOrBuild(spark, "dirA")(build())
    val b = store.getOrBuild(spark, "dirA")(build())
    assert(builds == 1)
    assert(a eq b)
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    assert(a.count() == 10)
  }

  test("distinct keys get distinct frames; FIFO eviction unpersists") {
    val store = new FrameStore(2)
    val f1 = store.getOrBuild(spark, "d1")(spark.range(1).toDF("n"))
    val f2 = store.getOrBuild(spark, "d2")(spark.range(2).toDF("n"))
    assert(!(f1 eq f2))
    f1.count(); f2.count() // materialize the cached blocks
    // third key evicts the OLDEST (d1) and unpersists it
    val f3 = store.getOrBuild(spark, "d3")(spark.range(3).toDF("n"))
    f3.count()
    assert(f1.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(f2.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // d1 rebuilds after eviction — a fresh frame, values intact
    val f1b = store.getOrBuild(spark, "d1")(spark.range(1).toDF("n"))
    assert(!(f1 eq f1b))
    assert(f1b.count() == 1)
  }

  test("cached frame results are bit-identical to the uncached plan") {
    val store = new FrameStore(2)
    val uncached = spark.range(100).toDF("n")
      .withColumn("h", md5(col("n").cast("string")))
    val cached = store.getOrBuild(spark, "parity")(
      spark.range(100).toDF("n")
        .withColumn("h", md5(col("n").cast("string"))))
    assert(cached.collect().map(_.toString).sorted
      .sameElements(uncached.collect().map(_.toString).sorted))
  }
}
