package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins the one environmental assumption every multi-batch drain rests
  * on: [[graft.streaming.StreamDrain.stageChunked]] writes contiguous
  * range chunks with ascending modification times, and the file stream
  * source under `maxFilesPerTrigger=1` replays them as micro-batches in
  * exactly that order. If a Spark upgrade ever changed the source's
  * file ordering, the order-dependent drains would fail their hash
  * gates downstream — this spec points at the cause directly.
  */
class StreamDrainStagingSpec extends SparkSpec {

  test("stageChunked + maxFilesPerTrigger=1 replays chunks in range order") {
    val df = spark.range(90).select(col("id").as("k"), (col("id") * 10).as("v"))
    val stage = Files.createTempDirectory("graft_stage_spec").toString
    graft.streaming.StreamDrain.stageChunked(df, stage, 3, Seq(col("k")))

    val files = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length === 3)
    assert(files.map(_.lastModified()).sliding(2)
      .forall(p => p.length < 2 || p(0) < p(1)),
      "chunk mtimes must be strictly ascending in name order")

    val work = Files.createTempDirectory("graft_stage_spec_store").toString
    val q = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(s"$work/out")
        ()
      }
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$work/out")
      .groupBy(col("batch_id"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .orderBy("batch_id")
      .collect()
    assert(out.length === 3)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("batch_id") === i.toLong)
      assert(r.getAs[Long]("n") === 30L)
      assert(r.getAs[Long]("lo") === i * 30L,
        s"micro-batch $i must replay the $i-th contiguous range")
      assert(r.getAs[Long]("hi") === i * 30L + 29L)
    }
  }
}
