package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter (dev only;
    // the driver always passes two args → full run)]
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_AQE=1 → the CLUSTER-DEFAULT planner posture: Spark's
    // default 200 shuffle partitions with AQE (on by default in every
    // library session, never disabled here) free to coalesce partitions
    // and re-plan joins at runtime. The config-robustness gate pass runs
    // the full oracle compare under it — every query ends in a total
    // orderBy, so hashes must hold under ANY partitioning the adaptive
    // planner picks; a query that flips is a real determinism bug.
    val shufflePartitions =
      if (sys.env.get("SPARK_GRAFT_AQE").contains("1")) "200" else cpus
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_ROCKSDB=1 → force the RocksDB state-store provider
    // SESSION-WIDE (the provider a production cluster deploys): the
    // windowed-agg, session-window, and stream-stream-join drains then
    // run the full gate on RocksDB instead of the default HDFS-backed
    // provider. The transformWithState legs already force RocksDB
    // locally (StreamDrain.withRocksDb), so this posture covers the
    // remaining three state families — a hash flip under it would be a
    // provider-semantics bug worth finding before a cluster does.
    val spark = (if (sys.env.get("SPARK_GRAFT_ROCKSDB").contains("1"))
                   builder.config(
                     graft.streaming.AnomalyStatefulProcessor.rocksdbConf._1,
                     graft.streaming.AnomalyStatefulProcessor.rocksdbConf._2)
                 else builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // posture line: lets a gate log prove WHICH planner/provider posture
    // produced it (stderr, like the per-query failure lines)
    System.err.println(
      s"[verify] posture: shuffle_partitions=$shufflePartitions " +
        s"state_store=${spark.conf.getOption(
          graft.streaming.AnomalyStatefulProcessor.rocksdbConf._1)
          .map(_.split('.').last).getOrElse("default(hdfs)")}")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
