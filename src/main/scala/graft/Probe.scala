package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("series_filtered", "q3_shipping", "q5_local_supplier", "kpi_lookup")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
