package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("q1_agg", "q3_topn", "q5_region", "q_discover", "q_manifest_delta")) {
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList
      val bcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val scans = plan.linesIterator.count(_.contains("FileScan"))
      println(s"== $n: scans=$scans bhj=$bcast smj=$smj")
      pushed.foreach(p => println(s"   $p"))
    }
    spark.stop()
  }
}
