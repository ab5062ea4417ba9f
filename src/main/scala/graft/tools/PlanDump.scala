package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2097152")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // simulate at-scale size estimates: disable broadcast selection so
    // the plan shows the shape a genuinely large left side would get
    if (sys.env.contains("SPARK_GRAFT_NO_BROADCAST")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    println("autoBroadcastJoinThreshold=" +
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()  // let AQE finalize
    println("=== optimized logical ===")
    println(df.queryExecution.optimizedPlan.toString.take(4000))
    println("=== executed ===")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
