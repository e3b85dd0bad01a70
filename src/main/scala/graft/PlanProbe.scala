package graft
import org.apache.spark.sql.SparkSession
/** Diagnostic: final adaptive plan of a named SparkEntry query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_jaccard_pairs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("FINAL_REUSED=" + "ReusedExchange".r.findAllIn(plan).length)
    println("FINAL_SCANS=" + "FileScan parquet".r.findAllIn(plan).length)
    println("FINAL_TOKENIZE=" + "tokenize_plain_words".r.findAllIn(plan).length)
    spark.stop()
  }
}
