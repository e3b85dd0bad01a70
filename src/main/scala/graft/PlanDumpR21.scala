package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (round 21 deliverable): write `.explain("formatted")` of
  * named queries to files. Usage:
  *   PD_OUT=/root/repo/plans/r21 PD_SUFFIX=after PD_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.PlanDumpR21 q_a,q_b"
  */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_dup_clusters")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val out = sys.env.getOrElse("PD_OUT", "/root/repo/plans/r21")
    val suffix = sys.env.getOrElse("PD_SUFFIX", "after")
    val dir = sys.env.getOrElse("PD_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/${name}_$suffix.txt"), txt)
      spark.catalog.clearCache()
      println(s"dumped $name -> $out/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
