package graft
import org.apache.spark.sql.SparkSession
/** Diagnostic: print per-stage topic-modeling timings at bench scale. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(sys.env.getOrElse("SP_DIR", "/root/testdata/sf0.1") + "/documents.parquet").limit(sys.env.getOrElse("SP_LIMIT", "200").toInt)
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime
      val out = graft.topic.TopicModeling.run(docs, "text", "doc_id", None,
        graft.topic.TopicModeling.Config(cluster = graft.topic.Cluster.Config(minClusterSize = 5)))
      val n = out.documents.count()
      println(f"PASS $pass TOTAL_S=${(System.nanoTime - t0) / 1e9}%.2f rows=$n nChunks=${out.nChunks}")
      if (pass == 2) out.stageTimings.foreach { case (s, ms) => println(f"STAGE $s%-22s $ms%10.1f ms") }
    }
    spark.stop()
  }
}
