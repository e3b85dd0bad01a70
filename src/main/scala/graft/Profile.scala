package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic (optimization rounds): per-JOB wall-clock decomposition of a
  * named query — construction time (eager driver actions inside the query
  * fn) vs. final-action time, plus every Spark job's duration and the
  * driver-side gaps between consecutive jobs. The guide's "measure first"
  * step for queries whose cost is many small driver barriers rather than
  * one big stage. Usage:
  *   PP_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile q_a,q_b"
  */
object Profile {
  private final class Rec(
      val id: Int, val desc: String, val submitted: Long) {
    @volatile var finished: Long = 0L
    @volatile var nStages: Int = 0
    @volatile var stageName: String = ""
  }

  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty) Seq("q_dedup_index_probe")
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = sys.env.getOrElse("PP_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("PP_CPUS", "32")
    val passes = sys.env.getOrElse("PP_PASSES", "1").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Rec]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Rec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val r = new Rec(e.jobId, d, e.time)
        r.nStages = e.stageInfos.size
        r.stageName = e.stageInfos.lastOption.map(_.name.take(90)).getOrElse("")
        jobs.put(e.jobId, r)
        order.add(r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.finished = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val dur = (for {a <- s.completionTime; b <- s.submissionTime} yield a - b).getOrElse(-1L)
        if (dur >= 60L)
          println(f"    STAGE ${s.stageId}%4d ${dur}%6d ms tasks ${s.numTasks}%3d  ${s.name.take(110)}")
      }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warmup: codegen + once-per-JVM index builds
      spark.catalog.clearCache()
      for (pass <- 1 to passes) {
        jobs.clear(); order.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val tCons = System.nanoTime()
        df.count()
        val tEnd = System.nanoTime()
        Thread.sleep(400) // let the async listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
        println(f"== $name pass $pass: total ${(tEnd - t0) / 1e9}%.3f s " +
          f"(construct ${(tCons - t0) / 1e9}%.3f s, action ${(tEnd - tCons) / 1e9}%.3f s), " +
          f"${order.size} jobs ==")
        var prevEnd = t0 / 1000000L // ns -> ms epoch-ish; only deltas matter below
        // job submit times are epoch ms; normalize gaps against the previous
        // job's end (first gap is from pass start, best-effort)
        var prevFinished = -1L
        val it = order.iterator()
        while (it.hasNext) {
          val r = it.next()
          val dur = if (r.finished > 0) r.finished - r.submitted else -1L
          val gap = if (prevFinished > 0) r.submitted - prevFinished else -1L
          println(f"  job ${r.id}%4d ${dur}%6d ms  gap ${gap}%5d ms  stages ${r.nStages}%2d  ${r.stageName}")
          prevFinished = if (r.finished > 0) r.finished else prevFinished
        }
      }
    }
    spark.stop()
  }
}
