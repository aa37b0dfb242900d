package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage wall times for one query under the noop action —
  * where inside a multi-round plan the time actually goes. */
object StageTimer {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val q = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(q)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        val m = i.taskMetrics
        if (dur > 0.15)
          println(f"[stage] ${i.stageId}%4d ${dur}%6.2fs tasks=${i.numTasks}%3d " +
            f"run=${m.executorRunTime / 1000.0}%.2f deser=${m.executorDeserializeTime / 1000.0}%.2f " +
            f"gc=${m.jvmGCTime / 1000.0}%.2f fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%.2f " +
            f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%.1fMB " +
            f"cpu=${m.executorCpuTime / 1e9}%.2f")
      }
    })
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
