package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measure what a query actually moves: shuffle write/read bytes and
  * records, summed over every stage of the query's jobs. The plan audit
  * says where exchanges ARE; this says what they COST — the number that
  * decides whether a shape survives a 100x scale-up (a "minimal shuffle"
  * claim should be a byte count, not an adjective).
  *
  * Usage: runMain graft.tools.ShuffleProbe <sfDir> <query> [query...]
  * Prints one line per query (second in-JVM run, so shuffle sizes are not
  * confounded by first-run scan-cache effects — byte counts are identical
  * across runs; the rerun just confirms it).
  */
object ShuffleProbe {
  private final class Acc extends SparkListener {
    val wBytes = new AtomicLong; val rBytes = new AtomicLong
    val wRecs = new AtomicLong; val rRecs = new AtomicLong
    def reset(): Unit = Seq(wBytes, rBytes, wRecs, rRecs).foreach(_.set(0))
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        wRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        rBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        rRecs.addAndGet(m.shuffleReadMetrics.recordsRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleProbe <sfDir> <query> [query...]")
    val dir = args(0)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    def mb(b: Long) = f"${b / 1048576.0}%.1f MiB"
    for (q <- args.drop(1)) {
      val fn = graft.SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      // rows reported from an untimed, unprobed count; the measured runs
      // use noop-write so count-star pruning can't shrink the plan (Bench)
      val rows = fn(spark, dir).count()
      var wall = 0.0
      for (_ <- 1 to 2) {
        acc.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        wall = (System.nanoTime() - t0) / 1e9
        // listener events are async (the public API has no drain hook):
        // stage-completed events for a finished job land within ms, give
        // them a beat before reading the counters
        Thread.sleep(1000)
      }
      println(f"[sp] $q%-16s wall=$wall%6.2fs rows=$rows%9d " +
        s"shufW=${mb(acc.wBytes.get)} (${acc.wRecs.get} recs) " +
        s"shufR=${mb(acc.rBytes.get)} (${acc.rRecs.get} recs)")
    }
    spark.stop()
  }
}
