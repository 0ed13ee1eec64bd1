package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Measurement tooling (optimization rounds): per-JOB wall-clock breakdown
  * of one registered query — where a multi-action entry (store scenarios,
  * iterative loops, index builds) actually spends its seconds, which the
  * bench's single end-to-end number cannot show.
  *
  * Usage: runMain graft.JobProfile <query> [passes]
  * Runs one warm-up materialization, then `passes` timed ones with a
  * listener recording every job's duration, stage count, task count, and
  * shuffle read/write bytes. Output to stderr: one line per job (of the
  * LAST timed pass' span), plus the gap time not covered by any job
  * (driver-side planning/collect overhead).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = 0L, var stages: Int = 0,
                            var tasks: Int = 0, var shufRead: Long = 0L,
                            var shufWrite: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    })

    names.foreach { name =>
      def materialize(): Unit =
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()

      materialize() // warm-up
      var lastSpan = (0L, 0L)
      (1 to passes).foreach { p =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.currentTimeMillis()
        materialize()
        val t1 = System.currentTimeMillis()
        lastSpan = (t0, t1)
        System.err.println(f"[profile] $name pass $p: ${(t1 - t0) / 1e3}%.3f s")
      }
      Thread.sleep(300) // let listener drain
      val (t0, t1) = lastSpan
      var covered = 0L
      jobs.synchronized {
        jobs.values.toSeq.sortBy(_.start).foreach { j =>
          val dur = (j.end - j.start) / 1e3
          covered += (j.end - j.start)
          System.err.println(f"[profile]   job ${j.id}%3d ${dur}%7.3f s  " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
            f"shufR=${j.shufRead / 1024}%8d KB shufW=${j.shufWrite / 1024}%8d KB  ${j.desc.take(80)}")
        }
        System.err.println(f"[profile]   jobs total ${covered / 1e3}%.3f s; " +
          f"wall ${(t1 - t0) / 1e3}%.3f s; driver gap ${(t1 - t0 - covered) / 1e3}%.3f s " +
          "(gaps overlap-naive: concurrent jobs double-count)")
      }
    }
    spark.stop()
  }
}
