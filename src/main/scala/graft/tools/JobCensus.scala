package graft.tools

import graft.Session

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Per-job wall-clock census of one query rep (not driver-run) — the
  * measure-first tool of the r18 optimization round: at sf0.1 the heavy
  * `s_*` gates are fixed-job-count-dominated, so the lever is "which
  * call site schedules how many jobs costing how much", which neither
  * `.explain` (plan shape, not job count) nor ProfileQ (one total) can
  * answer. A [[SparkListener]] records every job's duration plus its
  * call site, and the report groups jobs by call site ordered by total
  * seconds.
  *
  * Usage: `runMain graft.tools.JobCensus <sfDir> <query> [<query>...]`
  * (one warm rep uncounted, one counted rep per query). */
object JobCensus {
  private final case class Job(desc: String, site: String, started: Long,
      var ended: Long = -1L, var stages: Int = 0, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("s_cluster_labels")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (recording) jobs.synchronized {
          val p = j.properties
          val desc = Option(p.getProperty("spark.job.description")).getOrElse("")
          // Inside foreachBatch every job inherits the stream-start call
          // site, so attribute by the job's LAST stage's name instead —
          // that is the action's own call site (e.g. "parquet at
          // LabelLog.scala:328").
          val site = j.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name.takeWhile(_ != '+').trim).getOrElse("?")
          jobs(j.jobId) = Job(desc, site, j.time)
          j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(j.jobId).foreach(_.ended = j.time)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(s.stageInfo.stageId).flatMap(jobs.get).foreach { job =>
            job.stages += 1
            job.tasks += s.stageInfo.numTasks
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      noop(fn(spark, sf)) // warm rep, uncounted
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      recording = true
      val t0 = System.nanoTime()
      noop(fn(spark, sf))
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      // drain the async listener bus before reading (no public flush API)
      Thread.sleep(1000)
      val snapshot = jobs.synchronized { jobs.values.toVector }
      val bySite = snapshot.groupBy(j => j.site)
        .map { case (site, js) =>
          val sec = js.map(j => math.max(0L, j.ended - j.started)).sum / 1e3
          (site, js.size, sec, js.map(_.stages).sum, js.map(_.tasks).sum)
        }.toSeq.sortBy(-_._3)
      println(f"CENSUS $name wall=$wall%.2f s jobs=${snapshot.size} " +
        f"jobsec=${snapshot.map(j => math.max(0L, j.ended - j.started)).sum / 1e3}%.2f")
      bySite.foreach { case (site, n, sec, stages, tasks) =>
        println(f"  $sec%7.2f s  n=$n%-4d stages=$stages%-5d tasks=$tasks%-6d $site")
      }
      // Detail mode: every job in submission order with the driver-side
      // gap before it — matched to the foreachBatch action sequence by
      // position (call sites inside a stream thread are uniform, so
      // position is the only reliable attribution).
      if (sys.env.contains("GRAFT_CENSUS_DETAIL")) {
        val t00 = snapshot.headOption.map(_.started).getOrElse(0L)
        var prevEnd = t00
        snapshot.sortBy(_.started).foreach { j =>
          val gap = (j.started - prevEnd) / 1e3
          prevEnd = math.max(prevEnd, j.ended)
          println(f"  JOB off=${(j.started - t00) / 1e3}%7.2f gap=$gap%6.3f " +
            f"dur=${math.max(0L, j.ended - j.started) / 1e3}%6.3f " +
            f"stages=${j.stages}%-3d tasks=${j.tasks}%-5d ${j.site.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
