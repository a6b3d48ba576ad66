package graft.tools

import graft.Session

/** Times individual SparkEntry queries in isolation (not driver-run):
  * `runMain graft.tools.ProfileQ <sfDir> <query> [<query> ...]` runs each
  * named query 4 times (1 warm-up + 3 timed) and prints per-rep seconds,
  * so a bench outlier can be attributed to the query itself vs shared-JVM
  * pressure from the 97-query bench loop. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_decontaminate_ngram", "q_dedup_increment")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      noop(fn(spark, sf)) // warm-up
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(fn(spark, sf))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILEQ $name%-28s ${reps.map(r => f"$r%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
