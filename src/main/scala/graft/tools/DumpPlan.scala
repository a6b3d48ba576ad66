package graft.tools

import graft.{Session, SparkEntry}

/** Prints `executedPlan.toString` for the named queries — the EXACT
  * string [[graft.operators.PlanAuditSuite]] asserts on (which differs
  * from `.explain("formatted")` under AQE), so pins can be written
  * against what the suite actually sees. */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Session.build("local[4]", "4")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
