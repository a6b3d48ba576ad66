package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide — sbt
  * forks a single test JVM, so suites reuse it and pay startup once). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Session.build("local[4]", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
