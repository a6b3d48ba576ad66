package graft.tools

import graft.Session

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the r18 IVF assignment rewrite (VERDICT r18 #7): the
  * crossJoin×K + window-rank argmax vs the 1-row-broadcast fold
  * ([[graft.operators.LlmQueries.kmeansAssign]]) — measured at SEVERAL
  * corpus sizes so the ×√N shuffle-amplification claim is a committed
  * measurement, not an argument. The sf0.1 gate was bench-neutral
  * because at 1.5k vectors the removed exchange is milliseconds; the
  * claim is about growth, so this tool generates a deterministic
  * synthetic corpus (id-seeded arithmetic, no RNG state) at each
  * requested N, builds K = ⌈√N⌉ centroids from the lowest ids, and
  * times both forms with the noop sink (guide §1.4).
  *
  * Usage: `runMain graft.tools.ArgmaxAB [N,N,...] [dim] [reps] [forms]`
  * (defaults 20000,200000,2000000 / 64 / 3 / window,fold). Prints one
  * line per (N, form) with per-rep seconds and the median. NOT part of
  * the bench contract — a measurement tool only. `forms` exists
  * because the window arm stops FITTING first: at N = 2×10⁶ (K = 1415)
  * it must shuffle N·K ≈ 2.8×10⁹ embedding-carrying rows (~10² GB of
  * spill — it exhausted this sandbox's disk), while the fold arm
  * shuffles nothing and completes — which is the claim, measured. */
object ArgmaxAB {

  /** Deterministic synthetic vectors: element j of row i is a cheap
    * integer hash folded to [-1, 1) — stable across runs and engines. */
  private def vectors(spark: SparkSession, n: Long, dim: Int): DataFrame =
    spark.range(0, n, 1)
      .select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast((pmod(xxhash64(id * 31 + j), 2000) - 1000) / 1000.0 AS float))")
          .as("embedding"))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", expr("sqrt(dot_f32(embedding, embedding))"))

  /** The OLD form (pre-r18): crossJoin every vector with the K-row
    * broadcast centroid table, rank the ×K exploded rows per vector —
    * one Exchange + Sort carrying K copies of every embedding. */
  private def assignWindow(e: DataFrame, cents: DataFrame): DataFrame = {
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("sim", expr(
        "round(dot_f32(embedding, cv) / (norm * cnorm), 6)"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** The NEW form (r18): the shared map-side fold. */
  private def assignFold(e: DataFrame, cents: DataFrame): DataFrame =
    graft.operators.LlmQueries.kmeansAssign(e, cents)
      .select(col("vec_id"), col("embedding"), col("cid"))

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("20000,200000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val forms = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(Seq("window", "fold"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DotF32.ensureRegistered(spark)
    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ns.foreach { n =>
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      // materialize the corpus once so both forms time the ASSIGNMENT,
      // not the synthetic generation (same discipline as the gates)
      val e = withNorm(vectors(spark, n, dim)).localCheckpoint()
      val cents = withNorm(vectors(spark, k.toLong, dim))
        .select(col("vec_id").as("cid"), col("embedding").as("cv"),
          col("norm").as("cnorm"))
        .localCheckpoint()
      Seq("window" -> (assignWindow _), "fold" -> (assignFold _))
        .filter(f => forms.contains(f._1))
        .foreach { case (name, form) =>
          spark.sparkContext.setJobDescription(s"argmax_ab $name n=$n")
          run(form(e, cents)) // warm, untimed
          val ts = (1 to reps).map(_ => run(form(e, cents)))
          val med = ts.sorted.apply(ts.length / 2)
          println(f"ARGMAXAB n=$n k=$k dim=$dim form=$name " +
            f"reps=${ts.map(t => f"$t%.2f").mkString(",")} median=$med%.2f s")
        }
    }
    spark.stop()
  }
}
