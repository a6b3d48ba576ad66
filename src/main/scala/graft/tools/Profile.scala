package graft.tools

import graft.{Session, Tables}
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the bench outliers (not driver-run): times
  * isolated slices of a query so optimization targets the real cost, not
  * the first guess. Usage: `runMain graft.tools.Profile <sfDir>`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(Tables.lineitem(spark, sf).limit(1000))

    time("scan_only") { noop(Tables.lineitem(spark, sf)) }
    // spread = hash-on-all-columns; the round-robin leg is the baseline
    // the hash form replaced (round-robin pays sortBeforeRepartition)
    time("scan_spread_hash") { noop(Tables.spread(spark, Tables.lineitem(spark, sf))) }
    time("scan_spread_hash_2") { noop(Tables.spread(spark, Tables.lineitem(spark, sf))) }
    val li = Tables.lineitem(spark, sf)
    time("scan_spread_roundrobin") {
      noop(li.repartition(spark.sparkContext.defaultParallelism))
    }
    time("scan_spread_roundrobin_2") {
      noop(li.repartition(spark.sparkContext.defaultParallelism))
    }

    val q = graft.SparkEntry.queries("q_cdc_roundtrip")
    time("roundtrip_full_1") { noop(q(spark, sf)) }
    time("roundtrip_full_2") { noop(q(spark, sf)) }

    // The same query minus the final sort:
    time("roundtrip_nosort") {
      noop(q(spark, sf).sortWithinPartitions("seq_number"))
    }

    // Phase slices of the encode→decode map itself:
    import graft.operators.CodecQueries
    import graft.cdc._
    import spark.implicits._
    val schema = CodecQueries.AllTypesSchema
    val registry = SchemaRegistry(Map(7 -> "informixcdc_test"), Map(7 -> schema))
    val src = Tables.spread(spark, CodecQueries.srcProjection(spark, sf))
    time("src_projection_only") { noop(src) }
    val enc = src.map { row =>
      val values: IndexedSeq[Any] =
        (3 until row.length).map(i => if (row.isNullAt(i)) null else row.get(i))
      CdcCodec.encodeRowFrame(CdcRecords.INSERT + row.getInt(2),
        schema, row.getLong(0), row.getInt(1), 0, values).length
    }
    time("encode_only") { noop(enc.toDF()) }
    val encDec = src.map { row =>
      val values: IndexedSeq[Any] =
        (3 until row.length).map(i => if (row.isNullAt(i)) null else row.get(i))
      val bytes = CdcCodec.encodeRowFrame(CdcRecords.INSERT + row.getInt(2),
        schema, row.getLong(0), row.getInt(1), 0, values)
      CdcCodec.decodeFrame(bytes, registry).asInstanceOf[RowImage].seqNumber
    }
    time("encode_decode_no_envelope") { noop(encDec.toDF()) }
    spark.stop()
  }
}
