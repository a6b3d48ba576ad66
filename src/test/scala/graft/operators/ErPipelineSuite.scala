package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FuzzyJoin.qErPipeline]] — the composed entity-resolution flagship:
  * the whole pipeline (block → cluster-by-entity-projection → survivor)
  * must equal a from-scratch brute-force resolution (all-pairs
  * levenshtein + union-find closure + support-count argmax) computed
  * independently in Scala. */
class ErPipelineSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pipeline output equals brute-force block+cluster+survive") {
    val got = SparkEntry.queries("q_er_pipeline")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // ---- brute-force reference, no Spark operators -------------------
    val part = graft.Tables.part(s, sf)
      .filter(col("p_partkey") % 4 === 0)
      .selectExpr("p_partkey",
        "concat_ws(' ', p_brand, p_name, p_type) AS n")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val catalog = part.groupBy(_._2).map { case (n, rows) =>
      (rows.map(_._1).min, n)
    }.toSeq // (entity_id, ename)
    val mentions = part.map { case (k, n) =>
      val name = if (k % 8 == 4) {
        val p = (k % n.length).toInt
        n.substring(0, p) + n.substring(p + 1)
      } else n
      (k, name)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pairs = for {
      (mid, mn) <- mentions; (eid, en) <- catalog
      if math.abs(mn.length - en.length) <= 1 && lev(mn, en) <= 1
    } yield (mid, eid)
    // union-find over the entity projection (entities sharing a mention)
    val parent = scala.collection.mutable.Map(catalog.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.groupBy(_._1).values.foreach { es =>
      val ids = es.map(_._2).distinct
      ids.tail.foreach(union(ids.head, _))
    }
    // min-id canonical label per root
    val comp = catalog.map(c => c._1 -> c._1).toMap.keys
      .groupBy(find).flatMap { case (_, members) =>
        val m = members.toSeq; val lbl = m.min; m.map(_ -> lbl)
      }
    val mres = pairs.groupBy(_._1).map { case (mid, es) =>
      mid -> es.map(e => comp(e._2)).min
    }
    val csize = mres.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val support = pairs.groupBy(_._2).map { case (e, v) => e -> v.size }
    val reps = support.toSeq.map { case (e, n) => (comp(e), n, e) }
      .groupBy(_._1).map { case (c, cand) =>
        c -> cand.minBy(x => (-x._2, x._3))._3
      }
    val want = mres.toSeq.map { case (mid, c) =>
      (mid, c, csize(c), reps(c))
    }.sortBy(_._1)
    // ------------------------------------------------------------------
    assert(got.length === want.length)
    assert(got.toSeq === want)
    assert(got.nonEmpty)
    // the manufactured ambiguity really exercises the closure: at least
    // one cluster holds more than one mention
    assert(got.exists(_._3 > 1L))
  }
}
