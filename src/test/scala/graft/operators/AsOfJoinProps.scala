package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: the union+window as-of composition equals the brute-force
  * definition — for each left row, the right row maximizing `rts` among
  * `rts <= lts` in the key group — on random inputs with collisions,
  * empty sides, and duplicate timestamps (right side deduped per (key, ts)
  * first, the operator's documented precondition). */
object AsOfJoinProps extends Properties("AsOfJoin") {

  private lazy val s = TestSpark.spark

  private val genRows: Gen[List[(Long, Long)]] = Gen.listOf(
    for {
      k <- Gen.choose(0L, 4L)     // few keys → dense collisions
      t <- Gen.choose(0L, 20L)    // narrow time range → frequent ties
    } yield (k, t))

  property("equals brute-force argmax") =
    forAll(genRows, genRows) {
      (leftRows: List[(Long, Long)], rightRows: List[(Long, Long)]) =>
        import s.implicits._
        // Deduped right side with a payload that identifies the row.
        val right = rightRows.distinct.map { case (k, t) => (k, t, s"p$k-$t") }
        val left = leftRows.zipWithIndex.map { case ((k, t), i) => (k, t, i) }

        val expected = left.map { case (k, lt, i) =>
          val best = right.filter(r => r._1 == k && r._2 <= lt)
            .sortBy(_._2).lastOption.map(_._3).orNull
          (i, best)
        }.sortBy(_._1)

        val lDf = left.toDF("k", "lts", "id")
        val rDf = right.toDF("k", "rts", "payload")
        val got = AsOfJoin.asOf(lDf, rDf, Seq("k"), "lts", "rts", Seq("payload"))
          .select("id", "payload").collect()
          .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1)))
          .sortBy(_._1).toSeq

        got == expected
    }
}
