package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** MinHash/LSH properties (SURVEY §2.b: q_near_dedup_minhash is verified by
  * property tests, §7.4.7: seeded determinism).
  *
  * This re-implements the exact arithmetic of [[LlmQueries]]'s SQL pipeline
  * in plain Scala — h60 = first 15 hex chars of md5 as a long, permutations
  * h_i(x) = (a_i·x + b_i) mod P — so the invariants proved here are the
  * invariants of the shipped expressions (same constants, same ops).
  */
object MinHashProps extends Properties("MinHash") {
  private val P = 2147483647L

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def shingleHashes(tokens: Seq[String]): Set[Long] = {
    val n = math.max(tokens.length - 2, 1)
    (1 to n).map(i => tokens.slice(i - 1, i - 1 + 3).mkString(" "))
      .distinct.map(s => h60(s) % P).toSet
  }

  private def signature(hs: Set[Long]): IndexedSeq[Long] =
    LlmQueries.perms.map { case (a, b) => hs.map(x => (a * x + b) % P).min }.toIndexedSeq

  private val genDoc: Gen[List[String]] =
    Gen.chooseNum(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("the", "cat", "sat", "on", "mat", "dog", "ran",
        "fast", "blue", "sky", "data", "spark", "row", "col", "scan")))

  property("hash-family arithmetic stays exact in signed 64-bit") =
    forAll(Gen.choose(0L, P - 1)) { x =>
      // a·x < 2^62 for every seeded a (the oracle-parity precondition
      // documented in LlmQueries).
      LlmQueries.perms.forall { case (a, b) =>
        a * x >= 0 && a * x + b >= 0 && (a * x + b) % P >= 0
      }
    }

  property("signature is deterministic and permutation count is fixed") =
    forAll(genDoc) { doc =>
      val hs = shingleHashes(doc)
      signature(hs) == signature(hs) &&
        signature(hs).length == LlmQueries.NumPerms &&
        LlmQueries.Bands * LlmQueries.RowsPerBand == LlmQueries.NumPerms
    }

  property("minhash of a union is the min of the parts (lattice law)") =
    forAll(genDoc, genDoc) { (a, b) =>
      val (ha, hb) = (shingleHashes(a), shingleHashes(b))
      val (sa, sb, su) = (signature(ha), signature(hb), signature(ha ++ hb))
      su.indices.forall(i => su(i) == math.min(sa(i), sb(i)))
    }

  property("identical docs always collide in every LSH band") =
    forAll(genDoc) { doc =>
      val s1 = signature(shingleHashes(doc))
      val s2 = signature(shingleHashes(doc))
      (0 until LlmQueries.Bands).forall { j =>
        val r = LlmQueries.RowsPerBand
        s1.slice(j * r, j * r + r) == s2.slice(j * r, j * r + r)
      }
    }

  property("signature agreement estimates Jaccard (mean error bound)") = {
    // Statistical: with 16 permutations the per-pair std-dev is ≤ 0.125, so
    // the MEAN absolute error over 40 seeded pairs concentrates well below
    // 0.12. Fixed generator seed ⇒ not flaky.
    val rnd = new scala.util.Random(20260812L)
    val vocab = (0 until 60).map(i => s"tok$i")
    val errors = (0 until 40).map { _ =>
      val base = rnd.shuffle(vocab).take(25 + rnd.nextInt(20))
      val mutated = base.map(t =>
        if (rnd.nextDouble() < 0.3) s"mut${rnd.nextInt(50)}" else t)
      val (ha, hb) = (shingleHashes(base), shingleHashes(mutated))
      val trueJ = ha.intersect(hb).size.toDouble / ha.union(hb).size
      val (sa, sb) = (signature(ha), signature(hb))
      val estJ = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      math.abs(trueJ - estJ)
    }
    org.scalacheck.Prop.propBoolean(errors.sum / errors.length < 0.12)
  }
}
