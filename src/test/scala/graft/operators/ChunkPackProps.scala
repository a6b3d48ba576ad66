package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

/** Invariants of the trainer-shaping operators over generated inputs —
  * the claims a fixed fixture can't pin:
  *
  *  - [[CorpusOps.chunkDocs]]: concatenating each chunk's stride-prefix
  *    plus the final chunk reconstructs the document EXACTLY (no token
  *    lost or duplicated, any window/overlap), and every chunk except
  *    the last carries exactly `window` tokens;
  *  - [[CorpusOps.packSequences]]: the running count is the exact prefix
  *    sum in id order within a block, bins are non-decreasing, and a
  *    doc's bin is its start-offset divided by the window.
  */
object ChunkPackProps extends Properties("ChunkPack") {

  private lazy val s = TestSpark.spark

  private val genDoc = for {
    n <- Gen.choose(1, 120)
  } yield (1 to n).map(i => s"t$i").mkString(" ")

  property("chunk coverage: stride prefixes + tail rebuild the doc") =
    forAllNoShrink(genDoc, Gen.choose(2, 20), Gen.choose(0, 10)) { (doc, w, oRaw) =>
      val overlap = math.min(oRaw, w - 1)
      val stride = w - overlap
      import s.implicits._
      val chunks = CorpusOps
        .chunkDocs(Seq((1L, doc)).toDF("id", "body"), "id", "body", w, overlap)
        .orderBy("chunk_id").collect()
      val toks = doc.split(" ").toSeq
      val rebuilt = chunks.init.flatMap(_.getString(4).split(" ").take(stride)) ++
        chunks.last.getString(4).split(" ")
      val starts = chunks.map(_.getLong(2)).toSeq
      // each chunk holds exactly the tokens [start, start + window) ∩ doc
      val sized = chunks.forall(c =>
        c.getLong(3) == math.min(w.toLong, toks.length - c.getLong(2)))
      rebuilt.toSeq == toks && sized &&
        starts == starts.indices.map(_.toLong * stride)
    }

  property("emit: spans round-trip every token; bins tile to the window") =
    forAllNoShrink(Gen.listOfN(8, Gen.choose(1, 60)), Gen.choose(5, 100),
        Gen.choose(2, 8)) { (lens, window, blockDocs) =>
      import s.implicits._
      val bodies = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
      val got = CorpusOps
        .emitPackedSequences(bodies.toDF("id", "body"), "id", "body",
          window, blockDocs)
        .orderBy("block", "bin", "bin_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6)))
      val byDoc = got.groupBy(_._3)
      // 1. per-doc round-trip: concatenating a doc's spans in doc_offset
      //    order rebuilds the document exactly (token counts AND text)
      val docsRebuilt = bodies.forall { case (id, body) =>
        val spans = byDoc(id).sortBy(_._4)
        spans.map(_._6).sum == body.split(" ").length &&
          spans.map(_._7).mkString(" ") == body &&
          spans.map(_._4).toSeq ==
            spans.map(_._6).scanLeft(0L)(_ + _).init.toSeq
      }
      // 2. per-bin tiling: spans in bin_offset order are contiguous from 0
      //    and fill the window exactly (each block's last bin may be short)
      val binsTiled = got.groupBy(g => (g._1, g._2)).forall { case ((b, bin), rows) =>
        val sorted = rows.sortBy(_._5)
        val contiguous = sorted.map(_._5).toSeq ==
          sorted.map(_._6).scanLeft(0L)(_ + _).init.toSeq
        val lastBin = got.filter(_._1 == b).map(_._2).max
        contiguous &&
          (bin == lastBin || sorted.map(_._6).sum == window.toLong)
      }
      docsRebuilt && binsTiled
    }

  property("pack: exact block-local prefix sums, bins non-decreasing") =
    forAll(Gen.listOfN(8, Gen.choose(1, 60)), Gen.choose(5, 100),
        Gen.choose(2, 8)) { (lens, window, blockDocs) =>
      import s.implicits._
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
        .toDF("id", "body")
      val got = CorpusOps
        .packSequences(docs, "id", "body", window, blockDocs)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      got.groupBy(_._2).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        val cums = sorted.scanLeft(0L)(_ + _._4).tail
        sorted.map(_._5).toSeq == cums.toSeq &&
          sorted.zip(cums).forall { case ((_, _, bin, n, _), cum) =>
            bin == (cum - n) / window
          } &&
          sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq
      }
    }
}
