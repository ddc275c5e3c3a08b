package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.codecs.AhoCorasick

/** Property-style randomized cross-checks for the round-13 kernels:
  * Aho–Corasick counts vs a naive replace-count reference, and
  * unigram Viterbi vs exhaustive DP — seeded Gens (the offline
  * scalacheck pattern from TensorCodecSpec). */
class KernelPropertySpec extends SparkSpec {

  private def forAllSeeded[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (1 to n).foreach(i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))))

  /** The replace-count reference: non-overlapping greedy scan. */
  private def naiveCount(text: String, pat: String): Long = {
    var i = 0; var c = 0L
    while (i <= text.length - pat.length) {
      if (text.regionMatches(i, pat, 0, pat.length)) {
        c += 1; i += pat.length
      } else i += 1
    }
    c
  }

  test("AC counts equal the naive replace-count on random inputs") {
    val genCase = for {
      textLen <- Gen.choose(0, 60)
      text <- Gen.listOfN(textLen, Gen.oneOf('a', 'b', 'c'))
        .map(_.mkString)
      nPats <- Gen.choose(1, 6)
      pats <- Gen.listOfN(nPats,
        Gen.choose(1, 4).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield (text, pats.distinct)
    forAllSeeded(genCase) { case (text, pats) =>
      val got = new AhoCorasick.Automaton(pats.toArray)
        .counts(text).toSeq
      val want = pats.map(naiveCount(text, _))
      assert(got == want, s"text='$text' pats=$pats: $got vs $want")
    }
  }

  /** Exhaustive minimum over all segmentations (cost, then pieces). */
  private def bruteBest(tok: String, vocab: Map[String, Long],
      unk: Long): (Long, Int) = {
    val cps = tok.toCharArray
    def go(i: Int): Seq[(Long, Int)] =
      if (i == cps.length) Seq((0L, 0))
      else (1 to (cps.length - i)).flatMap { len =>
        val sub = new String(cps, i, len)
        vocab.get(sub).orElse(if (len == 1) Some(unk) else None)
          .toSeq.flatMap(c => go(i + len).map { case (rc, rn) =>
            (c + rc, rn + 1) })
      }
    go(0).minBy(identity)
  }

  test("unigram Viterbi equals exhaustive DP on random vocabularies") {
    val genCase = for {
      tokLen <- Gen.choose(1, 9)
      tok <- Gen.listOfN(tokLen, Gen.oneOf('a', 'b')).map(_.mkString)
      nPieces <- Gen.choose(1, 8)
      pieces <- Gen.listOfN(nPieces, for {
        l <- Gen.choose(1, 3)
        p <- Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)
        c <- Gen.choose(1L, 20L)
      } yield (p, c))
    } yield (tok, pieces.toMap) // toMap dedupes pieces
    forAllSeeded(genCase, n = 120) { case (tok, vocab) =>
      val m = new java.util.HashMap[String, java.lang.Long]()
      vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      val maxCp = vocab.keys.map(_.length).foldLeft(1)(math.max)
      val segs = UnigramSegmentTokens.segment(tok, m, maxCp, 50L)
      assert(segs.mkString == tok, s"coverage broken on '$tok': $segs")
      val cost = segs.map(s => vocab.getOrElse(s, 50L)).sum
      val (bc, bn) = bruteBest(tok, vocab, 50L)
      assert(cost == bc && segs.length == bn,
        s"'$tok' vocab=$vocab: got ($cost, ${segs.length}) " +
          s"expected ($bc, $bn) via $segs")
    }
  }
}
