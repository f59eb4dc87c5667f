package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextOps

/** [[TextOps.bpeTrain]] pinned against a naive index-walking reference
  * trainer: same pre-tokenization ([A-Za-z]+ runs, lowercased),
  * overlapping pair counts weighted by word frequency, argmax tie order
  * (count desc, pair asc), and greedy leftmost non-overlapping rewrite.
  * Repeated-letter runs are the adversarial case: the Catalyst fold must
  * merge 'aaaa' to [aa, aa] (take matches 1 and 3, not 1 and 2), exactly
  * like the reference's index walk.
  */
class BpeTrainSpec extends SparkSpec {
  import sqlImplicits._

  // ------------------------------------------------ naive reference
  private def words(text: String): Seq[String] =
    "[A-Za-z]+".r.findAllIn(text).map(_.toLowerCase).toSeq

  /** Greedy leftmost non-overlapping merge — the textbook index walk. */
  private def mergeWord(syms: Vector[String], lhs: String,
                        rhs: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naiveTrain(texts: Seq[String], merges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val wc = scala.collection.mutable.Map[String, Long]()
    texts.flatMap(words).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    var syms: Map[String, Vector[String]] =
      wc.keysIterator.map(w =>
        w -> w.split("").filter(_.nonEmpty).toVector).toMap
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to merges) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for {
        (w, f) <- wc
        v = syms(w)
        i <- 0 until v.length - 1
      } pc((v(i), v(i + 1))) = pc.getOrElse((v(i), v(i + 1)), 0L) + f
      val ((lhs, rhs), cnt) =
        pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      out += ((step, lhs, rhs, lhs + rhs, cnt))
      syms = syms.map { case (w, v) => w -> mergeWord(v, lhs, rhs) }
    }
    out.result()
  }

  private def trained(texts: Seq[String], merges: Int) =
    TextOps.bpeTrain(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  // ------------------------------------------------------ tests

  test("repeated-letter runs: greedy non-overlap, then merged-pair merge") {
    // 'aaaa' must rewrite to [aa, aa] after merge 1 — so merge 2 is
    // (aa, aa), NOT (aa, a) (which an overlapping or re-scanning
    // rewrite would produce)
    val out = trained(Seq("aaaa aaaa aaaa"), 2)
    assert(out.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((1, "a", "a", "aa"), (2, "aa", "aa", "aaaa")))
    // pair counts: 3 overlapping (a,a) pairs per word occurrence x 3
    assert(out.head._5 === 9L)
  }

  test("toy corpus equals the naive reference, case folded") {
    val texts = Seq(
      "the cat sat on the mat",
      "The THE the batter better",
      "aaa abab xaay ab ab ab",
      "letter better setter, wetter!")
    assert(trained(texts, 8) === naiveTrain(texts, 8))
  }

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("random small-alphabet corpora equal the naive reference") {
    // {a, b} words maximize repeated runs — the case where greedy
    // non-overlap semantics actually bite
    val genWord = for {
      n <- Gen.chooseNum(2, 8)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield cs.mkString
    val genDoc = Gen.listOfN(12, genWord).map(_.mkString(" "))
    for (seed <- Seq(11L, 23L, 47L)) {
      val texts = draw(Gen.listOfN(25, genDoc), seed)
      assert(trained(texts, 5) === naiveTrain(texts, 5),
        s"divergence from reference at seed $seed")
    }
  }

  test("training is deterministic across runs") {
    val texts = Seq("the cat sat", "the bat sat", "a cab fat cat")
    assert(trained(texts, 4) === trained(texts, 4))
  }

  test("training is partitioning-invariant (exact sums, total tie order)") {
    val texts = Seq(
      "the cat sat on the mat", "letter better setter",
      "aaa abab xaay ab ab ab", "the bat sat, a cab")
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TextOps.bpeTrain(base, 5).collect().map(_.toSeq).toSeq
    val b = TextOps.bpeTrain(base.repartition(7), 5)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("encode census equals naive per-doc tokenization, wordless kept") {
    val texts = Seq(
      "the cat sat on the mat",
      "letter better setter batter",
      "12345 !!!",                       // no word forms -> zero counts
      "aaaa abab the letter")
    val merges = 6
    // naive: train, then tokenize each doc's words with the final
    // vocabulary state (tokenization is a pure function of the word)
    val wc = scala.collection.mutable.Map[String, Long]()
    texts.flatMap(words).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    var syms: Map[String, Vector[String]] =
      wc.keysIterator.map(w =>
        w -> w.split("").filter(_.nonEmpty).toVector).toMap
    naiveTrain(texts, merges).foreach { case (_, lhs, rhs, _, _) =>
      syms = syms.map { case (w, v) => w -> mergeWord(v, lhs, rhs) }
    }
    val expect = texts.zipWithIndex.map { case (t, i) =>
      val ws = words(t)
      val nSub = ws.map(syms(_).length.toLong).sum
      val micro = if (ws.nonEmpty)
        math.floor(1e6 * nSub.toDouble / ws.length).toLong else 0L
      (i.toLong, ws.length.toLong, nSub, micro)
    }
    val got = TextOps.bpeEncode(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
  }
}
