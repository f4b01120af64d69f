package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Distributed BPE training ([[TextOps.bpeTrain]]) vs an INDEPENDENT
  * single-JVM reference implementation of the published algorithm
  * (Sennrich et al. 2016): the learned merge SEQUENCE — ranks, pairs,
  * and weighted counts — must match exactly. This is the gate the
  * driver cannot run (no SQL oracle can replay a sequential argmax
  * iteration), so it is strict here: any divergence in tie-breaking,
  * leftmost-first rewriting, or count weighting fails the equality. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference trainer: plain Scala collections, no Spark. */
  private def referenceBpe(texts: Seq[String], numMerges: Int,
      minPairCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var hist: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ "</w>") -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- hist; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), pc) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        if (pc < minPairCount) done = true
        else {
          out += ((rank, a, b, pc))
          hist = hist.toSeq.map { case (syms, c) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc(acc.size - 1) = a + b
              else acc += x
            }
            acc.toVector -> c
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  private def train(texts: Seq[String], n: Int, ce: Int = 16)
      : Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val df = texts.toDF("text")
    TextOps.bpeTrain(df, n, checkpointEvery = ce).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4)))
  }

  test("merge sequence matches the reference exactly on the driver " +
      "corpus (sf0.001 documents, 24 merges)") {
    val texts = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    assert(train(texts, 24) == referenceBpe(texts, 24))
  }

  test("tie-breaking is total and deterministic: equal-count pairs " +
      "resolve (left ASC, right ASC) in both implementations") {
    // every pair in "ab", "cd" appears exactly twice -> pure tie-break
    val texts = Seq("ab cd", "cd ab")
    val got = train(texts, 3)
    assert(got == referenceBpe(texts, 3))
    assert(got.head._2 == "a" && got.head._3 == "b",
      "lexicographically smallest pair wins the tie")
  }

  test("leftmost-first rewriting on runs: after merging (a,a), " +
      "'aaac' is [aa, a, c], never [a, aa, c]") {
    val texts = Seq.fill(5)("aaac")
    val got = train(texts, 2)
    assert(got == referenceBpe(texts, 2))
    assert(got.head._2 == "a" && got.head._3 == "a")
    // leftmost fold leaves [aa, a, c, </w>]: round-2 candidates are
    // (aa,a), (a,c), (c,</w>) all tied at 5, and (a,c) wins the
    // lexicographic tie. A rightmost fold would leave [a, aa, c, </w>]
    // and pick (a,aa) instead — this assertion separates them.
    assert(got(1)._2 == "a" && got(1)._3 == "c")
  }

  test("encode applies the learned merges in rank order: symbols " +
      "roundtrip to word + </w>, token counts shrink, and the trained " +
      "pairs are actually fused") {
    import spark.implicits._
    val texts = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val merges = train(texts, 12).map(m => (m._2, m._3))
    val df = texts.toDF("text")
      .selectExpr("monotonically_increasing_id() AS doc_id", "text")
    val enc = TextOps.bpeEncode(df, merges)
    val bad = enc.where(
      "concat_ws('', syms) <> concat(w, '</w>')").count()
    assert(bad == 0L, "every word's symbols must concatenate back")
    val before = TextOps.bpeEncode(df, Nil)
      .selectExpr("sum(size(syms))").collect().head.getLong(0)
    val after = enc.selectExpr("sum(size(syms))").collect().head.getLong(0)
    assert(after < before, "merges must reduce the corpus token count")
    // the top-ranked merged symbol must actually occur in the encoding
    val top = merges.head._1 + merges.head._2
    assert(enc.where(s"array_contains(syms, '${top.replace("'", "''")}')")
      .count() > 0L, s"top merge '$top' must appear as a token")
  }

  test("minPairCount stops the iteration early; lineage checkpointing " +
      "does not change the result") {
    val texts = Seq("xy xy xy", "zq")
    val got = train(texts, 10)
    assert(got == referenceBpe(texts, 10))
    assert(got.size < 10, "singleton pairs (count 1) must not merge")
    assert(train(texts, 10, ce = 1) == got,
      "per-iteration localCheckpoint is plan surgery, not semantics")
  }
}
