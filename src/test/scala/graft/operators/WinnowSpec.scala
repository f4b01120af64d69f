package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Winnowing fingerprints (Schleimer et al. 2003): the paper's two
  * guarantees, checked on crafted corpora —
  *  (1) COVERAGE: two documents sharing a substring of length
  *      ≥ t = K+W-1 share at least one selected (fp, gram) — winnowing
  *      never misses a long-enough match;
  *  (2) LOCALITY/shift-robustness: the selection inside a region
  *      depends only on the region's own grams, so prepending unrelated
  *      text still yields shared fingerprints for the common region
  *      (a fixed-stride sampler breaks under shift — the reason the
  *      paper exists);
  * plus the density bound (expected 2/(W+1)) within a loose band. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 8; private val W = 4

  private def fps(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    TextOps.winnowFingerprints(texts.toDF("doc_id", "text"), K, W)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  // deterministic filler with no shared 8-grams across calls
  private def filler(seed: Int, n: Int): String =
    Iterator.iterate(seed.toLong)(x => x * 6364136223846793005L + 1442695040888963407L)
      .map(x => ('a' + math.floorMod(x, 26)).toChar).take(n).mkString

  test("coverage: documents sharing a substring of length >= K+W-1 " +
      "share a fingerprint value; unrelated documents share none") {
    val shared = "thequickbrownfoxjumps" // 21 >= 11 after normalization
    val a = filler(1, 60) + shared + filler(2, 60)
    val b = filler(3, 60) + shared + filler(4, 60)
    val out = fps(Seq((1L, a), (2L, b)))
    val fa = out.collect { case (1L, _, fp) => fp }.toSet
    val fb = out.collect { case (2L, _, fp) => fp }.toSet
    assert((fa & fb).nonEmpty, "shared region must share a fingerprint")
    val c = filler(5, 140)
    val out2 = fps(Seq((1L, a), (3L, c)))
    val fc = out2.collect { case (3L, _, fp) => fp }.toSet
    assert((fa & fc).isEmpty, "no shared grams -> no shared fingerprints")
  }

  test("locality: a prefix shift does not lose the shared-region match " +
      "(positions move, fingerprint values survive)") {
    val shared = "plagiarismdetectionwindow"
    val base = filler(7, 50) + shared + filler(8, 50)
    val shifted = filler(9, 83) + shared + filler(10, 50)
    val out = fps(Seq((1L, base), (2L, shifted)))
    val f1 = out.collect { case (1L, _, fp) => fp }.toSet
    val f2 = out.collect { case (2L, _, fp) => fp }.toSet
    assert((f1 & f2).nonEmpty, "shift-robust: common region still matches")
  }

  test("density: selected fraction of grams tracks 2/(W+1) loosely") {
    val text = filler(11, 4000)
    val out = fps(Seq((1L, text)))
    val grams = text.length - K + 1
    val density = out.length.toDouble / grams
    val expected = 2.0 / (W + 1)
    assert(density > expected * 0.6 && density < expected * 1.6,
      s"density $density vs expected $expected")
  }

  test("span report: one injected shared region yields one span whose " +
      "matched mass tracks the region length; disjoint regions yield " +
      "two spans") {
    import spark.implicits._
    val shared = "thequickbrownfoxjumpsoverthelazydog" // 35 chars
    val one = Seq(
      (1L, filler(21, 60) + shared + filler(22, 60)),
      (2L, filler(23, 40) + shared + filler(24, 80)))
      .toDF("doc_id", "text")
    val r1 = TextOps.winnowSpans(one, minShared = 2, maxDf = 10)
      .collect()
    assert(r1.length == 1, s"one pair: ${r1.mkString}")
    val (n1, m1) = (r1.head.getLong(2), r1.head.getLong(3))
    assert(n1 >= 1 && n1 <= 2, s"~one span (boundary split allowed): $n1")
    assert(m1 >= 20 && m1 <= 50,
      s"matched mass ~ the 35-char region, got $m1")
    val sharedB = "packmyboxwithfivedozenliquorjugsnow"
    val two = Seq(
      (1L, filler(31, 50) + shared + filler(32, 50) + sharedB + filler(33, 40)),
      (2L, filler(34, 70) + shared + filler(35, 90) + sharedB + filler(36, 30)))
      .toDF("doc_id", "text")
    val r2 = TextOps.winnowSpans(two, minShared = 2, maxDf = 10)
      .collect()
    assert(r2.length == 1)
    val (n2, m2) = (r2.head.getLong(2), r2.head.getLong(3))
    assert(n2 >= 2, s"two disjoint regions -> >= 2 spans, got $n2")
    assert(m2 > m1, "two regions carry more matched mass than one")
  }

  test("ties select the rightmost minimum (robust winnowing): a " +
      "repeated gram run yields one fingerprint per window span, not " +
      "one per repeat") {
    // 'abcdefgh' repeated: every gram at stride 8 is identical, so
    // hashes tie; rightmost-tie selection keeps the count near the
    // density bound instead of selecting every tied copy
    val text = "abcdefgh" * 40
    val out = fps(Seq((1L, text)))
    val grams = text.length - K + 1
    assert(out.length < grams / 2,
      s"tie-handling must not select most grams (${out.length}/$grams)")
    // all selections of one hash value sit at distinct positions
    assert(out.map(_._2).distinct.length == out.length)
  }
}
