package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized equivalence of the native text kernels against the SQL
  * chains they replaced: on adversarial strings (empty, all-spaces,
  * consecutive spaces, unicode multi-byte, single words) each kernel
  * must produce exactly the HOF expression's value — the per-corpus
  * hash gates prove parity on real data; this pins the edge cases a
  * synthetic corpus never hits. */
class KernelEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab αβ≤ c  dé "
    val random = (1 to 300).map(_ =>
      (1 to rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "αβ γδ αβ", "the a the", "ab" * 40, ("x " * 30).trim)
    (random ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def assertSame(name: String,
      kernel: org.apache.spark.sql.Column,
      sql: org.apache.spark.sql.Column): Unit = {
    val bad = corpus()
      .select(col("text"), kernel.as("k"), sql.as("s"))
      .filter(not(col("k") <=> col("s")))
      .limit(3).collect()
    assert(bad.isEmpty,
      s"$name diverges from the SQL chain on: ${bad.mkString(" | ")}")
  }

  test("shingle3_hashes == xxhash64 HOF chain") {
    assertSame("shingle3_hashes",
      VectorOps.shingle3Hashes(col("text")),
      expr("""CASE WHEN size(transform(split(text, ' '), x -> xxhash64(x))) >= 3 THEN
        |  transform(sequence(1, size(split(text, ' ')) - 2),
        |    j -> xxhash64(xxhash64(split(text, ' ')[j-1]),
        |                  xxhash64(split(text, ' ')[j]),
        |                  xxhash64(split(text, ' ')[j+1])))
        |ELSE array(xxhash64(transform(split(text, ' '), x -> xxhash64(x))))
        |END""".stripMargin))
  }

  test("word_hashes == filtered split chain") {
    assertSame("word_hashes",
      VectorOps.wordHashes(col("text")),
      expr("transform(filter(split(text, ' '), w -> w <> ''), " +
        "x -> xxhash64(x))"))
  }

  test("word_window_hashes == concat_ws window chain") {
    val w = 3
    assertSame("word_window_hashes",
      VectorOps.wordWindowHashes(col("text"), w),
      expr(s"""CASE WHEN size(split(text, ' ')) >= $w THEN
        |  transform(sequence(0, size(split(text, ' ')) - $w),
        |    j -> xxhash64(concat_ws(' ', slice(split(text, ' '), j + 1, $w))))
        |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
  }

  test("distinct_word_hashes == array_distinct split image") {
    assertSame("distinct_word_hashes",
      VectorOps.distinctWordHashes(col("text")),
      expr("transform(array_distinct(split(text, ' ')), x -> xxhash64(x))"))
  }

  test("distinct_gram_hashes == array_distinct substring image") {
    assertSame("distinct_gram_hashes",
      VectorOps.distinctGramHashes(col("text"), 3),
      expr("""transform(array_distinct(
        |  transform(sequence(1, greatest(length(text) - 2, 1)),
        |            i -> substring(text, i, 3))), g -> xxhash64(g))"""
        .stripMargin))
  }

  test("text_stats == the four HOF counts") {
    assertSame("text_stats",
      VectorOps.textStats(col("text"), Seq("the", "a")),
      expr("""transform(array(split(text, ' ')), ws -> struct(
        |  CAST(size(ws) AS INT) AS n_words,
        |  CAST(size(filter(ws, w -> w IN ('the', 'a'))) AS INT) AS n_stop,
        |  CAST(size(array_distinct(ws)) AS INT) AS n_distinct_words,
        |  CAST(IF(size(ws) >= 2,
        |    size(array_distinct(transform(sequence(1, size(ws) - 1),
        |         j -> concat(ws[j-1], ' ', ws[j])))), 0) AS INT)
        |    AS n_distinct_bigrams))[0]""".stripMargin))
  }

  test("winnow_keys == the md5 window-min chain") {
    val K = 8; val W = 4; val M = 1048576L
    // the SQL chain requires >= K+W-1 normalized chars, like the op
    val bad = corpus()
      .select(regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("n"))
      .filter(length(col("n")) >= K + W - 1)
      .select(col("n"),
        VectorOps.winnowKeys(col("n"), K, W).as("k"),
        expr(s"""array_distinct(transform(
          |  sequence(1, length(n) - ${K + W - 2}),
          |  s -> array_min(transform(sequence(s, s + ${W - 1}),
          |    i -> cast(conv(substr(md5(substring(n, i, $K)), 1, 10),
          |              16, 10) AS BIGINT) * $M - i))))""".stripMargin)
          .as("s"))
      .filter(not(col("k") <=> col("s")))
      .limit(3).collect()
    assert(bad.isEmpty, s"winnow_keys diverges on: ${bad.mkString(" | ")}")
  }

  test("winnow_keys matches the SQL chain across a (k, w) parameter " +
      "sweep, not just the default geometry") {
    for (k <- Seq(4, 8, 12); w <- Seq(2, 4, 7)) {
      val m = 1048576L
      val bad = corpus()
        .select(regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("n"))
        .filter(length(col("n")) >= k + w - 1)
        .select(col("n"),
          VectorOps.winnowKeys(col("n"), k, w).as("kk"),
          expr(s"""array_distinct(transform(
            |  sequence(1, length(n) - ${k + w - 2}),
            |  s -> array_min(transform(sequence(s, s + ${w - 1}),
            |    i -> cast(conv(substr(md5(substring(n, i, $k)), 1, 10),
            |              16, 10) AS BIGINT) * $m - i))))""".stripMargin)
            .as("s"))
        .filter(not(col("kk") <=> col("s")))
        .limit(1).collect()
      assert(bad.isEmpty, s"k=$k w=$w diverges on: ${bad.mkString}")
    }
  }

  test("shared_count == size(array_intersect) on long sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = (1 to rnd.nextInt(50)).map(_ => rnd.nextInt(40).toLong)
        .distinct.toArray
      val b = (1 to rnd.nextInt(50)).map(_ => rnd.nextInt(40).toLong)
        .distinct.toArray
      (a, b)
    }
    val bad = rows.toDF("a", "b")
      .select(VectorOps.sharedCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("s"))
      .filter(col("k") =!= col("s")).limit(3).collect()
    assert(bad.isEmpty, s"shared_count diverges: ${bad.mkString(" | ")}")
  }

  test("deletion_variant_hashes: distinct-hash count equals the " +
    "distinct string-variant count, and equal variants hash equal " +
    "across strings") {
    // the kernel hashes its own rolling-hash image, not the variant
    // strings, so the equivalence is structural: per string, the hash
    // SET is as large as the string-variant set (a wraparound
    // collision would shrink it); across strings, shared variants must
    // collide (the blocking property dedup_edit recall rests on)
    val hofVariants = expr(
      """array_distinct(concat(
        |  array(text),
        |  transform(sequence(1, greatest(length(text), 1)),
        |    i -> concat(substring(text, 1, i-1),
        |                substring(text, i+1, length(text)))),
        |  flatten(transform(sequence(1, greatest(length(text)-1, 1)),
        |    i -> transform(sequence(i+1, greatest(length(text), i+1)),
        |      j -> concat(substring(text, 1, i-1),
        |                  substring(text, i+1, j-i-1),
        |                  substring(text, j+1, length(text))))))))"""
        .stripMargin)
    val bad = corpus().filter(length(col("text")) >= 2)
      .select(col("text"),
        size(VectorOps.deletionVariantHashes(col("text"), 2)).as("k"),
        size(hofVariants).as("s"))
      .filter(col("k") =!= col("s")).limit(3).collect()
    assert(bad.isEmpty,
      s"variant-count mismatch: ${bad.mkString(" | ")}")
    // cross-string: a 2-edit mutant must share >=1 hash with its source
    import spark.implicits._
    val pairs = Seq(("abcdef", "abdef"), ("abcdef", "xbcdef"),
      ("abcdef", "abccdef"), ("αβγδ", "αγδx")).toDF("a", "b")
    val miss = pairs.select(
      size(array_intersect(
        VectorOps.deletionVariantHashes(col("a"), 2),
        VectorOps.deletionVariantHashes(col("b"), 2))).as("shared"))
      .filter(col("shared") === 0).collect()
    assert(miss.isEmpty, "2-edit mutant not blocked with its source")
  }

  test("word_tf_pairs == array_distinct + per-word count chain") {
    // same first-occurrence order as array_distinct, same empty-word
    // filter, tf = occurrences of the word among the non-empty tokens
    assertSame("word_tf_pairs",
      VectorOps.wordTfPairs(col("text")),
      expr("""transform(
        |  array_distinct(filter(split(text, ' '), w -> w <> '')),
        |  w -> named_struct('w', w,
        |    'tf', size(filter(split(text, ' '), x -> x = w))))""".stripMargin))
  }
}
