package graft.prune

import scala.util.Random

import org.apache.spark.sql.sources
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GraftFilters
import graft.codec.KeyCodec

/** Soundness property of the region pruner (seeded-random loops, same
  * style as KeyCodecSpec): for arbitrary predicate trees over two int
  * key dimensions and arbitrary region splits, a pruned region must
  * contain NO row satisfying the predicate. This is the invariant the
  * reference's CriticalPointsTestSuite checks with hand-picked cases —
  * here verified against a brute-force evaluator over random inputs.
  * (Completeness — pruning as much as possible — is a quality concern,
  * not a correctness one; soundness is what must never break.)
  */
class PruneSoundnessSpec extends AnyFunSuite {

  private val rnd = new Random(1234)
  private val dims = Map("k1" -> (0, IntegerType: org.apache.spark.sql.types.DataType),
    "k2" -> (1, IntegerType: org.apache.spark.sql.types.DataType))

  private def randLeaf(): sources.Filter = {
    val col = if (rnd.nextBoolean()) "k1" else "k2"
    val v = rnd.nextInt(100) - 50
    rnd.nextInt(6) match {
      case 0 => sources.EqualTo(col, v)
      case 1 => sources.GreaterThan(col, v)
      case 2 => sources.GreaterThanOrEqual(col, v)
      case 3 => sources.LessThan(col, v)
      case 4 => sources.LessThanOrEqual(col, v)
      case 5 => sources.In(col, Array.fill(1 + rnd.nextInt(3))(
        (rnd.nextInt(100) - 50): Any))
    }
  }

  private def randPred(depth: Int): sources.Filter =
    if (depth == 0 || rnd.nextInt(3) == 0) randLeaf()
    else if (rnd.nextBoolean())
      sources.And(randPred(depth - 1), randPred(depth - 1))
    else sources.Or(randPred(depth - 1), randPred(depth - 1))

  /** Brute-force evaluation of the V1 filter on a (k1, k2) row. */
  private def eval(f: sources.Filter, row: (Int, Int)): Boolean = {
    def v(col: String): Int = if (col == "k1") row._1 else row._2
    f match {
      case sources.And(l, r) => eval(l, row) && eval(r, row)
      case sources.Or(l, r) => eval(l, row) || eval(r, row)
      case sources.EqualTo(c, x) => v(c) == x.asInstanceOf[Int]
      case sources.GreaterThan(c, x) => v(c) > x.asInstanceOf[Int]
      case sources.GreaterThanOrEqual(c, x) => v(c) >= x.asInstanceOf[Int]
      case sources.LessThan(c, x) => v(c) < x.asInstanceOf[Int]
      case sources.LessThanOrEqual(c, x) => v(c) <= x.asInstanceOf[Int]
      case sources.In(c, xs) => xs.contains(v(c))
      case other => fail(s"unexpected $other")
    }
  }

  test("pruned regions are provably empty (1000 random scenarios)") {
    (1 to 1000).foreach { i =>
      val rows = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(100) - 50, rnd.nextInt(100) - 50))
        .sorted // region files are key-sorted
      val regionSize = 1 + rnd.nextInt(10)
      val regions = rows.grouped(regionSize).toSeq
      val pred = randPred(3)
      val constraints = GraftFilters.intervals(Seq(pred), dims)
      regions.foreach { rg =>
        val mins = Seq(KeyCodec.encode(IntegerType, rg.map(_._1).min),
          KeyCodec.encode(IntegerType, rg.map(_._2).min))
        val maxs = Seq(KeyCodec.encode(IntegerType, rg.map(_._1).max),
          KeyCodec.encode(IntegerType, rg.map(_._2).max))
        val kept = KeyRanges.survives(constraints, mins, maxs)
        if (!kept) {
          val matching = rg.filter(eval(pred, _))
          assert(matching.isEmpty,
            s"scenario $i: pruned region $rg has matches $matching " +
              s"under $pred (constraints $constraints)")
        }
      }
    }
  }

  test("full-dimension point predicates prune to at most the covering regions") {
    (1 to 200).foreach { _ =>
      val rows = Seq.fill(50)((rnd.nextInt(40), rnd.nextInt(40))).distinct.sorted
      val regions = rows.grouped(8).toSeq
      val target = rows(rnd.nextInt(rows.length))
      val pred = sources.And(sources.EqualTo("k1", target._1),
        sources.EqualTo("k2", target._2))
      val constraints = GraftFilters.intervals(Seq(pred), dims)
      val surviving = regions.filter { rg =>
        KeyRanges.survives(constraints,
          Seq(KeyCodec.encode(IntegerType, rg.map(_._1).min),
            KeyCodec.encode(IntegerType, rg.map(_._2).min)),
          Seq(KeyCodec.encode(IntegerType, rg.map(_._1).max),
            KeyCodec.encode(IntegerType, rg.map(_._2).max)))
      }
      // the region actually holding the row must survive (no false prune)
      assert(surviving.exists(_.contains(target)))
    }
  }
}
