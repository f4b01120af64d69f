package graft.catalog

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the region bin packer (seeded-random loops, same
  * style as PruneSoundnessSpec): exactly-once coverage, order
  * preservation, and target respect (only singleton groups may exceed
  * it — a single file larger than the target must still be read). */
class GraftPackingSpec extends AnyFunSuite {

  private val rnd = new Random(99)
  private def randCase(): (List[Long], Long) = (
    List.fill(rnd.nextInt(200))(rnd.nextLong(1000)),
    1L + rnd.nextLong(2000))

  test("every item packed exactly once, in order") {
    (1 to 500).foreach { _ =>
      val (ws, target) = randCase()
      val items = ws.zipWithIndex
      val groups = GraftPacking.pack(items, (p: (Long, Int)) => p._1, target)
      assert(groups.flatten == items) // exactly once AND order preserved
      assert(groups.forall(_.nonEmpty))
    }
  }

  test("no multi-item group exceeds the target") {
    (1 to 500).foreach { _ =>
      val (ws, target) = randCase()
      val groups = GraftPacking.pack(ws, (w: Long) => w, target)
      groups.filter(_.size > 1).foreach { g =>
        assert(g.sum <= target, s"group $g over target $target")
      }
    }
  }

  test("uniform small items pack near the target density") {
    val groups = GraftPacking.pack(Seq.fill(100)(10L), (w: Long) => w, 100L)
    assert(groups.size == 10 && groups.forall(_.size == 10))
  }
}
