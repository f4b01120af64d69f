package graft.catalog

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized property over the combined column-DDL surface: a table
  * with a random CHECK range, a random DEFAULT, and a GENERATED column
  * receives random insert batches (values explicit, omitted, NULL, in
  * and out of the CHECK domain). The invariant, per batch: if ANY row
  * violates the constraint the whole INSERT fails and the table is
  * unchanged; otherwise every row lands with the default and the
  * generated value exactly as a driver-side recompute predicts. This
  * is the interaction coverage the single-feature specs cannot give
  * (default fills feeding CHECK evaluation feeding generated
  * expressions, all inside one write task). */
class ColumnDdlFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("random insert batches against random CHECK+DEFAULT+GENERATED " +
      "tables behave exactly like the driver-side model") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddlfuzz")
    val rnd = new Random(20260815L)
    (1 to 12).foreach { round =>
      val lo = rnd.nextInt(50)
      val hi = lo + 1 + rnd.nextInt(100)
      val dflt = lo + rnd.nextInt(hi - lo + 1) // default always legal
      val mod = 2 + rnd.nextInt(9)
      val fqn = s"graft.ddlfuzz.t$round"
      spark.sql(s"DROP TABLE IF EXISTS $fqn")
      spark.sql(s"CREATE TABLE $fqn (k BIGINT, " +
        s"qty BIGINT DEFAULT $dflt, " +
        s"g BIGINT GENERATED ALWAYS AS (k % $mod + coalesce(qty, 0)), " +
        s"CONSTRAINT qr CHECK (qty BETWEEN $lo AND $hi)) " +
        "TBLPROPERTIES('keyCols'='k')")

      // model state: rows committed so far, as (k, qty, g)
      var model = Vector.empty[(Long, Option[Long], Long)]
      (1 to 4).foreach { batch =>
        val rows = (1 to (1 + rnd.nextInt(5))).map { i =>
          val k = round * 1000L + batch * 100L + i
          rnd.nextInt(4) match {
            case 0 => (k, None) // omitted → default
            case 1 => (k, Some(-1L)) // NULL qty (CHECK passes on NULL)
            case _ => // explicit, sometimes violating
              (k, Some(lo - 5L + rnd.nextInt(hi - lo + 15).toLong))
          }
        }
        def sqlVal(q: Option[Long]) = q match {
          case None => s"DEFAULT"
          case Some(-1L) => "NULL"
          case Some(v) => v.toString
        }
        val values = rows.map { case (k, q) =>
          s"($k, ${sqlVal(q)}, NULL)" }.mkString(", ")
        val effective = rows.map { case (k, q) =>
          (k, q match {
            case None => Some(dflt.toLong)
            case Some(-1L) => None
            case Some(v) => Some(v)
          })
        }
        val violates = effective.exists { case (_, q) =>
          q.exists(v => v < lo || v > hi) }
        val attempt = scala.util.Try(
          spark.sql(s"INSERT INTO $fqn (k, qty, g) VALUES $values"))
        assert(attempt.isFailure == violates,
          s"round $round batch $batch: violates=$violates but " +
            s"attempt=${attempt}")
        if (!violates) model ++= effective.map { case (k, q) =>
          (k, q, k % mod + q.getOrElse(0L))
        }
        val got = spark.table(fqn).orderBy("k").collect().map(r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(2))).toVector
        assert(got == model.sortBy(_._1),
          s"round $round batch $batch: stored rows diverge from model")
      }
    }
  }
}
