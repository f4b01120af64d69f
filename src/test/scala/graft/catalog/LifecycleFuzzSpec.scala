package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized region-lifecycle fuzz: a single table under a random
  * interleaving of data ops (disjoint-range INSERT, interval DELETE)
  * and layout ops (split / merge / compact / fold / vacuum) must at
  * every step answer exactly like a driver-side set model. The layout
  * ops are content-neutral BY CONTRACT — this is the test that the
  * contract survives their interactions (split of a merge output,
  * merge across a delete's boundary rewrite, compact over split
  * parts, vacuum between any two). Seeded: failures replay. */
class LifecycleFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableDir(): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("fuzz"), "life")).asInstanceOf[GraftTable].tableDir
  }

  test("randomized split/merge/delete/insert lifecycle matches a set model") {
    // deterministic by default; override to shake other interleavings
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(20260814L)
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fuzz")
    spark.sql("DROP TABLE IF EXISTS graft.fuzz.life")
    spark.sql(
      """CREATE TABLE graft.fuzz.life (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1')""".stripMargin)
    val fqn = "graft.fuzz.life"

    var model = Map.empty[Long, Double]
    var nextKey = 0L // inserts take fresh ranges: the table stays a set

    def insert(): Unit = {
      val n = 50 + rnd.nextInt(200)
      val a = nextKey; nextKey += n
      spark.sql(s"INSERT INTO $fqn SELECT id, id * 0.5 FROM range($a, ${a + n})")
      model ++= (a until a + n).map(k => k -> (k * 0.5))
    }
    def delete(): Unit = if (nextKey > 0) {
      val a = math.abs(rnd.nextLong()) % nextKey
      val b = math.min(nextKey, a + 1 + rnd.nextInt(300))
      spark.sql(s"DELETE FROM $fqn WHERE k >= $a AND k < $b")
      model = model.view.filterKeys(k => k < a || k >= b).toMap
    }
    def layout(): Unit = rnd.nextInt(5) match {
      case 0 =>
        val dir = tableDir()
        val szs = TableMeta.loadRegions(dir)
          .map(r => new java.io.File(dir, r.file).length())
        if (szs.nonEmpty) spark.sql(
          s"CALL graft.sys.split(table => 'fuzz.life', " +
            s"target_bytes => ${math.max(1024L, szs.max / 3)}L)")
      case 1 =>
        spark.sql("CALL graft.sys.merge(table => 'fuzz.life', " +
          "target_bytes => 1048576L)")
      case 2 =>
        spark.sql(s"CALL graft.sys.compact(table => 'fuzz.life', " +
          s"target_regions => ${1 + rnd.nextInt(4)})")
      case 3 => spark.sql("CALL graft.sys.fold(table => 'fuzz.life')")
      case 4 => spark.sql("CALL graft.sys.vacuum(table => 'fuzz.life')")
    }

    def check(full: Boolean): Unit = {
      val row = spark.sql(
        s"SELECT count(*), coalesce(sum(v), 0.0) FROM $fqn").head()
      assert(row.getLong(0) == model.size,
        s"row count diverged from model (${row.getLong(0)} vs ${model.size})")
      assert(math.abs(row.getDouble(1) - model.values.sum) < 1e-6)
      if (full && model.nonEmpty) {
        // exact content compare + a pruned point probe
        val got = spark.table(fqn).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == model, "table content diverged from model")
        val k = model.keys.toSeq(rnd.nextInt(model.size))
        val hit = spark.sql(s"SELECT v FROM $fqn WHERE k = $k")
        assert(hit.head().getDouble(0) == model(k))
        assert(hit.rdd.getNumPartitions == 1,
          s"point lookup at k=$k scanned more than one region")
      }
    }

    insert() // seed
    for (i <- 1 to 40) {
      rnd.nextInt(4) match {
        case 0 => insert()
        case 1 => delete()
        case _ => layout()
      }
      check(full = i % 8 == 0)
    }
    check(full = true)
    spark.sql("DROP TABLE graft.fuzz.life")
  }

  /** CDC fuzz: under the same random interleaving (plus vacuum), a
    * `changesFromVersion` read from ANY recorded earlier version must
    * either deliver EXACTLY the keys appended after it (pre-delete
    * images — the stream-consistent contract) or refuse loudly
    * (IllegalStateException: aged past the rewrite cycle / purged by
    * vacuum). Silent under- or over-delivery is the failure mode this
    * hunts — the changes resolution interacts with every layout op. */
  test("randomized lifecycle: changes reads are exact or refuse loudly") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(20260814L)
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed + 1)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fuzz")
    spark.sql("DROP TABLE IF EXISTS graft.fuzz.cdc")
    spark.sql(
      """CREATE TABLE graft.fuzz.cdc (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1')""".stripMargin)
    val fqn = "graft.fuzz.cdc"
    val dir = {
      val cat = spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[GraftCatalog]
      cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("fuzz"), "cdc")).asInstanceOf[GraftTable].tableDir
    }

    var nextKey = 0L
    // (version, keys appended up to that version)
    var marks = List.empty[(Long, Long)]

    def insert(): Unit = {
      val n = 50 + rnd.nextInt(150)
      val a = nextKey; nextKey += n
      spark.sql(
        s"INSERT INTO $fqn SELECT id, id * 0.5 FROM range($a, ${a + n})")
    }
    def delete(): Unit = if (nextKey > 0) {
      val a = math.abs(rnd.nextLong()) % nextKey
      val b = math.min(nextKey, a + 1 + rnd.nextInt(200))
      spark.sql(s"DELETE FROM $fqn WHERE k >= $a AND k < $b")
    }
    def layout(): Unit = rnd.nextInt(5) match {
      case 0 =>
        val szs = TableMeta.loadRegions(dir)
          .map(r => new java.io.File(dir, r.file).length())
        if (szs.nonEmpty) spark.sql(
          s"CALL graft.sys.split(table => 'fuzz.cdc', " +
            s"target_bytes => ${math.max(1024L, szs.max / 3)}L)")
      case 1 => spark.sql("CALL graft.sys.merge(table => 'fuzz.cdc', " +
        "target_bytes => 1048576L)")
      case 2 => spark.sql(s"CALL graft.sys.compact(table => 'fuzz.cdc', " +
        s"target_regions => ${1 + rnd.nextInt(3)})")
      case 3 => spark.sql("CALL graft.sys.fold(table => 'fuzz.cdc')")
      case 4 =>
        spark.sql("CALL graft.sys.vacuum(table => 'fuzz.cdc')").collect()
    }

    var exact = 0; var refused = 0
    def checkChanges(): Unit = if (marks.nonEmpty) {
      val (v, appendedAtV) = marks(rnd.nextInt(marks.size))
      try {
        val got = spark.read.option(GraftChanges.FromKey, v.toString)
          .table(fqn).select("k").collect().map(_.getLong(0)).toSet
        val want = (appendedAtV until nextKey).toSet
        assert(got == want,
          s"changes($v) diverged: missing=${(want -- got).take(5)} " +
            s"extra=${(got -- want).take(5)} " +
            s"(want ${want.size}, got ${got.size})")
        exact += 1
      } catch {
        case _: IllegalStateException => refused += 1 // loud refusal: pass
      }
    }

    insert()
    for (i <- 1 to 40) {
      rnd.nextInt(5) match {
        case 0 | 1 => insert()
        case 2 => delete()
        case _ => layout()
      }
      if (rnd.nextInt(3) == 0)
        marks ::= (TableMeta.currentVersion(dir), nextKey)
      checkChanges()
    }
    checkChanges()
    info(s"changes checks: $exact exact, $refused refused")
    assert(exact >= 5, "fuzz vacuous: almost every read refused")
    spark.sql("DROP TABLE graft.fuzz.cdc")
  }
}
