package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations at 100 TB scale.
  *
  * Two complementary tools:
  *  - **AQE skew-join** handles skew between a large table and another
  *    large table automatically (runtime partition splitting) — prefer
  *    it; nothing to code, just
  *    `spark.sql.adaptive.skewJoin.enabled=true` (default on).
  *  - **Salting** (here) handles the cases AQE cannot: skewed keys
  *    feeding a shuffled equi-join against a side SMALL enough to
  *    replicate per salt but too big to broadcast, and hot-key
  *    aggregations where one key overwhelms a single reducer.
  *
  * Both preserve exact join/aggregation semantics; salting trades a
  * `saltFactor`× replication of the dim side (or a second aggregation
  * pass) for even partition sizes.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted: the fact side gets a
    * random salt in [0, saltFactor), the dim side is replicated once
    * per salt value, and the join key becomes (key, salt) — a hot fact
    * key now spreads over `saltFactor` reducers instead of one.
    * Random salt never affects correctness (every fact row still meets
    * its dim rows exactly once, on its own salt copy). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // only fact-preserving join types: an unmatched DIM row exists once
    // per salt replica, so right/full outer would emit it saltFactor
    // times — for those, salt the other side
    require(Set("inner", "left", "leftouter", "left_outer", "cross")
      .contains(joinType.toLowerCase),
      "saltedJoin preserves semantics only for fact-preserving join " +
        s"types (inner/left/cross); got $joinType — salt the other " +
        "side for right/full outer")
    val saltCol = "__graft_salt"
    val saltedFact = fact.withColumn(saltCol,
      (rand(seed = 42) * saltFactor).cast("int"))
    val saltedDim = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact(saltCol) === saltedDim(saltCol),
        joinType)
      .drop(saltedDim(key)).drop(saltedFact(saltCol))
      .drop(saltedDim(saltCol))
  }

  /** Hot-key aggregation in two passes: partial-aggregate on
    * (key, salt) — spreading each hot key over `saltFactor` reducers —
    * then final-aggregate the partials on key. The caller supplies the
    * per-pass aggregates: `partial` computes from raw columns,
    * `merge` combines partials (e.g. sum/sum, count→sum). */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltCol = "__graft_salt"
    df.withColumn(saltCol, (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col(saltCol))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
