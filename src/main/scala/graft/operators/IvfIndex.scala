package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Seeded-centroid IVF index over the `embeddings` table — the real
  * inverted-file ANN layout (train centroids, probe nearest cells),
  * replacing the earlier multi-probe-LSH stand-in.
  *
  * Training is deterministic spherical k-means, no RNG anywhere:
  *  - seeds = the `K` vectors with the smallest multiplicative hash of
  *    `vec_id` (Knuth 2654435761 mod 2^32) — stable across runs,
  *    partitionings, and scale factors;
  *  - `Iters` Lloyd rounds: assign every vector to its max-dot centroid
  *    (one broadcast of K×dim floats + a per-row argmax — the same
  *    shape MLlib KMeans uses), then recompute each centroid as the
  *    renormalized mean of its members' unit vectors. Means reduce
  *    K×dim cells per round; the centroid matrix itself lives on the
  *    driver (K ≤ a few thousand at any realistic scale).
  *
  * The trained centroids are persisted to a graft catalog table
  * (`ann_centroids_t`) — the durable index artifact a 100 TB ANN
  * deployment ships from its indexing pipeline to query time.
  *
  * Query: read the centroid table, pick the `NProbe` cells nearest the
  * query vector, exact cosine only on vectors assigned to those cells.
  * Cell assignment is recomputed at query time here (K dots per vector,
  * map-side); a production layout would write `cell` out as the
  * partition key of an inverted list so probing prunes IO too. On the
  * near-isotropic synthetic embeddings the probed cells hold ~25-40% of
  * the corpus for recall@10 ≥ 0.9 (gated, with a < 50% probe-fraction
  * assert, in TextOpsSpec — down from ~64% with the LSH stand-in);
  * clustered real corpora probe far less for the same recall.
  */
object IvfIndex {
  val K = 16
  val Iters = 5
  val NProbe = 6

  /** Unit-normalize the float vector (double accumulation, cast back —
    * cosine becomes a plain dot product downstream). */
  private def normalized(c: String): Column = expr(
    // the norm is LET-BOUND via the single-element-array idiom: with
    // the aggregate inline under the per-element lambda, the
    // interpreted HOF chain re-folded the whole vector ONCE PER
    // ELEMENT (64 × 64 ops/row — 616 ms single-task over sf0.1's
    // 5000 vectors, r12 profile); bound, it folds once per row
    s"""transform(array(sqrt(aggregate($c, CAST(0 AS DOUBLE),
       |  (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))),
       |  n -> transform($c, x -> CAST(x / n AS FLOAT)))[0]"""
      .stripMargin)

  private def vecs(s: SparkSession, d: String): DataFrame =
    T(s, d, "embeddings")
      .select(col("vec_id"), normalized("embedding").as("vn"))

  /** Nearest-centroid id as a pure map-side expression: K codegen'd
    * dot products + an array_max argmax per row — no join, no row
    * blowup, no shuffle (ties → larger id, measure-zero on real data).
    * The centroid matrix rides along as literals (K×dim floats). */
  private def argmaxCid(cents: Seq[(Int, Seq[Float])]): Column =
    array_max(array(cents.map { case (cid, cv) =>
      struct(VectorOps.dot(col("vn"), lit(cv.toArray)).as("d"),
        lit(cid).as("c"))
    }: _*)).getField("c")

  /** One assignment pass: vec → nearest centroid id. */
  private[operators] def assign(vn: DataFrame,
      cents: Seq[(Int, Seq[Float])]): DataFrame =
    vn.withColumn("cid", argmaxCid(cents))

  private def centroidFrame(s: SparkSession,
      cents: Seq[(Int, Seq[Float])]): DataFrame = {
    import s.implicits._
    cents.toDF("cid", "cvec")
  }

  /** Deterministic spherical k-means over the normalized embeddings.
    * Returns the K (cid, unit-centroid) rows. */
  private def train(s: SparkSession, d: String): Seq[(Int, Seq[Float])] = {
    val vn = vecs(s, d).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = vn
        .withColumn("h", pmod(col("vec_id") * lit(2654435761L),
          lit(4294967296L)))
        .orderBy(col("h"), col("vec_id"))
        .limit(K).select(col("vn")).collect()
        .map(_.getSeq[Float](0))
      var cents: Seq[(Int, Seq[Float])] =
        seeds.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      for (_ <- 0 until Iters) {
        val assigned = assign(vn, cents)
        // per-cell per-dimension means: K×dim cells, collected to the
        // driver and renormalized in double precision
        val sums = assigned
          .select(col("cid"), posexplode(col("vn")).as(Seq("pos", "v")))
          .groupBy(col("cid"), col("pos"))
          .agg(avg(col("v")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
        cents = cents.map { case (cid, old) =>
          sums.get(cid) match {
            case Some(rows) =>
              val m = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
              val n = math.sqrt(m.map(x => x * x).sum)
              // an emptied cell keeps its previous centroid
              if (n == 0.0) (cid, old)
              else (cid, m.map(x => (x / n).toFloat).toSeq)
            case None => (cid, old)
          }
        }
      }
      cents
    } finally vn.unpersist()
  }

  private val builtCent =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Centroids as a graft catalog table (built once per sf dir, trusted
    * only at the full row count — same rebuild discipline as the other
    * catalog-backed queries). */
  def centroidsTable(s: SparkSession, d: String): String =
    builtCent.getOrElseUpdate(d, FixtureLock.build(d) {
      val ns = CatalogQueries.sfNamespace(s, d)
      val fqn = s"graft.$ns.ann_centroids_t"
      val exists = CatalogQueries.trusted(s, ns, "ann_centroids_t", K)
      if (!exists) {
        s.sql(
          s"""CREATE TABLE $fqn (cid INT, cvec ARRAY<FLOAT>)
             |TBLPROPERTIES('keyCols'='cid')""".stripMargin)
        centroidFrame(s, train(s, d))
          .createOrReplaceTempView(s"ivf_cent_src_${math.abs(d.hashCode)}")
        s.sql(s"INSERT INTO $fqn SELECT * FROM " +
          s"ivf_cent_src_${math.abs(d.hashCode)}")
      }
      fqn
    })

  /** Centroid rows + query vector cached per sf dir: the centroids are
    * a PERSISTED index (the catalog table above) and the query vector
    * is one row — re-collecting both per query was two spark jobs of
    * pure metadata, not index work. K×dim floats on the driver,
    * bounded like the training collect. */
  private val probeCache = scala.collection.concurrent.TrieMap[
    String, (Seq[(Int, Seq[Float])], Seq[Float])]()

  /** Vectors in the probed cells (candidate set), with the query vector
    * attached — shared by the top-k query and the probe-fraction gate. */
  def candidates(s: SparkSession, d: String,
      nProbe: Int = NProbe): DataFrame = {
    val vn = vecs(s, d)
    val (cents, q) = probeCache.getOrElseUpdate(d, FixtureLock.build(d) {
      val c = s.table(centroidsTable(s, d)).collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      val qv = vn.filter(col("vec_id") === 0).select(col("vn").as("qv"))
        .collect().head.getSeq[Float](0)
      (c, qv)
    })
    // probe selection on the driver: K dots against the catalog-stored
    // centroid rows (the "index lookup" of a real IVF)
    val probed = cents
      .sortBy { case (cid, cv) =>
        (-cv.zip(q).map { case (a, b) => a.toDouble * b }.sum, cid) }
      .take(nProbe).map(_._1).toSet
    assign(vn.filter(col("vec_id") =!= 0), cents)
      .filter(col("cid").isin(probed.toSeq: _*))
      .withColumn("qv", lit(q.toArray).cast("array<float>"))
  }

  /** IVF top-10 by exact cosine over the probed cells only. */
  def topk(s: SparkSession, d: String): DataFrame =
    candidates(s, d)
      .withColumn("sim", round(VectorOps.cosine(col("vn"), col("qv")), 4))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("sim"))

  // --------------------------------------------- inverted-list storage

  private val builtInv =
    scala.collection.concurrent.TrieMap[String, String]()

  /** The production IVF layout: vectors stored in a graft table KEYED
    * on (cell, vec_id) with one fixed region per cell, so probing a
    * cell IS region pruning — the scan never opens the files of
    * unprobed cells. This is what "inverted lists" mean in a
    * key-organized store: the index lookup becomes storage-level IO
    * elimination, the property that carries a 100 TB corpus
    * (recomputing assignments at query time, as [[candidates]] does,
    * reads everything and only saves compute). */
  def invertedTable(s: SparkSession, d: String): String =
    builtInv.getOrElseUpdate(d, FixtureLock.build(d) {
      val ns = CatalogQueries.sfNamespace(s, d)
      val fqn = s"graft.$ns.ann_ivf_t"
      val srcCount = T(s, d, "embeddings").count()
      val exists = CatalogQueries.trusted(s, ns, "ann_ivf_t", srcCount)
      if (!exists) {
        val cents = s.table(centroidsTable(s, d)).collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
        // one region per cell: fixed splits at every cid boundary
        val splits = (1 until K).mkString(";")
        s.sql(
          s"""CREATE TABLE $fqn (
             |  cid INT, vec_id BIGINT, vn ARRAY<FLOAT>)
             |TBLPROPERTIES('keyCols'='cid;vec_id',
             |              'regionSplits'='$splits')""".stripMargin)
        val v = s"ivf_inv_src_${math.abs(d.hashCode)}"
        assign(vecs(s, d), cents)
          .select(col("cid"), col("vec_id"), col("vn"))
          .createOrReplaceTempView(v)
        s.sql(s"INSERT INTO $fqn SELECT * FROM $v")
      }
      fqn
    })

  /** Same probe + exact-cosine as [[topk]], but candidates come from
    * the inverted-list table: `cid IN (probed)` prunes to the probed
    * regions (asserted in CatalogVectorSpec), `vec_id != 0` prunes via
    * the two-interval split on the trailing key dimension. */
  def topkStored(s: SparkSession, d: String): DataFrame = {
    val inv = invertedTable(s, d)
    val cents = s.table(centroidsTable(s, d)).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
    val q = vecs(s, d).filter(col("vec_id") === 0)
      .collect().head.getSeq[Float](1)
    val probed = cents
      .sortBy { case (cid, cv) =>
        (-cv.zip(q).map { case (a, b) => a.toDouble * b }.sum, cid) }
      .take(NProbe).map(_._1)
    s.table(inv)
      .filter(col("cid").isin(probed: _*) && col("vec_id") =!= 0)
      .withColumn("sim", round(VectorOps.cosine(col("vn"),
        lit(q.toArray)), 4))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("sim"))
  }
}
