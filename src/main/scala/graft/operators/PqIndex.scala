package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Product-quantization ANN over the `embeddings` table (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search", TPAMI —
  * re-expressed Spark-first): split each unit vector into `M`
  * subspaces, learn a `K2`-codeword codebook per subspace with the
  * same deterministic seeded k-means discipline as [[IvfIndex]], and
  * store each vector as `M` 4-bit codes (16×4 bits = 8 B logical per vector). Completes the ANN family:
  * brute force (the oracle), LSH (bucketed), IVF (region-pruned), PQ
  * (compressed-scan).
  *
  * Why PQ at 100 TB: IVF prunes WHICH vectors are read; PQ shrinks
  * WHAT is read per vector — 64 floats (256 B) become sixteen 4-bit codes (8 B logical),
  * a 32× scan-IO reduction, which is the difference between an ANN
  * sweep being IO-bound or not on a corpus whose vectors alone are
  * tens of TB. The two compose in a production IVFPQ layout; here
  * they are separate faces sharing the verification gates.
  *
  * Determinism, no RNG anywhere (same discipline as the IVF index):
  *  - codebook seeds = the `K2` vectors with the smallest
  *    multiplicative hash of `vec_id`, sliced per subspace;
  *  - `Iters` Lloyd rounds, assignment = argmin L2 (computed as
  *    argmax of `dot − ‖c‖²/2`, exactly equivalent), update = plain
  *    per-cell mean — the classic PQ objective (min quantization
  *    error), NOT spherical k-means: sub-vectors are not unit, and
  *    the codeword that minimizes ‖sv − c‖ best preserves every
  *    inner product computed against the code.
  *  - ties → larger codeword id (struct-max), measure-zero on data.
  *
  * Both index artifacts persist as graft catalog tables: the codebook
  * (`pq_codebooks_t`, M×K2 rows) and the code table (`pq_codes_t`,
  * one M-code row per vector — the compressed index a 100 TB
  * deployment scans instead of the raw vectors).
  *
  * Query (asymmetric distance computation): the M×K2 table of
  * query-subvector · codeword dots is computed on the DRIVER (M×K2 =
  * 256 doubles — the "index lookup"), shipped as a literal, and each
  * row's approximate score is M array lookups — a pure map-side
  * expression over the code table, no join, no vector arithmetic.
  * Top-`Rerank` candidates by approximate score are re-ranked with
  * exact cosine against the raw vectors (a semi-join on vec_id that
  * broadcasts the candidate ids), emitting the final top-10.
  * Correctness gate (TextOpsSpec): recall@10 vs brute force ≥ 0.9
  * with the full-precision reads bounded to `Rerank` vectors.
  */
object PqIndex {
  val M = 16      // subspaces → 4-dim sub-vectors over the 64-dim corpus
  val Dim = 64
  val SubDim = Dim / M
  val K2 = 16     // codewords per subspace → 4-bit codes (8 B/vector)
  val Iters = 4
  val Rerank = 100 // full-precision re-rank depth
  /** Index tables are name-stamped with the quantizer geometry, so a
    * constant change can never read a stale artifact (the row-count
    * trust check cannot see content drift in the code table). */
  private val Stamp = s"m${M}k$K2" 

  /** Unit-normalize (same let-bound expression as the IVF index's
    * loader — the inline form re-folded the norm once per element,
    * see IvfIndex.normalized). */
  private def normalized(c: String): Column = expr(
    s"""transform(array(sqrt(aggregate($c, CAST(0 AS DOUBLE),
       |  (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))),
       |  n -> transform($c, x -> CAST(x / n AS FLOAT)))[0]"""
      .stripMargin)

  private def vecs(s: SparkSession, d: String): DataFrame =
    T(s, d, "embeddings")
      .select(col("vec_id"), normalized("embedding").as("vn"))

  /** Exact re-rank of the broadcast candidate ids: join the RAW
    * vectors first, normalize after — normalizing before the join
    * would collapse into the scan-side projection and pay the
    * sqrt+fold over every corpus vector instead of only the `Rerank`
    * survivors (measured: the projection dominated the query). Same
    * expression, same values, Rerank/corpus of the work. */
  private def rerank(s: SparkSession, d: String, cand: DataFrame,
      q: Seq[Float]): DataFrame =
    T(s, d, "embeddings").join(broadcast(cand), "vec_id")
      .withColumn("vn", normalized("embedding"))
      .withColumn("sim",
        round(VectorOps.cosine(col("vn"), lit(q.toArray)), 4))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("sim"))

  private def subSlice(m: Int): Column =
    expr(s"slice(vn, ${m * SubDim + 1}, $SubDim)")

  /** Codeword id for subspace `m`: argmin‖sv−c‖ as a map-side
    * struct-max over `dot − ‖c‖²/2` (K2 codegen'd dots per subspace). */
  private def cidCol(cb: IndexedSeq[IndexedSeq[Seq[Float]]], m: Int): Column =
    array_max(array((0 until K2).map { k =>
      val c = cb(m)(k)
      val half = c.map(x => x.toDouble * x).sum / 2.0
      struct(
        (VectorOps.dot(subSlice(m), lit(c.toArray)) - lit(half)).as("d"),
        lit(k).as("c"))
    }: _*)).getField("c")

  /** Deterministic per-subspace k-means; one distributed job per
    * Lloyd round for ALL subspaces (assign map-side, posexplode to
    * (m, cid, sub-vector), one groupBy for every cell mean). */
  private def train(s: SparkSession, d: String)
      : IndexedSeq[IndexedSeq[Seq[Float]]] = {
    val vn = vecs(s, d).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = vn
        .withColumn("h", pmod(col("vec_id") * lit(2654435761L),
          lit(4294967296L)))
        .orderBy(col("h"), col("vec_id"))
        .limit(K2).select(col("vn")).collect()
        .map(_.getSeq[Float](0))
      var cb: IndexedSeq[IndexedSeq[Seq[Float]]] =
        (0 until M).map { m =>
          (0 until K2).map { k =>
            seeds(k).slice(m * SubDim, (m + 1) * SubDim)
          }
        }
      for (_ <- 0 until Iters) {
        val assigned = vn.select(
          posexplode(array((0 until M).map { m =>
            struct(cidCol(cb, m).as("cid"), subSlice(m).as("sv"))
          }: _*)).as(Seq("m", "sc")))
        val means = assigned
          .select(col("m"), col("sc.cid").as("cid"),
            posexplode(col("sc.sv")).as(Seq("pos", "v")))
          .groupBy(col("m"), col("cid"), col("pos"))
          .agg(avg(col("v")).as("mean"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        cb = (0 until M).map { m =>
          (0 until K2).map { k =>
            means.get((m, k)) match {
              case Some(rows) =>
                rows.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat).toSeq
              case None => cb(m)(k) // emptied cell keeps its codeword
            }
          }
        }
      }
      cb
    } finally vn.unpersist()
  }

  private val builtCb =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Codebooks as a graft catalog table keyed (m, cid) — the shipped
    * index artifact, M×K2 rows. */
  def codebookTable(s: SparkSession, d: String): String =
    builtCb.getOrElseUpdate(d, FixtureLock.build(d) {
      val ns = CatalogQueries.sfNamespace(s, d)
      val fqn = s"graft.$ns.pq_codebooks_${Stamp}_t"
      val exists = CatalogQueries.trusted(s, ns, s"pq_codebooks_${Stamp}_t", M * K2)
      if (!exists) {
        s.sql(
          s"""CREATE TABLE $fqn (m INT, cid INT, cvec ARRAY<FLOAT>)
             |TBLPROPERTIES('keyCols'='m;cid')""".stripMargin)
        import s.implicits._
        val cb = train(s, d)
        val rows = for (m <- 0 until M; k <- 0 until K2)
          yield (m, k, cb(m)(k))
        rows.toDF("m", "cid", "cvec")
          .createOrReplaceTempView(s"pq_cb_src_${math.abs(d.hashCode)}")
        s.sql(s"INSERT INTO $fqn SELECT * FROM " +
          s"pq_cb_src_${math.abs(d.hashCode)}")
      }
      fqn
    })

  private def loadCb(s: SparkSession, d: String)
      : IndexedSeq[IndexedSeq[Seq[Float]]] = {
    val rows = s.table(codebookTable(s, d)).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2))).toMap
    (0 until M).map(m => (0 until K2).map(k => rows((m, k))))
  }

  private val builtCodes =
    scala.collection.concurrent.TrieMap[String, String]()

  /** The compressed index: one M-code row per vector, keyed vec_id —
    * what a 100 TB ANN sweep scans instead of raw vectors (≤8 B vs
    * 256 B per row before encoding). */
  def codesTable(s: SparkSession, d: String): String =
    builtCodes.getOrElseUpdate(d, FixtureLock.build(d) {
      val ns = CatalogQueries.sfNamespace(s, d)
      val fqn = s"graft.$ns.pq_codes_${Stamp}_t"
      val srcCount = T(s, d, "embeddings").count()
      val exists = CatalogQueries.trusted(s, ns, s"pq_codes_${Stamp}_t", srcCount)
      if (!exists) {
        val cb = loadCb(s, d)
        s.sql(
          s"""CREATE TABLE $fqn (vec_id BIGINT, code ARRAY<INT>)
             |TBLPROPERTIES('keyCols'='vec_id')""".stripMargin)
        val v = s"pq_codes_src_${math.abs(d.hashCode)}"
        vecs(s, d)
          .select(col("vec_id"),
            array((0 until M).map(m => cidCol(cb, m)): _*).as("code"))
          .createOrReplaceTempView(v)
        s.sql(s"INSERT INTO $fqn SELECT * FROM $v")
      }
      fqn
    })

  private val queryCache = scala.collection.concurrent.TrieMap[
    String, (IndexedSeq[IndexedSeq[Seq[Float]]], Seq[Float])]()

  /** PQ top-10: ADC scan over the code table (M lookups/row into the
    * driver-built M×K2 dot table), exact re-rank of the top-`Rerank`. */
  def topk(s: SparkSession, d: String): DataFrame = {
    val codes = codesTable(s, d)
    val (cb, q) = queryCache.getOrElseUpdate(d, FixtureLock.build(d) {
      val c = loadCb(s, d)
      val qv = vecs(s, d).filter(col("vec_id") === 0)
        .collect().head.getSeq[Float](1)
      (c, qv)
    })
    // the ADC lookup table: lut[m*K2 + k] = q_m · c_{m,k}
    val lut = Array.tabulate(M * K2) { i =>
      val m = i / K2; val k = i % K2
      cb(m)(k).zipWithIndex.map { case (cv, j) =>
        cv.toDouble * q(m * SubDim + j)
      }.sum
    }
    val cand = s.table(codes)
      .filter(col("vec_id") =!= 0)
      .withColumn("score", adcScore(lit(lut)))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(Rerank)
      .select(col("vec_id"))
    rerank(s, d, cand, q)
  }

  /** score = Σ_m lut[m·K2 + code_m] as M array lookups per row. */
  private def adcScore(lutCol: Column): Column =
    aggregate(sequence(lit(0), lit(M - 1)), lit(0.0).cast("double"),
      (acc, m) => acc + element_at(lutCol,
        (m * lit(K2) + element_at(col("code"), m + lit(1)) + lit(1))
          .cast("int")))

  // ------------------------------------------------- IVFPQ composition

  private val builtIvfPq =
    scala.collection.concurrent.TrieMap[String, String]()

  /** The production IVFPQ layout (Jégou et al. 2011 §IV "IVFADC",
    * shared-codebook variant — codes quantize the raw vectors, not the
    * cell residuals, so the PQ code table and this one carry identical
    * codes and the two indexes share their training): PQ codes stored
    * in a graft table KEYED (cid, vec_id) with one region per IVF
    * cell. The two IO reductions now COMPOSE at the storage layer —
    * probing opens only `NProbe` of the K cell regions (region
    * pruning, same mechanism as [[IvfIndex.invertedTable]]) and every
    * row the probe does read is an 8-B-logical code instead of 256 B
    * of floats. At 100 TB this is the difference between an ANN query
    * reading ~40% × corpus-bytes and reading ~40% × corpus/32. */
  def ivfpqTable(s: SparkSession, d: String): String =
    builtIvfPq.getOrElseUpdate(d, FixtureLock.build(d) {
      val ns = CatalogQueries.sfNamespace(s, d)
      val tbl = s"ivfpq_codes_${Stamp}_t"
      val fqn = s"graft.$ns.$tbl"
      val srcCount = T(s, d, "embeddings").count()
      val exists = CatalogQueries.trusted(s, ns, tbl, srcCount)
      if (!exists) {
        val cb = loadCb(s, d)
        val cents = s.table(IvfIndex.centroidsTable(s, d)).collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
        val splits = (1 until IvfIndex.K).mkString(";")
        s.sql(
          s"""CREATE TABLE $fqn (cid INT, vec_id BIGINT, code ARRAY<INT>)
             |TBLPROPERTIES('keyCols'='cid;vec_id',
             |              'regionSplits'='$splits')""".stripMargin)
        val v = s"ivfpq_src_${math.abs(d.hashCode)}"
        IvfIndex.assign(vecs(s, d), cents)
          .select(col("cid"), col("vec_id"),
            array((0 until M).map(m => cidCol(cb, m)): _*).as("code"))
          .createOrReplaceTempView(v)
        s.sql(s"INSERT INTO $fqn SELECT * FROM $v")
      }
      fqn
    })

  /** The probed slice of the cell-keyed code table — the scan whose
    * partition count the region-pruning gate asserts (the code-table
    * scan is invisible inside the re-rank join's broadcast subtree in
    * the final plan). */
  def probedCodes(s: SparkSession, d: String): DataFrame = {
    val codesFqn = ivfpqTable(s, d)
    val (_, q) = queryCache.getOrElseUpdate(d, FixtureLock.build(d) {
      val c = loadCb(s, d)
      val qv = vecs(s, d).filter(col("vec_id") === 0)
        .collect().head.getSeq[Float](1)
      (c, qv)
    })
    val cents = s.table(IvfIndex.centroidsTable(s, d)).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
    val probed = cents
      .sortBy { case (cid, cv) =>
        (-cv.zip(q).map { case (a, b) => a.toDouble * b }.sum, cid) }
      .take(IvfIndex.NProbe).map(_._1)
    s.table(codesFqn)
      .filter(col("cid").isin(probed: _*) && col("vec_id") =!= 0)
  }

  /** IVFPQ top-10: probe the `NProbe` nearest cells (region-pruned
    * scan of the cell-keyed code table), ADC-score only the probed
    * rows, exact re-rank of the top-`Rerank`. */
  def ivfpqTopk(s: SparkSession, d: String): DataFrame = {
    val candSrc = probedCodes(s, d)
    val (cb, q) = queryCache(d)
    val lut = Array.tabulate(M * K2) { i =>
      val m = i / K2; val k = i % K2
      cb(m)(k).zipWithIndex.map { case (cv, j) =>
        cv.toDouble * q(m * SubDim + j)
      }.sum
    }
    val cand = candSrc
      .withColumn("score", adcScore(lit(lut)))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(Rerank)
      .select(col("vec_id"))
    rerank(s, d, cand, q)
  }
}
