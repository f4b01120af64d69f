package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic tests for the dedup/similarity operators: injected near-
  * duplicates must be found by MinHash-LSH and SimHash; ANN top-k must
  * agree with brute force. (Value parity for the SQL-expressible subset
  * is covered by the DuckDB oracle gate.) */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  /** documents ∪ near-copies of doc 0/1/2 (one word appended) with ids
    * 10000+i — known near-dup pairs (i, 10000+i). */
  private lazy val withDups = {
    val copies = docs.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" zzzz")))
    docs.unionAll(copies)
  }

  test("minhash LSH finds injected near-duplicates with high estimate") {
    val cands = TextOps.minhashCandidatesOn(
      TextOps.minhashSignaturesOn(withDups), minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val found = cands.filter { case (a, b, _) => b == a + 10000 }
    assert(found.length == 3, s"expected 3 injected pairs, got ${cands.toSeq}")
    assert(found.forall(_._3 >= 0.7))
  }

  test("minhash estimate approximates true shingle jaccard") {
    // identical docs → estimate 1.0
    val dup = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(555L))
    val cands = TextOps.minhashCandidatesOn(
      TextOps.minhashSignaturesOn(
        docs.filter(col("doc_id") === 0).unionAll(dup)), minEst = 0.5)
      .collect()
    assert(cands.length == 1 && cands(0).getDouble(2) == 1.0)
  }

  test("simhash: near-duplicates within small hamming distance") {
    val pairs = TextOps.simhashPairsOn(withDups, maxDist = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (0L to 2L).foreach { i =>
      assert(pairs.contains((i, i + 10000)), s"missing pair $i")
    }
  }

  test("ann top-k equals brute-force ranking") {
    val topk = TextOps.annCosineTopk(spark, TestSpark.sfDir).collect()
    assert(topk.length == 20)
    val sims = topk.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // brute force in Scala
    val all = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = all(0L)
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expTop = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(cos(q, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      }
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    assert(topk.map(_.getLong(0)).toSeq == expTop)
  }

  test("LSH+verify emits exactly the brute-force >=0.9 Jaccard pair set") {
    val got = TextOps.minhashVerifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ws = docs.filter(col("doc_id") < 1000)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val exp = (for {
      (a, wa) <- ws
      (b, wb) <- ws
      if a < b
      sh = (wa & wb).size
      j = BigDecimal(sh.toDouble / (wa.size + wb.size - sh))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.9
    } yield (a, b, j)).toSet
    // equality, not subset: LSH recall AND exact-verify precision
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("connected components equal brute-force union-find on the pairs") {
    val pairs = TextOps.minhashCandidatesOn(
      TextOps.minhashSignaturesOn(withDups), minEst = 0.5)
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = TextOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diff=${(expected.toSet -- got.toSet) ++ (got.toSet -- expected.toSet)}")
    // force the DISTRIBUTED path (smallGraphLimit=0) — must agree with
    // the driver union-find fast path on the same edges
    val gotDist = TextOps
      .connectedComponents(pairs, smallGraphLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == expected)
    // every cluster id is its own minimum member
    got.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("IVF (seeded centroids) recall@10 >= 0.9 probing < 50% of vectors") {
    val ivf = TextOps.annIvfTopk(spark, TestSpark.sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    val exact = TextOps.annCosineTopk(spark, TestSpark.sfDir).collect()
      .take(10).map(_.getLong(0)).toSet
    val recall = ivf.intersect(exact).size / 10.0
    val nCand = IvfIndex.candidates(spark, TestSpark.sfDir).count()
    val total = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet").count() - 1
    val frac = nCand.toDouble / total
    info(f"recall@10 = $recall%.2f, probe fraction = $frac%.2f")
    assert(recall >= 0.9,
      s"IVF recall@10 $recall < 0.9 (ivf=$ivf exact=$exact)")
    assert(frac < 0.5,
      f"IVF probed $frac%.2f of the corpus — the index is not pruning")
    // the index artifact is a catalog table with exactly K unit centroids
    val cents = spark.table(
      IvfIndex.centroidsTable(spark, TestSpark.sfDir)).collect()
    assert(cents.length == IvfIndex.K)
    cents.foreach { r =>
      val n = math.sqrt(
        r.getSeq[Float](1).map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid ${r.getInt(0)} norm $n")
    }
  }

  test("PQ (ADC + exact re-rank) recall@10 >= 0.9 with both index " +
      "artifacts persisted as catalog tables") {
    val pq = TextOps.queries("ann_pq_topk")(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(pq.size == 10)
    val exact = TextOps.annCosineTopk(spark, TestSpark.sfDir).collect()
      .take(10).map(_.getLong(0)).toSet
    val recall = pq.intersect(exact).size / 10.0
    info(f"PQ recall@10 = $recall%.2f (re-rank depth ${PqIndex.Rerank})")
    assert(recall >= 0.9,
      s"PQ recall@10 $recall < 0.9 (pq=$pq exact=$exact)")
    // codebook artifact: M*K2 codewords of SubDim floats
    val cb = spark.table(
      PqIndex.codebookTable(spark, TestSpark.sfDir)).collect()
    assert(cb.length == PqIndex.M * PqIndex.K2)
    assert(cb.forall(_.getSeq[Float](2).length == PqIndex.SubDim))
    // code artifact: one M-code row per vector, every code in [0, K2)
    val codes = spark.table(
      PqIndex.codesTable(spark, TestSpark.sfDir)).collect()
    val nVec = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet").count()
    assert(codes.length == nVec)
    assert(codes.forall(_.getSeq[Int](1)
      .forall(c => c >= 0 && c < PqIndex.K2)))
    // determinism: a second run reproduces the same ranking
    val again = TextOps.queries("ann_pq_topk")(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(again == pq)
  }

  test("identical vectors always share an LSH bucket") {
    val buckets = TextOps.annLshBuckets(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // deterministic: same vector → same bucket (re-run)
    val again = TextOps.annLshBuckets(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(buckets == again)
  }

  test("blocked simhash pairs equal the all-pairs result (pigeonhole)") {
    val sample = withDups.filter(col("doc_id") < 200 || col("doc_id") >= 10000)
    val exact = TextOps.simhashPairsOn(sample, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = TextOps.simhashPairsBlocked(sample, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == exact,
      s"blocked=${blocked.size} exact=${exact.size} " +
        s"diff=${(exact -- blocked) ++ (blocked -- exact)}")
  }

  test("LSH banding recalls every high-jaccard shingle pair") {
    // exact 3-word-shingle jaccard >= 0.9 (the quantity MinHash estimates)
    val sh = withDups
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sh", expr(
        """CASE WHEN size(ws) >= 3 THEN
          |  transform(sequence(1, size(ws) - 2),
          |            j -> concat(ws[j-1], ' ', ws[j], ' ', ws[j+1]))
          |ELSE array(concat_ws(' ', ws)) END""".stripMargin))
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.select(col("doc_id").as("da"), col("g"))
      .join(sh.select(col("doc_id").as("db"), col("g")), "g")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("shared") / (col("na") + col("nb") - col("shared")) >= 0.9)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain high-jaccard pairs")
    val cands = TextOps.minhashCandidatesOn(
      TextOps.minhashSignaturesOn(withDups), minEst = 0.5)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- cands
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("embedding near-dup pairs equal an exact BigInt brute force") {
    // recompute the hashed-TF vectors and the integer threshold
    // decision driver-side in BigInt — an independent oracle for the
    // whole pipeline (hashing, sparse fold, VecDotLong, predicate)
    val D = 256
    val texts = docs.filter(col("doc_id") < 1000)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val vecs = texts.map { case (id, t) =>
      val v = new Array[Long](D)
      t.split(" ", -1).filter(_.nonEmpty).foreach { w =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
        v((h % D).toInt) += (if (((h >> 8) & 1L) == 0L) 1L else -1L)
      }
      id -> v
    }
    val expected = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      (ida, a) = vecs(i)
      (idb, b) = vecs(j)
      dot = BigInt(a.zip(b).map { case (x, y) => x * y }.sum)
      n2a = BigInt(a.map(x => x * x).sum)
      n2b = BigInt(b.map(x => x * x).sum)
      if dot > 0 && 100 * dot * dot >= 81 * n2a * n2b
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    val got = TextOps.dedupEmbedding(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty, "fixture should contain near-dup doc pairs")
  }

  test("banded hyperplane LSH (32x8) recalls every emitted near-dup pair") {
    // pins the measurement in embeddingNearDupPairs' scaladoc: banding
    // the product's own plane grid (LshPlanes) over the TF vectors
    // recalls the FULL emitted pair set on this corpus — and prunes
    // almost nothing (the similarity mass sits at the threshold), which
    // is WHY the face verifies all pairs at the bounded oracle size
    import graft.functions.LshPlanes
    val D = 256; val bands = 32; val rowsPer = 8
    LshPlanes.ensure(bands * rowsPer, D)
    val vecs = TextOps.docTfVectors(docs.filter(col("doc_id") < 1000))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val sigs = vecs.map { case (id, v) =>
      id -> Array.tabulate(bands) { b =>
        var bits = 0
        for (j <- 0 until rowsPer) {
          val row = LshPlanes.row(b * rowsPer + j)
          var acc = 0.0
          for (i <- 0 until D) acc += v(i) * row(i)
          if (acc > 0.0) bits |= (1 << j)
        }
        bits
      }
    }
    val candidates = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if (0 until bands).exists(b => sigs(i)._2(b) == sigs(j)._2(b))
    } yield (math.min(sigs(i)._1, sigs(j)._1),
      math.max(sigs(i)._1, sigs(j)._1))).toSet
    val emitted = TextOps.dedupEmbedding(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = emitted -- candidates
    assert(missed.isEmpty, s"LSH missed emitted near-dup pairs: $missed")
    val allPairs = sigs.length.toLong * (sigs.length - 1) / 2
    info(s"candidate fraction: ${candidates.size}/$allPairs")
  }

  test("vec_dot_long is exact on values where a double dot would round") {
    import graft.functions.VectorOps
    import spark.implicits._
    // 2^53 + 1 is not representable as a double: a float dot would
    // round it away; the integer kernel must not
    val big = (1L << 53) + 1L
    val df = Seq((Array(big, 1L), Array(1L, -1L)))
      .toDF("a", "b")
    val dot = df.select(VectorOps.dotLong(col("a"), col("b")).as("d"))
      .collect().head.getLong(0)
    assert(dot == big - 1L)
  }

  test("exact dedup collapses injected exact copies") {
    val dup = docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 20000)
    val both = docs.unionAll(dup)
    val keep = both.groupBy(md5(lower(trim(col("text")))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
    assert(keep.filter(col("n") === 2).count() == 5)
    assert(keep.count() == docs.count())
  }

  test("repetition features match hand-computed values on crafted docs") {
    import spark.implicits._
    // "a b a b a" -> 2-grams [a b, b a, a b, b a]: 4 total, 2 distinct
    // -> dup frac 0.5; top word 'a' x3 of 5 -> 0.6; both gates fail.
    // "x y z w v" -> all unique: dup frac 0, top frac 0.2, keep.
    // "solo" -> no 2-grams: dup frac 0 (guarded), top frac 1.0, drop.
    val crafted = Seq(
      (1L, "a b a b a"), (2L, "x y z w v"), (3L, "solo"))
      .toDF("doc_id", "text")
    val byId = TextOps.repetitionFeatures(crafted)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(byId(1L) == ((5L, 0.5, 0.6, false)))
    assert(byId(2L) == ((5L, 0.0, 0.2, true)))
    assert(byId(3L) == ((1L, 0.0, 1.0, false)))
  }

  test("sorted-run top-word fold equals an explode+groupBy recompute") {
    val fold = TextOps.repetitionFeatures(docs)
      .select(col("doc_id"), col("top_word_frac"))
    val brute = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("nw"), col("w")).count()
      .groupBy(col("doc_id"), col("nw")).agg(max(col("count")).as("top"))
      .select(col("doc_id"),
        round(col("top") / col("nw").cast("double"), 4)
          .as("top_word_frac"))
    assert(fold.exceptAll(brute).isEmpty && brute.exceptAll(fold).isEmpty)
  }

  test("C4 line-dedup removes sentences occurring >=3 times and " +
      "rebuilds the cleaned text in order") {
    import spark.implicits._
    // "BOILER" appears in 3 docs -> removed everywhere; unique
    // sentences survive in original order (the synthetic corpus has no
    // repeated sentences, so the removal path needs this injection)
    val crafted = Seq(
      (1L, "keep one. BOILER. keep two"),
      (2L, "BOILER. other text"),
      (3L, "solo sentence. BOILER"),
      (4L, "fully unique. nothing shared"))
      .toDF("doc_id", "text")
    val out = TextOps.dedupLinesDf(crafted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1L) == ((3L, 2L, md5hex("keep one. keep two"))))
    assert(out(2L) == ((2L, 1L, md5hex("other text"))))
    assert(out(3L) == ((2L, 1L, md5hex("solo sentence"))))
    assert(out(4L) == ((2L, 2L, md5hex("fully unique. nothing shared"))))
  }

  test("decontamination flags exactly the docs sharing an eval shingle") {
    import spark.implicits._
    // eval doc 0 (id 0 % 97 == 0); corpus doc 1 repeats one of its
    // 3-word shingles, docs 2/3 share no shingle.
    val crafted = Seq(
      (0L, "s1", "alpha beta gamma delta"),
      (1L, "s1", "noise alpha beta gamma tail"),
      (2L, "s1", "wholly unrelated words here"),
      (3L, "s2", "another clean document entirely"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.decontaminateDocs(crafted)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("s1") == ((2L, 1L))) // docs 1,2 in corpus; 1 contaminated
    assert(out("s2") == ((1L, 0L)))
  }

  // shared driver-side recompute of the hashed-TF vectors (first 4 md5
  // bytes -> dim, 9th bit -> sign) used by the SemDeDup brute force
  private def bruteTfVecs(bound: Long): Array[(Long, Array[Long])] =
    docs.filter(col("doc_id") < bound)
      .select("doc_id", "text").collect()
      .map { r =>
        val v = new Array[Long](256)
        r.getString(1).split(" ", -1).filter(_.nonEmpty).foreach { w =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(w.getBytes("UTF-8"))
          val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
            ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
          v((h % 256).toInt) += (if (((h >> 8) & 1L) == 0L) 1L else -1L)
        }
        r.getLong(0) -> v
      }

  test("semantic dedup matches a BigInt brute force of the whole " +
      "bucket->rep->threshold pipeline") {
    val vecs = bruteTfVecs(1000L).filter(_._2.exists(_ != 0L))
    val signs = (0 until 16).map { p =>
      (0 until 256).map { i =>
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(s"p:$p:$i".getBytes("UTF-8"))
        if (((dig(0) & 0xff) % 2) == 0) 1L else -1L
      }.toArray
    }
    val buckets = vecs.map { case (id, v) =>
      val b = (0 until 16).map { p =>
        val dot = v.indices.map(i => v(i) * signs(p)(i)).sum
        if (dot > 0) 1L << p else 0L
      }.sum
      id -> b
    }.toMap
    val rep = buckets.groupBy(_._2).map { case (b, m) =>
      b -> m.keys.min
    }
    val vecMap = vecs.toMap
    val expected = vecs.map { case (id, v) =>
      val b = buckets(id)
      val r = rep(b)
      val rv = vecMap(r)
      val dot = BigInt(v.zip(rv).map { case (x, y) => x * y }.sum)
      val n2a = BigInt(v.map(x => x * x).sum)
      val n2r = BigInt(rv.map(x => x * x).sum)
      val kept = id == r ||
        !(dot > 0 && 25 * dot * dot >= 16 * n2a * n2r)
      (id, b, r, kept)
    }.toSet
    val got = TextOps.dedupSemantic(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.exists(!_._4), "fixture should drop at least one near-dup")
    assert(got.exists(_._4), "fixture should keep at least one doc")
  }

  test("similarity join retrieves the snippet's source at rank 1 and " +
      "gates on containment") {
    import spark.implicits._
    // probe = first 8 words of doc 0 (0 % 37 == 0). Doc 1 repeats the
    // probe's full prefix (containment 1.0), doc 2 shares half the
    // probe shingles, doc 3 nothing.
    val crafted = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 tail1 tail2"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 other words"),
      (2L, "w1 w2 w3 w4 unrelated suffix here now"),
      (3L, "nothing in common at all with it"))
      .toDF("doc_id", "text")
    val out = TextOps.similarityJoin(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    // 6 probe shingles; source and doc 1 contain all 6; doc 2 shares
    // "w1 w2 w3"/"w2 w3 w4" = 2/6 -> gated out
    assert(out((0L, 0L)) == ((1.0, 1)))
    assert(out((0L, 1L)) == ((1.0, 2)))
    assert(!out.contains((0L, 2L)) && !out.contains((0L, 3L)))
  }

  test("classifier scores equal a driver-side integer recompute") {
    val expected = docs.filter(col("doc_id") < 200)
      .select("doc_id", "text").collect().flatMap { r =>
        val ws = r.getString(1).split(" ", -1).filter(_.nonEmpty)
        if (ws.isEmpty) None else {
          val score = ws.map { w =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(w.getBytes("UTF-8"))
            val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
              ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
            val dim = (h % 1024).toInt
            val wd = java.security.MessageDigest.getInstance("MD5")
              .digest(s"dim:$dim".getBytes("UTF-8"))
            (((wd(0) & 0xffL) << 8) | (wd(1) & 0xffL)) % 17 - 8
          }.sum
          Some(r.getLong(0) -> (ws.length.toLong, score, score > 0))
        }
      }.toMap
    val got = TextOps.textClassifier(spark, TestSpark.sfDir)
      .filter(col("doc_id") < 200).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got == expected)
    // the md5-derived weights are sign-balanced, so both classes occur
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("substring dedup merges consecutive duplicated windows into " +
      "maximal spans") {
    import spark.implicits._
    // W=3 windows. Docs 1 and 2 share the 5-token run "p q r s t"
    // (positions 0-2 of doc 1's windows -> one maximal span of 5
    // tokens) and doc 1 additionally shares "u v w" with doc 3 at its
    // tail, SEPARATED from the first span by the unique token 'x1' ->
    // two distinct spans in doc 1, one each in docs 2 and 3. Doc 4 is
    // all-unique -> absent from the output.
    val crafted = Seq(
      (1L, "p q r s t x1 u v w"),
      (2L, "a1 p q r s t b1 c1 d1"),
      (3L, "u v w e1 f1 g1 h1 i1 j1"),
      (4L, "k1 l1 m1 n1 o1 q1 r1 s1 t1"))
      .toDF("doc_id", "text")
    val got = TextOps.substringDedup(crafted, w = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // doc 1: 9 tokens, spans [p..t]=5 toks + [u..w]=3 toks
    assert(got(1L) == ((9L, 2L, 8L, 0.8889)))
    assert(got(2L) == ((9L, 1L, 5L, 0.5556)))
    assert(got(3L) == ((9L, 1L, 3L, 0.3333)))
    assert(!got.contains(4L))
  }

  test("perplexity matches the hand-computed bigram model on a " +
      "crafted corpus") {
    import spark.implicits._
    // model: c(a,b)=2, c(a,c)=1 → c(a·)=3, context vocab V={a} → |V|=1
    // P(b|a) = (2+1)/(3+1) = 0.75; P(c|a) = (1+1)/(3+1) = 0.5
    val crafted = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextOps.perplexityOf(crafted).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got(1L) == ((1L, 0.2877, 1.33, true))) // -ln 0.75, e^nll
    assert(got(2L) == ((1L, 0.2877, 1.33, true)))
    assert(got(3L) == ((1L, 0.6931, 2.0, true)))  // -ln 0.5 → ppl 2
    // a single-word doc has no bigrams and is excluded, not scored 0
    val single = Seq((1L, "a b"), (2L, "solo")).toDF("doc_id", "text")
    assert(TextOps.perplexityOf(single).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
  }

  test("DSIR importance weights match the hand-computed two-model " +
      "ratio on a crafted corpus") {
    import spark.implicits._
    // corpus bigrams: (a,b)x2 (docs 1,2), (a,c)x1 (doc 3); target =
    // lang 'en' = doc 1 only. Models (add-one over the raw vocabulary
    // V=2): nr=3, nt=1.
    //   doc1/doc2 [(a,b)]: ln((1+1)/(1+2)) - ln((2+1)/(3+2)) = ln(10/9)
    //   doc3      [(a,c)]: ln((0+1)/(1+2)) - ln((1+1)/(3+2)) = ln(5/6)
    val crafted = Seq((1L, "en", "a b"), (2L, "de", "a b"),
      (3L, "de", "a c")).toDF("doc_id", "lang", "text")
    val got = TextOps.dsirOf(crafted, col("lang") === "en", 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.1054 && got(2L) == 0.1054) // ln(10/9) @ 4dp
    assert(got(3L) == -0.1823)                     // ln(5/6)  @ 4dp
    // a single-word doc has no bigram features and is excluded
    val single = Seq((1L, "en", "a b"), (2L, "de", "solo"))
      .toDF("doc_id", "lang", "text")
    assert(TextOps.dsirOf(single, col("lang") === "en", 100)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("DSIR resampling concentrates the target domain: the selected " +
      "set is mostly 'en' despite a ~44% base rate") {
    val sel = TextOps.dsirOf(docs, col("lang") === "en", 100).collect()
    assert(sel.length == 100)
    val enShare = sel.count(_.getString(1) == "en") / 100.0
    assert(enShare >= 0.7, s"en share $enShare — importance weights " +
      "no longer concentrate the target domain")
  }
}
