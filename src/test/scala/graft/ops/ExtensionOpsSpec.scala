package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.testutil.SparkSuite

class ExtensionOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.t(spark, dir, "documents")

  test("minhash LSH candidates are a superset of true near-dup pairs (recall 1 at j>=0.8)") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8).select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, 0.8).select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("minhash candidate generation prunes the pair space") {
    val nDocs = docs.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = Dedup.candidatePairs(Dedup.shingles(docs)).count()
    assert(cands < allPairs / 10, s"LSH should prune: $cands vs $allPairs")
  }

  test("simhash: near-dup pairs have small hamming distance, random pairs large") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val nearPairs = Dedup.ngramJaccardPairs(docs, 0.8).select("a", "b").collect()
    assert(nearPairs.nonEmpty)
    val nearH = nearPairs.map(r => hamming(sh(r.getLong(0)), sh(r.getLong(1))))
    // random baseline: consecutive non-dup ids
    val nearSet = nearPairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val randH = (0L until 100L).filterNot(i => nearSet.contains((i, i + 1)))
      .map(i => hamming(sh(i), sh(i + 1)))
    assert(nearH.sum.toDouble / nearH.length < 8, s"near-dup mean hamming ${nearH.sum.toDouble / nearH.length}")
    assert(randH.sum.toDouble / randH.length > 16, s"random mean hamming ${randH.sum.toDouble / randH.length}")
  }

  test("connected components: chains, cliques, isolated pairs, convergence") {
    import spark.implicits._
    // path graph 1-2-3-4-5-6-7-8 (diameter 7 — exercises pointer jumping),
    // a triangle 20-21-22, and an isolated pair 30-31
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
    // edge direction must not matter
    val rev = Dedup.connectedComponents(
      pairs.select(col("b").as("a"), col("a").as("b"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev == got)
    // empty pair set → empty labeling, no crash
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
  }

  test("dupClusters groups transitive near-duplicates under the min doc_id") {
    val pairs = Dedup.minhashPairs(docs, 0.8).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dupClusters(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc is labeled, label is a member ≤ both endpoints' ids
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    // each cluster's label is itself a member of the cluster
    clusters.values.foreach(c => assert(clusters(c) == c))
  }

  test("ann LSH achieves recall >= 0.8 vs brute force") {
    val exact = Similarity.cosineTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLsh(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall") // Hamming-2 multiprobe over random data
  }

  test("range search: full precision, and recall >= 0.8 of the exact radius set") {
    val minCos = 0.3
    val got = Similarity.rangeSearch(spark, dir, nQueries = 10, minCos = minCos)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // exact radius ground truth from the brute-force top-k machinery's twin:
    // recompute all query-corpus cosines directly
    val emb = Tables.t(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = (for {
      q <- emb.keys.filter(_ < 10); n <- emb.keys if n != q
      c = cos(emb(q), emb(n)) if c >= minCos
    } yield (q, n)).toSet
    // PRECISION 1.0: every emitted pair really is inside the radius
    got.foreach { case ((q, n), cs) =>
      assert(cs >= minCos - 5e-5, s"($q,$n) cs=$cs")
      assert(exact.contains((q, n)), s"($q,$n) not in exact radius set")
    }
    // recall bounded by LSH bucketing, like s2
    val recall = got.map(_._1).toSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall of ${exact.size}")
  }

  test("filtered ANN: every hit satisfies the predicate; recall holds vs filtered brute force") {
    val emb = Tables.t(spark, dir, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("label").longValue(),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    val labelOf = emb.map(e => e._1 -> e._2).toMap
    val got = Similarity.filteredAnn(spark, dir, nQueries = 25)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2)))
    assert(got.nonEmpty)
    // the predicate is exact: every neighbor carries the query's label
    got.foreach { case (q, lbl, nb) =>
      assert(lbl == labelOf(q), s"row label $lbl != query label ${labelOf(q)}")
      assert(labelOf(nb) == lbl, s"neighbor $nb label ${labelOf(nb)} != $lbl")
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecOf = emb.map(e => e._1 -> e._3).toMap
    val exact = (for { q <- 0L until 25L } yield {
      val tops = emb.filter(e => e._1 != q && e._2 == labelOf(q))
        .map(e => (cos(vecOf(q), e._3), e._1)).sortBy(t => (-t._1, t._2)).take(5)
      tops.map(t => (q, t._2))
    }).flatten.toSet
    val recall = got.map(r => (r._1, r._3)).toSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"filtered recall $recall")
  }

  test("ann IVF achieves recall >= 0.8 vs brute force") {
    val exact = Similarity.cosineTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annIvf(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall") // 8-of-16 cells probed: random
    // gaussian data barely clusters, so IVF needs wide probes here; on real
    // clustered embeddings nprobe/nlist shrinks dramatically
  }

  test("pq: encode/decode kernels are exact on codebook-aligned vectors and codegen'd") {
    import graft.functions.PqExprs.{pq_decode, pq_encode}
    // deterministic tiny codebooks: 4 subspaces x 3 codes x 2 dims
    val cbs = Array.tabulate(4, 3, 2)((m, c, j) => (m * 100 + c * 10 + j).toDouble / 7.0)
    // build vectors that ARE centroid concatenations -> encode must return
    // exactly the chosen code pattern and decode must invert it
    val patterns = Seq(Seq(0, 1, 2, 0), Seq(2, 2, 1, 1), Seq(1, 0, 0, 2))
    import spark.implicits._
    val df = patterns.zipWithIndex
      .map { case (p, i) =>
        (i.toLong, p.zipWithIndex.flatMap { case (c, m) => cbs(m)(c).map(_.toFloat) }) }
      .toDF("id", "embedding")
    val got = df.select(col("id"), pq_encode(col("embedding"), cbs).as("codes"))
      .withColumn("dec", pq_decode(col("codes"), cbs))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2))).toSeq
    patterns.zipWithIndex.foreach { case (p, i) =>
      val (_, codes, dec) = got.find(_._1 == i).get
      assert(codes == p, s"encode mismatch for $p: $codes")
      // decode returns the codebook's DOUBLE centroids verbatim (the
      // float32 rounding of the input affects which code wins, never the
      // reconstruction values)
      val want = p.zipWithIndex.flatMap { case (c, m) => cbs(m)(c) }
      assert(dec == want)
    }
    // codegen: the kernels run inside a whole-stage span over a real scan
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val big = spark.range(40).toDF("id").withColumn("embedding",
        expr("transform(sequence(1, 8), j -> cast(sin(id * 8 + j) as float))"))
        .select(pq_encode(col("embedding"), cbs).as("codes"))
        .select(explode(col("codes")).as("c"))
      assert(big.queryExecution.executedPlan.toString.contains("*(1)"))
      val cs = big.collect().map(_.getInt(0))
      assert(cs.length == 160 && cs.forall(c => c >= 0 && c <= 2))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("pq: ADC ranking tracks the exact dot-product ranking") {
    import graft.functions.VectorExprs.vec_dot
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qa"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("nb_id").asc)
    val exact = emb.select(col("vec_id").as("nb_id"), col("embedding").as("ea"))
      .join(broadcast(q), col("nb_id") =!= col("q_id"))
      .withColumn("s", vec_dot(col("qa"), col("ea")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random gaussian 64-dim data is PQ's worst case (no cluster structure,
    // 8 subspaces x 16 codes = 32x compression — measured ~0.16 recall@5
    // here vs a ~0.0025 chance rate, i.e. ~60x above random): the bar
    // asserts the ADC signal is real, not that the toy configuration is
    // production-tuned (production uses 16-32 subspaces and 256 codes)
    assert(recall >= 0.08, s"recall $recall")
  }

  test("m10 scene detection respects the planted scene structure") {
    val rows = Multimodal.modalScenes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nFrames, nCuts, cutE) =>
      assert(nFrames % 3 == 0, s"doc $id: frames not scene-aligned")
      // cuts can only sit at the nFrames/3 - 1 scene boundaries (in-scene
      // frames are bit-identical after the AVI roundtrip → energy 0)
      assert(nCuts <= nFrames / 3 - 1, s"doc $id: cut inside a scene")
      assert((nCuts == 0) == (cutE == 0L), s"doc $id: energy/cut mismatch")
    }
    // the fixture is non-degenerate: most docs cut at EVERY boundary
    assert(rows.count { case (_, nF, nC, _) => nC == nF / 3 - 1 } > rows.length / 2)
  }

  test("d13 containment finds planted quotes that symmetric Jaccard misses") {
    val pairs = Dedup.containmentPairs(Tables.t(spark, dir, "documents"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // quote→source pairs exist and are PERFECT containment (subset shingles)
    val sourcePairs = pairs.filter { case (a, b, _, q) => q && b == a + Dedup.QuoteIdOffset }
    assert(sourcePairs.nonEmpty)
    assert(sourcePairs.forall(_._3 == 1.0),
      s"quote-of-source containment must be exactly 1.0: ${sourcePairs.filter(_._3 != 1.0).toSeq}")
    // ...and at least some of them are invisible to symmetric near-dup at
    // the same corpus: a 30% prefix sits near J≈0.3, far under the 0.8 bar
    val jac = Dedup.ngramJaccardPairs(
        Dedup.withQuotes(Tables.t(spark, dir, "documents")), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sourcePairs.exists { case (a, b, _, _) => !jac((a, b)) },
      "every planted quote pair was also a Jaccard near-dup — fixture degenerate")
  }

  test("ivf-refine: exact re-rank recall@5 at least matches plain IVFADC recall@5") {
    import graft.functions.VectorExprs.vec_dot
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qa"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("nb_id").asc)
    val exact = emb.select(col("vec_id").as("nb_id"), col("embedding").as("ea"))
      .join(broadcast(q), col("nb_id") =!= col("q_id"))
      .withColumn("s", vec_dot(col("qa"), col("ea")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.ivfAdcTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = Similarity.ivfRefineTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rAdc = (exact intersect adc).size.toDouble / exact.size
    val rRef = (exact intersect ref).size.toDouble / exact.size
    // refine re-ranks the ADC shortlist by TRUE score: every ground-truth
    // neighbor the shortlist contains must surface in the final top-k, so
    // refine recall can only match or beat plain ADC recall
    assert(rRef >= rAdc, s"refine recall $rRef < adc recall $rAdc")
    assert(rRef > 0.2, s"refine recall $rRef implausibly low")
  }

  test("audio: WAV roundtrip through javax.sound is lossless; corrupt container fails loudly") {
    val smp = Multimodal.synthSamples(42L)
    val wav = Multimodal.wavEncode(smp)
    // a real RIFF/WAVE container came out of the encoder
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (decoded, sr, ch, bits) = Multimodal.wavDecode(wav)
    assert((sr, ch, bits) == (16000, 1, 16))
    assert(decoded.toSeq == smp.toSeq, "PCM16 WAV roundtrip must be bit-exact")
    // a corrupted container is a loud failure, not silent garbage
    val broken = wav.clone(); broken(0) = 'X'.toByte
    intercept[Exception](Multimodal.wavDecode(broken))
  }

  test("m5 allocation-flat kernel == reference wavDecode(wavEncode(synth)) features") {
    // the r11 in-place RIFF parse + scratch-buffer kernel must emit, for
    // every document, exactly what the original per-row-allocating
    // formulation emitted — recomputed here from the independent
    // wavEncode/wavDecode pair (javax.sound on the decode side too)
    val got = Multimodal.modalAudio(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, r) =>
      val (smp, sr, ch, bits) = Multimodal.wavDecode(Multimodal.wavEncode(Multimodal.synthSamples(id)))
      var sumSq = 0L; var peak = 0L; var zeroX = 0L
      var i = 0
      while (i < smp.length) {
        val s = smp(i).toLong
        sumSq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && ((s < 0) != (smp(i - 1) < 0))) zeroX += 1
        i += 1
      }
      val rms = BigDecimal(math.sqrt(sumSq.toDouble / smp.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((sr, ch, bits)), s"doc $id header")
      assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
        ((smp.length.toLong, peak, sumSq, zeroX)), s"doc $id integer features")
      assert(r.getDouble(8) == rms, s"doc $id rms")
    }
  }

  test("sq8: codes bounded to [-127,127], tinyint kernel exact, ranking tracks float cosine") {
    import graft.functions.VectorExprs.vec_cosine
    val emb = Tables.t(spark, dir, "embeddings")
    val coded = Similarity.sq8Codes(emb)
    // bounds + element type
    val mx = coded.select(expr("max(array_max(transform(codes, c -> abs(CAST(c AS INT)))))")).head.getInt(0)
    assert(mx <= 127)
    assert(coded.schema("codes").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
    // the tinyint codegen kernel must agree exactly with double-cast codes
    val pair = coded.limit(2).collect().map(_.getSeq[Byte](coded.schema.fieldIndex("codes")))
    val viaKernel = coded.as("a").limit(1).crossJoin(coded.as("b").limit(2))
      .select(vec_cosine(col("a.codes"), col("b.codes"))).collect().map(_.getDouble(0))
    val viaDouble = coded.as("a").limit(1).crossJoin(coded.as("b").limit(2))
      .select(vec_cosine(
        expr("transform(a.codes, c -> CAST(c AS DOUBLE))"),
        expr("transform(b.codes, c -> CAST(c AS DOUBLE))"))).collect().map(_.getDouble(0))
    assert(viaKernel.toSeq == viaDouble.toSeq)
    // quantized top-5 overlaps the exact float top-5 (int8 error is small)
    val exact = Similarity.cosineTopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.sq8TopK(spark, dir).select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = (exact intersect sq8).size.toDouble / exact.size
    assert(agree >= 0.6, s"sq8 agreement with float ranking: $agree")
  }

  test("hot LSH buckets are width-capped: degenerate buckets cannot go quadratic") {
    // a cap of 1 forbids any 2-member bucket: the SELF-join can't produce a
    // single pair — proves the cap path actually filters
    assert(Similarity.embeddingDupPairs(spark, dir, 0.2, maxBucketWidth = 1).count() == 0)
    // the ANN join is query×candidate (singleton buckets still pair with a
    // probing query), so only a cap of 0 empties it
    assert(Similarity.annLsh(spark, dir, maxBucketWidth = 0).count() == 0)
    assert(Similarity.annLsh(spark, dir, maxBucketWidth = 1).count() <=
      Similarity.annLsh(spark, dir).count())
    // and the default cap changes nothing at this scale (documented bound)
    val capped = Similarity.embeddingDupPairs(spark, dir, 0.2).count()
    val uncapped = Similarity.embeddingDupPairs(spark, dir, 0.2, maxBucketWidth = Int.MaxValue).count()
    assert(capped == uncapped)
  }

  test("embeddingDupPairs finds bucket-colliding similar pairs exactly") {
    val pairs = Similarity.embeddingDupPairs(spark, dir, 0.2).collect()
    pairs.foreach(r => assert(r.getDouble(2) >= 0.2))
    // no duplicates despite multi-table union
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length)
  }

  test("native simhash_agg equals the 64-column sum formulation; SQL-callable") {
    val viaAgg = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCols = Dedup.simhashColumns(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaAgg == viaCols)
    // SQL registration path (partial + final aggregation through the planner)
    graft.functions.SimhashAgg.register(spark)
    docs.createOrReplaceTempView("simhash_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash_agg(CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)) AS simhash FROM (
        |  SELECT doc_id, explode(transform(sequence(1, size(toks) - 2),
        |    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))) AS shingle
        |  FROM (SELECT doc_id, split(text, '\\s+') AS toks FROM simhash_docs)
        |  WHERE size(toks) >= 3) s
        |GROUP BY doc_id""".stripMargin)
    // the view-based shingles are not distinct'ed, so compare a stable doc
    // against the engine path recomputed the same way
    assert(viaSql.count() == docs.filter(size(split(col("text"), "\\s+")) >= 3).count())
  }

  test("bpe: mergePair is greedy left-to-right non-overlapping") {
    def m(s: Seq[String], l: String, r: String) = TextOps.mergePair(s.toArray, l, r).toSeq
    // leftmost-first, no re-merge of merged output
    assert(m(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(m(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(m(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(m(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // merged symbol may seed a LATER rank but never re-merges in-pass
    assert(m(Seq("ab", "ab"), "ab", "ab") == Seq("abab"))
    assert(m(Seq.empty, "a", "b") == Seq.empty)
  }

  test("bpe: fit learns the most frequent pair first and encode applies ranks in order") {
    import spark.implicits._
    val tiny = Seq((1L, "aaab aaab aaab"), (2L, "aaab ccc"), (3L, "ccc")).toDF("doc_id", "text")
    val merges = TextOps.fitBpeMerges(tiny, nMerges = 3, cap = 100)
    assert(merges.nonEmpty)
    // "aaab" occurs 4x: pairs (a,a) weight 8, (a,b) 4, (c,c) weight 4 over
    // "ccc"(2x) + " ccc"... the clear winner is (a,a)
    assert(merges.head == ("a", "a"))
    // encoding shrinks and is consistent with a manual replay
    val n = TextOps.bpeSymbolCount("aaab", merges)
    var syms = "aaab".toCharArray.map(_.toString)
    merges.foreach { case (l, r) => syms = TextOps.mergePair(syms, l, r) }
    assert(n == syms.length && n < 4)
    // determinism: same corpus, same merges
    assert(TextOps.fitBpeMerges(tiny, nMerges = 3, cap = 100).toSeq == merges.toSeq)
  }

  test("bpe: corpus fit compresses real documents and caps are honored") {
    val merges = TextOps.fitBpeMerges(docs, nMerges = 30, cap = 5000)
    assert(merges.length == 30, "500 real docs easily support 30 merges")
    val out = TextOps.bpeEncode(spark, dir).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val (nTok, nChar, nSym) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSym <= nChar, "merges can only shrink")
      assert(nSym >= nTok, "each token keeps at least one symbol")
    }
  }

  test("fingerprints are deterministic and discriminative") {
    val fp1 = TextOps.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp2 = TextOps.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp1 == fp2)
    assert(fp1.values.toSet.size > 450, "distinct docs should mostly have distinct fingerprints")
  }

  test("rollingHashes matches a direct polynomial evaluation") {
    val Mod = BigInt(2).pow(61) - 1
    val text = "hello world of rolling hashes"
    val k = 8
    val got = TextOps.rollingHashes(text, k)
    val want = (0 to text.length - k).map { i =>
      text.substring(i, i + k).foldLeft(BigInt(0))((acc, c) => (acc * 257 + c.toInt) mod Mod).toLong
    }
    assert(got.toSeq == want)
  }

  test("langId output is total, deterministic, confidence in [0,1]") {
    val out = TextOps.langId(docs).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      assert(TextOps.LangProfiles.contains(r.getString(1)))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("multimodal: resize emits exact nearest-neighbor bytes and dims") {
    val assets = Multimodal.assets(docs)
    val resized = Multimodal.resizeImages(assets).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(resized.nonEmpty)
    resized.values.foreach(p => assert(p.length == 32 * 24))
    // byte-exact check for one known doc against a direct computation
    val row = assets.filter(col("doc_id") === 3).select("payload", "meta.width", "meta.height")
      .collect().head
    val expect = Multimodal.nnResize(row.getAs[Array[Byte]](0), row.getInt(1), row.getInt(2), 32, 24)
    assert(resized(3L).sameElements(expect))
  }

  test("video: AVI roundtrip is lossless, headers parsed, corrupt container fails loudly") {
    val payload = "the quick brown fox jumps over the lazy dog 0123456789".getBytes("UTF-8")
    val frames = (0 until 5).map(Multimodal.synthFrame(payload, _))
    val avi = Multimodal.aviEncode(frames, Multimodal.VideoW, Multimodal.VideoH, 12)
    // a real RIFF/AVI container came out of the writer
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val (decoded, w, h, fps) = Multimodal.aviDecode(avi)
    // header-declared geometry and rate survive the roundtrip
    assert((w, h, fps) == (Multimodal.VideoW, Multimodal.VideoH, 12))
    assert(decoded.length == frames.length)
    // every frame bit-exact through bottom-up storage + stride de-pad
    // (VideoW=30 forces a stride of 32, so a parser ignoring padding shears)
    decoded.zip(frames).foreach { case (d, f) => assert(d.sameElements(f)) }
    // corrupted container / truncated chunk are loud failures
    val broken = avi.clone(); broken(0) = 'X'.toByte
    intercept[Exception](Multimodal.aviDecode(broken))
    intercept[Exception](Multimodal.aviDecode(java.util.Arrays.copyOf(avi, avi.length - 7)))
  }

  test("video: DIB layout stores rows bottom-up with 4-byte stride") {
    val w = Multimodal.VideoW; val h = Multimodal.VideoH
    val raster = Array.tabulate[Byte](w * h)(i => (i % 251).toByte)
    val dib = Multimodal.dibFromRaster(raster, w, h)
    assert(dib.length == 32 * h) // stride 32 for w=30
    // first stored row is the LAST raster row; pad bytes untouched (zero)
    assert(dib.slice(0, w).sameElements(raster.slice((h - 1) * w, h * w)))
    assert(dib(w) == 0 && dib(w + 1) == 0)
    assert(Multimodal.rasterFromDib(dib, w, h, bottomUp = true).sameElements(raster))
  }

  test("multimodal: sampled frames carry parsed headers and every-2nd decoded frames") {
    val assets = Multimodal.assets(docs)
    val frames = Multimodal.sampleFrames(assets).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getLong(0))
    val (docId, fs) = byDoc.maxBy(_._2.length)
    val payload = assets.filter(col("doc_id") === docId).select("payload")
      .collect().head.getAs[Array[Byte]](0)
    assert(fs.length == (Multimodal.videoFrameCount(docId) + 1) / 2)
    fs.foreach { r =>
      val f = r.getLong(1).toInt
      assert(f % 2 == 0)
      assert((r.getInt(2), r.getInt(3), r.getInt(4)) ==
        (Multimodal.VideoW, Multimodal.VideoH, Multimodal.videoFps(docId)))
      // decoded frame content equals the closed-form synthesis
      assert(r.getAs[Array[Byte]]("frame").sameElements(Multimodal.synthFrame(payload, f)))
    }
  }

  test("multimodal: feature extraction preserves rows, shapes, determinism") {
    val assets = Multimodal.assets(docs)
    assert(assets.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(assets)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Double]]("feat").length == Multimodal.FeatureDim)
      assert(r.getAs[Int]("byte_len") > 0)
    }
    // image checksum = md5 of the closed-form tiled raster, computed here
    // WITHOUT the codec — equality proves the engine's PNG encode→decode
    // roundtrip returned the exact source pixels (doc 0 is image modality)
    val d0 = docs.filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val tiled = Multimodal.tileRaster(d0.getBytes("UTF-8"), Multimodal.ThumbW, Multimodal.ThumbH)
    assert(rows.find(_.getLong(0) == 0L).get.getAs[String]("checksum") == Multimodal.md5hex(tiled))
    // audio checksum = md5 of the raw payload (honest stub path, doc 1)
    val d1 = docs.filter(col("doc_id") === 1).select("text").collect().head.getString(0)
    assert(rows.find(_.getLong(0) == 1L).get.getAs[String]("checksum") ==
      Multimodal.md5hex(d1.getBytes("UTF-8")))
  }

  test("multimodal: javax.imageio PNG and BMP roundtrips are byte-exact on gray rasters") {
    // every 8-bit gray value appears; encode writes a real PNG container
    val raster = Array.tabulate(16 * 16)(i => i.toByte)
    val png = Multimodal.imgEncode(raster, 16, 16)
    assert(png.take(8).sameElements(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)), "not a PNG stream")
    val (decoded, w, h) = Multimodal.imgDecode(png)
    assert(w == 16 && h == 16)
    assert(decoded.sameElements(raster), "decode must invert encode bit-exactly")
    // BMP (the full-frame fast path in resizeImages): real container + exact
    // roundtrip, including a non-4-aligned width (BMP row padding)
    val bmp = Multimodal.imgEncode(raster, 16, 16, "bmp")
    assert(bmp.take(2).sameElements(Array('B'.toByte, 'M'.toByte)), "not a BMP stream")
    assert(Multimodal.imgDecode(bmp)._1.sameElements(raster))
    val odd = Array.tabulate(13 * 3)(i => (i * 7).toByte)
    assert(Multimodal.imgDecode(Multimodal.imgEncode(odd, 13, 3, "bmp"))._1.sameElements(odd))
    // golden: a known 2x2 raster decodes from independently authored bytes
    val g = Multimodal.imgDecode(Multimodal.imgEncode(Array[Byte](0, 127, -128, -1), 2, 2))
    assert(g._1.sameElements(Array[Byte](0, 127, -128, -1)))
  }

  test("repetitionStats: exact hand-computed signals, total over the corpus") {
    import spark.implicits._
    // "a a a b": top token a=3/4; 2-grams [a a, a a, a b] → 1 dup of 3
    val hand = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "w w w w"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(hand).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(out(1L) == ((3L, 4L, 0.75, 1L, 3L, 0.3333)))
    assert(out(2L) == ((1L, 3L, 0.3333, 0L, 2L, 0.0)))
    assert(out(3L) == ((4L, 4L, 1.0, 2L, 3L, 0.6667))) // degenerate repeat maxes out
    // corpus run: total, ratios in range, deterministic
    val full = TextOps.repetitionStats(docs).collect()
    assert(full.length == docs.filter(size(split(col("text"), "\\s+")) >= 2).count())
    full.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0)
    }
  }

  test("kmeansDomains: total assignment, cluster argmax matches dumped centroids") {
    val out = Similarity.kmeansDomains(spark, dir, kClusters = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val emb = Tables.t(spark, dir, "embeddings")
    assert(out.length == emb.count())
    assert(out.map(_._2).distinct.length > 1, "degenerate single-cluster fit")
    out.foreach { case (_, c, _) => assert(c >= 0 && c < 8) }
    // replay the argmax from the dumped centroids for a sample of vectors
    val cents = spark.read.parquet(Similarity.DomainsCentroidDump).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val sample = emb.filter(col("vec_id") < 25).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val byId = out.toSeq.filter(_._1 < 25).map(t => t._1 -> t).toMap
    sample.foreach { case (id, v) =>
      val best = cents.toSeq.map { case (c, ct) => (cos(v, ct), -c) }.max
      assert(byId(id)._2 == -best._2, s"vec $id argmax drifted")
      assert(math.abs(byId(id)._3 - BigDecimal(best._1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("rowLocalSigSets matches the batch shingle→signature→band pipeline bit-for-bit") {
    import org.apache.spark.sql.functions.{col, explode}
    val batchBands = Dedup.bands(Dedup.signatures(Dedup.shingles(docs))).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val rl = Dedup.rowLocalSigSets(docs.select("doc_id", "text"))
    val rlBands = rl.select(col("doc_id"), explode(col("bands")).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.bh")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rlBands == batchBands, "band hashes must probe the SAME at-rest index")
    val batchSz = Dedup.signatures(Dedup.shingles(docs)).select("doc_id", "sz").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rlSz = rl.select("doc_id", "sz").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rlSz == batchSz, "distinct-shingle counts must agree")
  }

  test("dupSourceMatrix: canonical source pairs, totals tie out to the pair relation") {
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Dedup.dupSourceMatrix(docs, 0.8).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    out.keys.foreach { case (lo, hi) => assert(lo <= hi, "pairs must be canonicalized") }
    assert(out.values.map(_._1).sum == pairs.length, "every near-dup pair lands in one cell")
    val expect = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      k -> ((ps.length.toLong,
        (ps.map(p => BigDecimal(p._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(out == expect)
  }

  test("classCentroids: per-label elementwise means match brute force; arrays reassemble in dim order") {
    val out = Similarity.classCentroids(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Double](2).toArray))).toMap
    val embs = Tables.t(spark, dir, "embeddings").select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byLabel = embs.groupBy(_._1)
    assert(out.keySet == byLabel.keySet)
    byLabel.foreach { case (label, vs) =>
      val (n, cent) = out(label)
      assert(n == vs.length, s"label $label count")
      assert(cent.length == vs.head._2.length, s"label $label dim")
      cent.zipWithIndex.foreach { case (m, i) =>
        val want = vs.map(_._2(i)).sum / vs.length
        assert(math.abs(m - want) < 1e-3, s"label $label dim $i: $m vs $want")
      }
    }
  }

  test("gopherRules: exact hand-computed signals on structured text; gate composition is total") {
    import spark.implicits._
    val doc = "- the cat sat on a mat ...\nplain line with stopwords of and to\n- bullet two"
    val row = TextOps.gopherRules(Seq((1L, doc)).toDF("doc_id", "text")).collect()(0)
    assert(row.getLong(1) == 15, "n_words counts letter-tokens only")     // words
    assert(row.getLong(2) == 53, "sum_wlen")
    assert(row.getLong(3) == 3 && row.getLong(4) == 2 && row.getLong(5) == 1, "line structure")
    assert(row.getLong(6) == 5, "distinct stopwords: the a of and to")
    assert(!row.getBoolean(10), "15 words is under the floor")            // ok_words
    assert(row.getBoolean(11), "mean 53/15 within [3, 23/5]")             // ok_wlen
    assert(!row.getBoolean(12) && !row.getBoolean(13), "2/3 bullets, 1/3 ellipsis over limits")
    assert(row.getBoolean(14) && !row.getBoolean(15), "ok_stop holds, keep is the conjunction")
    // zero-word document (no letter-bearing token): totals stay 0, mean is
    // NULL (0/0) on BOTH engines, verdict is a clean reject
    val zr = TextOps.gopherRules(Seq((2L, "123 !! 456")).toDF("doc_id", "text")).collect()(0)
    assert(zr.getLong(1) == 0 && zr.getLong(2) == 0, "no words, zero length mass")
    assert(zr.isNullAt(7), "mean_wlen is NULL for a wordless doc")
    assert(!zr.getBoolean(10) && !zr.getBoolean(15), "wordless doc is rejected")
    // the gate composition: injection is total and both verdicts occur
    val gate = TextOps.gopherRules(TextOps.withSyntheticLines(docs)).collect()
    assert(gate.length == docs.count())
    val keeps = gate.map(_.getBoolean(15)).toSet
    assert(keeps == Set(true, false), "synthetic structure should exercise both outcomes")
  }

  test("semDedupPrune: exact vs brute-force within-cluster pruning from the dumped centroids") {
    val out = Similarity.semDedupPrune(spark, dir, 0.4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty, "threshold 0.4 should prune some vectors on this fixture")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    // brute-force replay from the SAME dumped-centroid artifact the oracle uses
    val cents = spark.read.parquet(Similarity.SemDedupCentroidDump).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq.sortBy(_._1)
    val embs = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val asg = embs.map { case (id, e) =>
      id -> -cents.map { case (c, ct) => (cos(e, ct), -c) }.max._2
    }.toMap
    val expected = embs.flatMap { case (a, ea) =>
      val mates = embs.filter { case (b, _) => b < a && asg(b) == asg(a) }
        .map { case (b, eb) => (b, cos(ea, eb)) }.filter(_._2 >= 0.4)
      if (mates.isEmpty) None
      else {
        val (b, c) = mates.maxBy { case (bb, cc) => (cc, -bb) }
        Some(a -> ((b, asg(a).toLong, c)))
      }
    }.toMap
    assert(out.keySet == expected.keySet,
      s"pruned-set drift: missing=${expected.keySet -- out.keySet} extra=${out.keySet -- expected.keySet}")
    out.foreach { case (a, (b, cl, cs)) =>
      val (eb, ecl, ecs) = expected(a)
      assert(b == eb, s"keeper drift for $a: $b vs $eb")
      assert(cl == ecl, s"cluster drift for $a")
      assert(math.abs(cs - ecs) < 1e-3, s"cos drift for $a: $cs vs $ecs")
    }
  }

  test("s25 PCA: eigenpair satisfies cov·w = λw; projections match brute force") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.pcaProject(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = spark.read.parquet(Similarity.PcaDump).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    val nDim = w.size
    // unit norm and deterministic sign
    assert(math.abs(w.values.map(x => x * x).sum - 1.0) < 1e-6)
    assert(w(w.keys.maxBy(i => (math.abs(w(i)), -i))) > 0)
    // eigen residual small: cov·w ≈ λ·w with λ = wᵀ·cov·w
    val cells = Similarity.covarianceMatrix(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    def cv(i: Int, j: Int) = cells((math.min(i, j), math.max(i, j)))
    val mw = (0 until nDim).map(i => (0 until nDim).map(j => cv(i, j) * w(j)).sum)
    val lam = (0 until nDim).map(i => w(i) * mw(i)).sum
    val resid = math.sqrt((0 until nDim).map(i => math.pow(mw(i) - lam * w(i), 2)).sum)
    assert(resid < 1e-4, s"eigen residual $resid")
    assert(Similarity.lastEvShare > 0 && Similarity.lastEvShare <= 1.0)
    // projections: brute force a few vectors
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val mean = (0 until nDim).map(p => emb.values.map(_(p)).sum / emb.size)
    emb.keys.take(5).foreach { id =>
      val want = (0 until nDim).map(p => (emb(id)(p) - mean(p)) * w(p)).sum
      assert(math.abs(got(id) - want) < 2e-3, s"vec $id projection")
    }
  }

  test("s26 SQ8 error report: bounded by the lattice step; driver brute force agrees") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.sq8ErrorReport(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val emb = Tables.t(spark, dir, "embeddings").select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    assert(got.size == 64 && got.values.forall(_._1 == emb.length))
    // floor quantization error is within one lattice step mx/127
    val maxStep = emb.map(v => v.map(math.abs).max / 127.0).max
    got.values.foreach { case (_, mse, mxe) =>
      assert(mxe <= maxStep + 1e-9, s"max err $mxe vs step bound $maxStep")
      assert(mse > 0 && mse <= mxe * mxe + 1e-12)
    }
    // brute force one dimension end-to-end
    val p = 7
    val errs = emb.map { v =>
      val mx = v.map(math.abs).max
      val deq = if (mx == 0) 0.0 else math.floor(127.0 * v(p) / mx) * mx / 127.0
      v(p) - deq
    }
    val wantMse = errs.map(e => e * e).sum / errs.length
    assert(math.abs(got(p.toLong)._2 - wantMse) < 1e-6, s"dim $p mse")
  }

  test("s24 covariance: diagonal reproduces s20 variances; symmetry by construction") {
    import org.apache.spark.sql.functions.col
    val cov = Similarity.covarianceMatrix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val nDim = 64
    assert(cov.size == nDim * (nDim + 1) / 2, "full upper triangle")
    val stats = Similarity.dimStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    (0 until nDim).foreach { i =>
      val varFromStd = stats(i.toLong) * stats(i.toLong)
      assert(math.abs(cov((i.toLong, i.toLong)) - varFromStd) < 2e-3,
        s"diag $i: ${cov((i.toLong, i.toLong))} vs std² $varFromStd")
    }
    // driver brute force on a few off-diagonal cells
    val emb = Tables.t(spark, dir, "embeddings").select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val mean = (0 until nDim).map(p => emb.map(_(p)).sum / emb.length)
    for ((i, j) <- Seq((0, 1), (3, 17), (10, 63))) {
      val want = emb.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / emb.length
      assert(math.abs(cov((i.toLong, j.toLong)) - want) < 2e-3, s"cell ($i,$j)")
    }
  }

  test("s23 whitening: z-score norms cluster at sqrt(d); driver recomputation agrees") {
    import org.apache.spark.sql.functions.col
    val fit = Similarity.dimStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = Similarity.whitenQc(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == emb.size)
    val d = emb.head._2.length
    got.foreach { case (id, (nd, wnorm, wmax)) =>
      assert(nd == d)
      val w = emb(id).zipWithIndex.map { case (v, p) =>
        val (m, s) = fit(p.toLong); (v - m) / math.max(s, 1e-6)
      }
      assert(math.abs(wnorm - math.sqrt(w.map(x => x * x).sum)) < 1e-3, s"vec $id norm")
      assert(math.abs(wmax - w.map(math.abs).max) < 1e-3, s"vec $id max")
    }
    // the population-level signature of correct whitening: mean norm^2 = d
    val meanSq = got.values.map(v => v._2 * v._2).sum / got.size
    assert(math.abs(meanSq - d) < d * 0.05, s"mean whitened norm^2 $meanSq vs d=$d")
  }

  test("s22 IVF balance: totals conserve, load factors average 1, dump drives assignment") {
    import org.apache.spark.sql.functions.col
    val rows = Similarity.ivfBalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 16, "one row per cell, empties included")
    val total = Tables.t(spark, dir, "embeddings").count()
    assert(rows.map(_._2).sum == total, "every vector assigned exactly once")
    val meanLoad = rows.map(_._4).sum / rows.length
    assert(math.abs(meanLoad - 1.0) < 0.01, s"load factors must average 1, got $meanLoad")
    // shares sum to 1 within rounding
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.01)
    // the fit must discriminate: not all cells equal
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("s38 residual quantizer equals a driver replay from the dumps; stage 2 cuts distortion") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.residualQuantizer(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def readDump(path: String): Map[Int, Array[Double]] =
      spark.read.parquet(path).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val c1 = readDump(Similarity.RqCentroidDump)
    val c2 = readDump(Similarity.RqCodebookDump)
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    assert(got.keySet == emb.keySet)
    emb.foreach { case (id, v) =>
      val cell = c1.toSeq.map { case (j, c) => (j, d2(v, c)) }
        .minBy { case (j, d) => (d, j) }._1
      val r = v.indices.map(i => v(i) - c1(cell)(i)).toArray
      val (code, e2) = c2.toSeq.map { case (j, c) => (j, d2(r, c)) }
        .minBy { case (j, d) => (d, j) }
      val (gc, gcode, ge1, ge2) = got(id)
      assert(gc == cell.toLong, s"vec $id cell")
      assert(gcode == code.toLong, s"vec $id code")
      assert(math.abs(ge1 - d2(v, c1(cell))) < 1e-3, s"vec $id err1")
      assert(math.abs(ge2 - e2) < 1e-3, s"vec $id err2")
    }
    // the second stage must buy real distortion on average, or it is vacuous
    val m1 = got.values.map(_._3).sum / got.size
    val m2 = got.values.map(_._4).sum / got.size
    assert(m2 < m1 * 0.9, s"stage 2 bought nothing: $m1 -> $m2")
  }

  test("d22 dup spans equal a driver shingle-coverage replay; injected overlap detected") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, dir, "documents")
    val got = Dedup.dupSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val k = 6
    val sh = texts.toSeq.flatMap { case (id, t) =>
      if (t.length >= k) (0 to t.length - k).map(j => (id, j, t.slice(j, j + k).mkString(" ")))
      else Nil
    }
    val crossDoc = sh.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val want = texts.map { case (id, t) =>
      val cov = sh.filter(s => s._1 == id && crossDoc(s._3))
        .flatMap(s => s._2 until s._2 + k).distinct.size.toLong
      id -> ((t.length.toLong, cov,
        BigDecimal(cov.toDouble / t.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, cov, frac)) =>
      assert(got(id)._1 == n, s"doc $id n_tok")
      assert(got(id)._2 == cov, s"doc $id n_dup_pos")
      assert(math.abs(got(id)._3 - frac) < 1e-9, s"doc $id dup_frac")
    }
    // both outcomes must exist on the fixture, or the profile is vacuous
    assert(got.values.exists(_._2 > 0), "no cross-document spans found")
    assert(got.values.exists(_._2 == 0), "every document fully duplicated")
  }

  test("s37 confusion matrix equals a driver vote recount; rows sum to prediction counts") {
    val got = Similarity.knnConfusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val lbl = Tables.t(spark, dir, "embeddings").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val edges = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pred = edges.groupBy(_._1).map { case (src, es) =>
      val votes = es.map(e => lbl(e._2)).groupBy(identity).view.mapValues(_.size)
      src -> votes.toSeq.sortBy(v => (-v._2, v._1)).head._1
    }
    val want = pred.toSeq.groupBy { case (v, p) => (lbl(v), p) }.view.mapValues(_.size.toLong)
    assert(got.keySet == want.keySet)
    want.foreach { case (cell, n) => assert(got(cell)._1 == n, s"cell $cell") }
    // row marginals: n_true is the per-true-class prediction count
    got.groupBy(_._1._1).foreach { case (t, cells) =>
      val rowSum = cells.values.map(_._1).sum
      cells.values.foreach { case (_, nTrue, _) => assert(nTrue == rowSum, s"class $t marginal") }
      val fracSum = cells.values.map(_._3).sum
      assert(math.abs(fracSum - 1.0) < 0.01, s"class $t fractions sum to $fracSum")
    }
  }

  test("s36 label propagation equals a driver synchronous replay; seeds clamped") {
    val out = Similarity.labelProp(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
    }.toMap
    val edges = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val trueLbl = Tables.t(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    var lab: Map[Long, Option[Long]] =
      trueLbl.map { case (id, l) => id -> (if (id % 3 == 0) Some(l) else None) }
    for (_ <- 1 to 3) {
      val votes = und.flatMap { case (src, nb) => lab(nb).map(l => (src, l)) }
        .groupBy(identity).map { case ((src, l), v) => (src, l, v.size) }
      val pick = votes.groupBy(_._1).map { case (src, vs) =>
        src -> vs.toSeq.sortBy(v => (-v._3, v._2)).head._2
      }
      lab = lab.map { case (id, _) =>
        id -> (if (id % 3 == 0) Some(trueLbl(id)) else pick.get(id))
      }
    }
    assert(out.keySet == trueLbl.keySet)
    out.foreach { case (id, (isSeed, tl, pred, correct)) =>
      assert(isSeed == (id % 3 == 0), s"vec $id seed flag")
      assert(tl == trueLbl(id), s"vec $id true label")
      assert(pred == lab(id), s"vec $id prediction")
      assert(correct == pred.map(_ == tl), s"vec $id correctness")
    }
    // the spread is real: labels reached non-seed nodes
    assert(out.exists { case (id, (s, _, p, _)) => !s && p.isDefined })
  }

  test("s21 kNN graph equals a driver-side bucket+rank recomputation") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // replay the sign-bucket assignment with the engine's planes
    val buckets = emb.view.mapValues { v =>
      (0 until Similarity.Tables).map { t =>
        (0 until Similarity.Planes).map { p =>
          if (dot(v, Similarity.planes(t)(p)) > 0) 1L << p else 0L
        }.sum + (t.toLong << 32)
      }.toSet
    }.toMap
    val cand = for {
      (a, ba) <- buckets.toSeq; (b, bb) <- buckets.toSeq
      if a != b && ba.exists(bb.contains)
    } yield (a, b)
    def cos(a: Long, b: Long) =
      dot(emb(a), emb(b)) / (math.sqrt(dot(emb(a), emb(a))) * math.sqrt(dot(emb(b), emb(b))))
    val want = cand.groupBy(_._1).flatMap { case (src, ps) =>
      ps.map(_._2).distinct.map(nb => (src, nb, cos(src, nb)))
        .sortBy { case (_, nb, c) => (-c, nb) }.take(3).zipWithIndex
        .map { case ((s, nb, c), i) =>
          (s, nb) -> ((math.rint(c * 10000) / 10000.0, i + 1L)) }
    }
    val got = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (cs, rnk)) =>
      assert(rnk == want(k)._2, s"$k rank")
      assert(math.abs(cs - want(k)._1) < 2e-4, s"$k cosine")
    }
    // the graph is dense enough to mean something on this corpus
    assert(got.keys.map(_._1).toSet.size > emb.size / 2)
  }

  test("s20 dim stats equal a driver-side recomputation; every dim covered") {
    val emb = Tables.t(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    val nDim = emb.head.length
    val got = Similarity.dimStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.size == nDim)
    for (p <- 0 until nDim) {
      val vs = emb.map(_(p).toDouble)
      val (n, nz, mean, std) = got(p.toLong)
      assert(n == emb.length)
      assert(nz == vs.count(_ == 0.0))
      val m = vs.sum / vs.length
      val sd = math.sqrt(math.max(0.0, vs.map(v => v * v).sum / vs.length - m * m))
      assert(math.abs(mean - m) < 1e-3, s"dim $p mean")
      assert(math.abs(std - sd) < 1e-3, s"dim $p std")
    }
    // stats discriminate across dims (not a degenerate all-equal fixture)
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("s12 sparse tf-idf equals a driver-side dense recomputation") {
    import org.apache.spark.sql.functions._
    val got = Similarity.sparseTfidfTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // brute-force ground truth: tf-idf vectors computed naively on the
    // driver from the raw text (no inverted index, no prune shortcuts
    // beyond the same df ceiling)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val n = docs.size
    val dfc = docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, g) => t -> g.size }
    val kept = dfc.filter { case (_, df) => df * 100 < n.toLong * 95 }.keySet
    def wvec(toks: Seq[String]): Map[String, Double] =
      toks.filter(kept).groupBy(identity).map { case (t, g) =>
        t -> g.size * math.log(n.toDouble / dfc(t)) }
    val vecs = docs.map { case (id, tk) => id -> wvec(tk) }
    def cos(a: Map[String, Double], b: Map[String, Double]): Double = {
      val dot = a.keysIterator.filter(b.contains).map(t => a(t) * b(t)).sum
      val na = math.sqrt(a.values.map(x => x * x).sum)
      val nb = math.sqrt(b.values.map(x => x * x).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    val expected = (for {
      q <- vecs.keys.filter(_ < 10)
      ranked = vecs.keys.filter(o => o != q && cos(vecs(q), vecs(o)) > 0)
        .map(o => o -> cos(vecs(q), vecs(o))).toSeq
        .sortBy { case (o, c) => (-c, o) }.take(5)
      ((o, c), i) <- ranked.zipWithIndex
    } yield (q, o) -> (c, (i + 1).toLong)).toMap
    assert(got.keySet == expected.keySet,
      s"pair drift: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, (c, rnk)) =>
      assert(math.abs(c - expected(k)._1) < 1e-3 && rnk == expected(k)._2, s"drift at $k")
    }
  }

  test("s13 random projection: deterministic, self-similarity 1, ranking sane") {
    val a = Similarity.randomProjTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = Similarity.randomProjTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b, "seeded projection must be deterministic")
    assert(a.nonEmpty && a.forall { case (_, _, cs, _) => cs <= 1.0001 && cs >= -1.0001 })
    // per query: ranks are 1..k and cosines non-increasing along ranks
    a.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.toSeq.sortBy(_._4)
      assert(byRank.map(_._4) == (1L to byRank.size).toSeq, s"rank gap for query $q")
      assert(byRank.sliding(2).forall {
        case Seq(x, y) => x._3 >= y._3 - 1e-9
        case _ => true
      }, s"non-monotone cosine for query $q")
    }
  }

  test("s14 MMR re-rank equals a driver-side greedy recomputation") {
    val got = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0 else dot / d
    }
    val lam = 0.7
    val expected = scala.collection.mutable.Map.empty[(Long, Long), (Long, Double)]
    for (q <- 0L until 10L) {
      val cands = embs.keys.filter(_ != q).toSeq
        .map(o => o -> cos(embs(q), embs(o)))
        .sortBy { case (o, r) => (-r, o) }.take(10)
      val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (step <- 1 to 3) {
        val scored = cands.filterNot { case (o, _) => sel.contains(o) }.map { case (o, r) =>
          val pen = if (sel.isEmpty) 0.0 else sel.map(sid => cos(embs(o), embs(sid))).max
          o -> (if (sel.isEmpty) r * lam else r * lam - pen * (1 - lam))
        }
        val (pickId, pickMmr) = scored.minBy { case (o, m) => (-m, o) }
        sel += pickId
        expected((q, step.toLong)) = (pickId, pickMmr)
      }
    }
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (id, m)) =>
      assert(id == expected(k)._1, s"pick drift at $k: $id vs ${expected(k)._1}")
      assert(math.abs(m - expected(k)._2) < 1e-3, s"mmr drift at $k")
    }
    // diversity is real on this fixture: at least one query's MMR set
    // differs from its plain top-3
    val diverged = (0L until 10L).exists { q =>
      val top3 = embs.keys.filter(_ != q).toSeq
        .map(o => o -> cos(embs(q), embs(o))).sortBy { case (o, r) => (-r, o) }
        .take(3).map(_._1).toSet
      val mmr3 = (1L to 3L).map(st => got((q, st))._1).toSet
      top3 != mmr3
    }
    assert(diverged, "MMR never diverged from plain top-3 — fixture degenerate or penalty dead")
  }

  test("d11 PageRank equals a driver-side power iteration; mass conserved") {
    val got = Dedup.pageRank(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pairs = Dedup.minhashPairs(docs, 0.8).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val n = adj.size
    var pr = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map.empty[Long, BigDecimal].withDefaultValue(BigDecimal(0))
      adj.foreach { case (u, outs) =>
        val c = BigDecimal(pr(u) / outs.size).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        outs.foreach(v => contrib(v) = contrib(v) + c)
      }
      pr = adj.keys.map(k => k -> (0.15 / n + 0.85 * contrib(k).toDouble)).toMap
    }
    val want = pr.map { case (k, v) => k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6, s"pr drift at $k: $v vs ${want(k)}") }
    // PageRank mass is conserved on a symmetric graph with no dangling nodes
    assert(math.abs(got.values.sum - 1.0) < 1e-3, s"mass ${got.values.sum}")
    assert(got.values.forall(_ > 0))
  }

  test("d12 line dedup equals a driver-side first-occurrence recomputation") {
    val got = Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val lined = TextOps.withSyntheticLines(docs)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\n", -1).toSeq)
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val want = lined.map { case (id, lns) =>
      val kept = lns.filter(l => seen.add(l))
      id -> (lns.size.toLong, kept.size.toLong,
        graft.ops.Multimodal.md5hex(kept.mkString("\n").getBytes("UTF-8")))
    }.toMap
    assert(got == want)
    // the rule actually fires: some doc loses a line, every doc keeps its count
    assert(want.exists { case (_, (n, k, _)) => k < n }, "no duplicate lines cut — fixture degenerate")
    assert(got.values.map(_._2).sum == want.values.map(_._2).sum)
  }

  test("s27 hamming top-k equals a driver-side sign-hash recomputation") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // reference packing: two 32-bit words, bit i = sign of dim (lo+i)
    def word(v: Array[Float], lo: Int): Long =
      (0 until 32).foldLeft(0L)((acc, i) => if (v(lo + i) > 0f) acc | (1L << i) else acc)
    def ham(a: Array[Float], b: Array[Float]): Int =
      java.lang.Long.bitCount(word(a, 0) ^ word(b, 0)) +
        java.lang.Long.bitCount(word(a, 32) ^ word(b, 32))
    val got = Similarity.hammingTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10 * 5)
    got.foreach { case (q, nb, h, rnk) =>
      assert(h == ham(emb(q), emb(nb)), s"hamming mismatch at ($q,$nb)")
      assert(h >= 0 && h <= 64 && rnk >= 1 && rnk <= 5 && q != nb)
    }
    // rank order is truly global per query: nothing outside the top-k beats
    // the kth by (ham, nb_id)
    for (q <- 0L until 10L) {
      val rows = got.filter(_._1 == q).sortBy(_._4)
      val kth = rows.last
      val better = emb.keys.filter(_ != q)
        .map(nb => (ham(emb(q), emb(nb)), nb))
        .count(c => c._1 < kth._3 || (c._1 == kth._3 && c._2 < kth._2))
      assert(better == rows.length - 1 + rows.count(_ == kth) - 1 ||
        better == rows.length - 1, s"q=$q: $better candidates beat the kth")
    }
    // the signature is 8 bytes of genuinely angular signal: each query's
    // top-1 Hamming neighbor must be nearer in TRUE cosine than the
    // average candidate (the binarization preserves neighborhood order)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val wins = (0L until 10L).count { q =>
      val top1 = got.filter(r => r._1 == q && r._4 == 1L).head._2
      val mean = emb.keys.filter(_ != q).map(nb => cos(emb(q), emb(nb))).sum / (emb.size - 1)
      cos(emb(q), emb(top1)) > mean
    }
    assert(wins >= 9, s"sign-hash top-1 beat the mean cosine for only $wins/10 queries")
  }

  test("s28 k-means|| init: deterministic, census conserved, beats naive seeding on cost") {
    import org.apache.spark.sql.functions.col
    val census1 = Similarity.kmeansParallelInit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val census2 = Similarity.kmeansParallelInit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census1 == census2, "hash-uniform sampling must make the fit deterministic")
    val pts = Tables.t(spark, dir, "embeddings")
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    assert(census1.values.sum == pts.length, "every vector assigned exactly once")
    assert(census1.size == 16 && census1.values.forall(_ > 0),
      s"degenerate init: $census1") // oversampled seeding never leaves a cell empty here
    // cost comparison vs the naive first-k init on the SAME data
    def phi(cents: Array[Array[Double]]): Double = pts.map { p =>
      cents.map(c => c.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum
    val fitted = spark.read.parquet(Similarity.KmppDump)
      .orderBy(col("cluster")).collect()
      .map(_.getSeq[Double](1).toArray)
    assert(fitted.length == 16)
    assert(phi(fitted) < phi(pts.take(16)),
      f"kmeans|| init cost ${phi(fitted)}%.3f not below naive ${phi(pts.take(16))}%.3f")
  }

  test("d15 url canonicalization collapses exactly the four variant classes") {
    import org.apache.spark.sql.functions.{col, expr}
    val urls = docs.select(col("doc_id"), expr(Dedup.urlSql).as("url")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference canonicalizer, independent formulation (java.net.URI-free
    // string algebra would just mirror the engine; use real parsing)
    def canon(u: String): String = {
      val afterScheme = u.split("://", 2)
      val hostAndRest = afterScheme(1).split("/", 2)
      val schemeHost = afterScheme(0).toLowerCase + "://" + hostAndRest(0).toLowerCase
      val rest = if (hostAndRest.length > 1) "/" + hostAndRest(1) else ""
      val (path, query) = rest.split("\\?", 2) match {
        case Array(p, q) => (p, q); case Array(p) => (p, "")
      }
      val params = query.split("&").filter(_.nonEmpty)
        .filterNot(p => p.startsWith("utm_") || p.startsWith("ref=")).sorted
      schemeHost + path.stripSuffix("/") +
        (if (params.isEmpty) "" else "?" + params.mkString("&"))
    }
    val wantGroups = urls.groupBy { case (_, u) => canon(u) }
    val got = Dedup.urlCanonDedup(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == wantGroups.size, s"${got.length} vs ${wantGroups.size} groups")
    val wantByKeeper = wantGroups.values
      .map(g => g.keys.min -> (g.size.toLong, g.values.toSet.size.toLong)).toMap
    got.foreach { case (_, n, nRaw, keeper) =>
      assert(wantByKeeper(keeper) == ((n, nRaw)), s"group at keeper=$keeper")
      assert(nRaw == 4, "each page should collapse exactly its 4 spellings")
    }
  }

  test("s29 RRF fusion equals a driver-side recomputation from the two rankings") {
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val dense = ranks(Similarity.cosineTopK(spark, dir, 10, 20))
    val sparse = ranks(Similarity.sparseTfidfTopK(spark, dir, 10, 20))
    val got = Similarity.rrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 10 * 10)
    for (q <- 0L until 10L) {
      val cands = (dense.keySet ++ sparse.keySet).filter(_._1 == q)
      val want = cands.toSeq.map { key =>
        val s = dense.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          sparse.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (key._2, s)
      }.sortBy { case (nb, s) => (-s, nb) }.take(10).map(_._1)
      val mine = got.filter(_._1 == q).sortBy(_._5)
      assert(mine.map(_._2).toSeq == want, s"q=$q fused order differs")
      mine.foreach { case (_, nb, rd, rs, _) =>
        assert(rd == dense.getOrElse((q, nb), -1L), s"dense rank at ($q,$nb)")
        assert(rs == sparse.getOrElse((q, nb), -1L), s"sparse rank at ($q,$nb)")
        assert(rd >= 1 || rs >= 1, "fused candidate came from neither pool")
      }
    }
    // the fusion is genuinely hybrid on this corpus: some winners are
    // single-pool from EACH side (score calibration could never mix these)
    assert(got.exists(r => r._3 >= 1 && r._4 == -1L), "no dense-only winners")
    assert(got.exists(r => r._3 == -1L && r._4 >= 1), "no sparse-only winners")
  }

  test("s32 nprobe sweep: recall monotone in probe budget, saturating at the s11 point") {
    val rows = Similarity.nprobeSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.foreach { case (_, nQ, rec) =>
      assert(nQ == 10L && rec >= 0.0 && rec <= 1.0)
    }
    // more probes can only add candidates → recall is non-decreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"recall dropped from nprobe ${a._1} to ${b._1}")
    }
    // the curve must actually move on this fixture (else the sweep is flat
    // and carries no tuning signal)
    assert(rows.last._3 > rows.head._3, "sweep is flat")
  }

  test("s31 coverage sample: proportional quotas, no empty cell, deterministic picks") {
    val rows = Similarity.coverageSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val total = rows.length.toLong
    assert(total == Tables.t(spark, dir, "embeddings").count())
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (c, ms) =>
      val nC = ms.head._3
      assert(ms.length.toLong == nC, s"cell $c size")
      val quota = (100 * nC + total - 1) / total
      assert(ms.forall(_._4 == quota))
      // picks are exactly ranks 1..min(quota, n_c)
      val picked = ms.filter(_._6)
      assert(picked.length.toLong == math.min(quota, nC), s"cell $c picked ${picked.length}")
      assert(ms.map(_._5).sorted.toSeq == (1L to nC), s"cell $c ranks not a permutation")
      assert(picked.length > 0, s"cell $c left empty")
    }
    // stratification is real: more than one cell, and the global pick count
    // is near the target (ceil rounding can only overshoot by #cells)
    val nPicked = rows.count(_._6)
    assert(byCell.size > 1 && nPicked >= 100 && nPicked <= 100 + byCell.size)
    val again = Similarity.coverageSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(5))).toMap
    rows.foreach { case (id, _, _, _, _, s) => assert(again(id) == s) }
  }

  test("d18 simhash eval: blocking complete for tau<=3, metrics match brute force") {
    val rows = Dedup.simhashEval(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    // brute-force ground truth from the d4 fingerprints
    val fps = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hd(x: String, y: String) = x.zip(y).count { case (a, b) => a != b }
    val ids = fps.keys.toSeq.sorted
    val allPairs = for (i <- ids.indices; j <- i + 1 until ids.length)
      yield (ids(i), ids(j), hd(fps(ids(i)), fps(ids(j))))
    val exact = Dedup.ngramJaccardPairs(docs, 0.8).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (tau <- 0L to 3L) {
      val pred = allPairs.filter(_._3 <= tau).map(p => (p._1, p._2)).toSet
      val (nPred, nExact, nHit, prec, rec) = rows(tau)
      assert(nPred == pred.size.toLong, s"tau=$tau blocking missed pairs: got $nPred want ${pred.size}")
      assert(nExact == exact.size.toLong && nHit == (pred & exact).size.toLong)
      if (nPred > 0) assert(math.abs(prec - nHit.toDouble / nPred) < 1e-4)
      assert(math.abs(rec - nHit.toDouble / nExact) < 1e-4)
    }
    // monotone in tau, and the fixture produces SOME simhash-close pairs
    assert(rows(3L)._1 >= rows(0L)._1 && rows(3L)._1 > 0)
  }

  test("d17 b-bit estimates: collision-corrected, bounded error vs exact jaccard") {
    val rows = Dedup.bbitEstimates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty, "no near-dup pairs to estimate")
    // pair set is exactly the d3 relation
    val want = Dedup.minhashPairs(Tables.t(spark, dir, "documents"), 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == want)
    rows.foreach { case (a, b, jac, estFull, estBbit) =>
      // 96 hashes at j≥0.8: both estimators land in a loose but real band
      assert(estFull >= jac - 0.25 && estFull <= 1.0, s"($a,$b): full $estFull vs $jac")
      assert(estBbit >= jac - 0.35 && estBbit <= 1.0 + 1e-9, s"($a,$b): bbit $estBbit vs $jac")
      // collision correction: the b-bit estimate never exceeds what raw
      // matches would imply, and equals full when all 96 rows match
      if (estFull == 1.0) assert(estBbit == 1.0)
    }
    // the compression must actually lose something somewhere (otherwise the
    // b-bit column is just est_full), unless every pair is an exact dup
    assert(rows.exists(r => r._4 != 1.0) || rows.forall(_._3 == 1.0))
  }

  test("d16 soft-dedup: totality, expected-mass conservation, cluster subsumption") {
    val rows = Dedup.softDedupWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length.toLong == docs.count(), "every doc weighted exactly once")
    val exact = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap(g => g.map(d => d._1 -> g.size.toLong)).toMap
    val clusters = Dedup.dupClusters(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clSize = clusters.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (id, nE, nC, eff, w) =>
      assert(nE == exact(id), s"doc $id n_exact")
      assert(nC == clusters.get(id).map(clSize).getOrElse(1L), s"doc $id n_cluster")
      assert(eff == (nE max nC) && w == BigDecimal(1.0 / eff)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.exists(_._4 > 1L), "fixture has no duplicates — weights vacuous")
    assert(rows.exists(_._4 == 1L), "fixture is all-duplicate — weights vacuous")
  }

  test("s30 triplet mining equals a brute-force driver recomputation") {
    val emb = Tables.t(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.tripletMining(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(got.size == 50)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((qid, qa, ql) <- emb if qid < 50) {
      val others = emb.filter(_._1 != qid)
      val (negId, negCos) = others.filter(_._3 != ql)
        .map(o => (o._1, cos(qa, o._2))).minBy { case (id, c) => (-c, id) }
      val (posId, posCos) = others.filter(_._3 == ql)
        .map(o => (o._1, cos(qa, o._2))).minBy { case (id, c) => (-c, id) }
      val (gp, gpc, gn, gnc, margin, viol) = got(qid)
      assert(gp == posId && gn == negId, s"anchor $qid ids")
      assert(gpc == r4(posCos) && gnc == r4(negCos), s"anchor $qid scores")
      assert(margin == r4(gpc - gnc) && viol == (gnc >= gpc), s"anchor $qid verdicts")
    }
    // the fixture must exercise both outcomes or the verdict column is vacuous
    assert(got.values.exists(_._6) && got.values.exists(!_._6),
      "need both violated and satisfied triplets")
  }

  test("s39 ivf delta: censuses conserve the split, means bounded, hot rule recounts") {
    val emb = Tables.t(spark, dir, "embeddings")
    val nDelta = emb.filter(expr(s"vec_id % ${Similarity.VecDeltaMod} = 0")).count()
    val nStand = emb.count() - nDelta
    val rows = Similarity.ivfDelta(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5))
    }
    // every vector lands in exactly one cell on each side of the split
    assert(rows.map(_._2).sum == nStand, "standing census conservation")
    assert(rows.map(_._3).sum == nDelta, "delta census conservation")
    // assignment cosines are cosines
    rows.flatMap(r => r._4.toSeq ++ r._5.toSeq).foreach(m => assert(m >= -1.0 && m <= 1.0))
    // the hot verdict is exactly the cross-multiplied 2x-share rule
    rows.foreach { case (cell, ns, nd, _, _, hot) =>
      assert(hot == (nd * nStand > ns * nDelta * 2), s"cell $cell")
    }
    // determinism: the at-rest artifacts make the report reproducible
    val again = Similarity.ivfDelta(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(again == rows.map(r => (r._1, r._2, r._3)).sorted.toSeq)
  }
}
