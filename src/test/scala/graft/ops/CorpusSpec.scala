package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.testutil.SparkSuite

class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.t(spark, dir, "documents")

  test("t37 C4 filters: page flags fire exactly on the injected pages; driver line recount agrees") {
    val out = TextOps.c4Filters(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    }.toMap
    assert(out.size == docs.count())
    // driver replay: the t16 line injection + the t37 page injections
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, raw) =>
      val toks = raw.split("\\s+")
      val nLines = math.ceil(toks.length / 12.0).toInt
      val lines = (0 until nLines).map { j =>
        val bullet = if ((id + j) % 4 == 0) "- " else ""
        val ell = if ((id + j) % 5 == 0) " ..." else ""
        bullet + toks.slice(j * 12, j * 12 + 12).mkString(" ") + ell
      } ++
        (if (id % 13 == 0) Seq("lorem ipsum dolor sit amet ...") else Nil) ++
        (if (id % 17 == 0) Seq("var f = function() { return 1; } ...") else Nil)
      val kept = lines.filter(l =>
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
          l.split(" ", -1).count(_.exists(c => c >= 'a' && c <= 'z')) >= 3)
      val (nl, nk, kc, lorem, brace, keep) = out(id)
      assert(nl == lines.size, s"doc $id n_lines")
      assert(nk == kept.size, s"doc $id n_kept")
      assert(kc == kept.map(_.length).sum.toLong, s"doc $id kept_chars")
      assert(lorem == (id % 13 == 0), s"doc $id lorem flag")
      assert(brace == (id % 17 == 0), s"doc $id brace flag")
      assert(keep == (kept.size >= 2 && id % 13 != 0 && id % 17 != 0), s"doc $id keep")
    }
    assert(out.exists(!_._2._6), "no dropped pages in fixture")
    assert(out.exists(_._2._6), "no kept pages in fixture")
  }

  test("splitAssign is deterministic, total, and growth-stable") {
    val s1 = Corpus.splitAssign(docs).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val s2 = Corpus.splitAssign(docs).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(s1 == s2)
    assert(s1.size == docs.count())
    // adding/removing other documents never moves an existing assignment
    val half = Corpus.splitAssign(docs.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    half.foreach { case (id, sp) => assert(s1(id) == sp) }
    // proportions near 80/10/10 (hash uniformity; loose bounds at 500 docs)
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, frac.toString)
    assert(frac.getOrElse("val", 0.0) > 0.02 && frac.getOrElse("test", 0.0) > 0.02, frac.toString)
  }

  test("splitAssign bucket matches the md5-prefix definition") {
    val row = Corpus.splitAssign(docs).filter(col("doc_id") === 7).head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 4)
    assert(row.getLong(2) == java.lang.Long.parseLong(hex, 16) % 100)
  }

  test("curationReport: one row per doc, kept implies canonical and quality threshold") {
    val rep = Corpus.curationReport(docs, 1.4)
    val rows = rep.collect()
    assert(rows.length == docs.count())
    val qi = rep.schema.fieldIndex("quality"); val ci = rep.schema.fieldIndex("is_canonical")
    val ki = rep.schema.fieldIndex("kept")
    rows.foreach { r =>
      assert(r.getBoolean(ki) == (r.getBoolean(ci) && r.getDouble(qi) >= 1.4))
    }
    // the pipeline must actually discriminate (some kept, some dropped)
    val nKept = rows.count(_.getBoolean(ki))
    assert(nKept > 0 && nKept < rows.length, s"kept $nKept of ${rows.length}")
  }

  test("mixtureSample: per-source rates honored, deterministic, growth-stable") {
    val out = Corpus.mixtureSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    out.foreach { case (_, _, rate, bucket, kept) =>
      assert(rate >= 30 && rate < 100)
      assert(kept == (bucket < rate))
    }
    // same source → same rate; decision depends only on (doc_id, source)
    out.groupBy(_._2).foreach { case (_, rows) => assert(rows.map(_._3).distinct.length == 1) }
    val again = Corpus.mixtureSample(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toMap
    out.foreach { case (id, _, _, _, kept) => assert(again(id) == kept) }
    // something is dropped and something kept (rates < 100 by construction)
    assert(out.exists(_._5) && out.exists(!_._5))
  }

  test("bm25TopTerms: k per doc, ranked by relevance, rare terms beat stopwords") {
    val out = TextOps.bm25TopTerms(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
      // scores non-increasing with rank
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3)
        case _ =>
      }
    }
    // down-weighting: "the" appears in most documents of this corpus, so
    // its share of top-1 slots must be far below its document frequency
    // (with tf-only scoring it would win a large share)
    val dfThe = docs.filter(col("text").contains("the")).count().toDouble / docs.count()
    val top1The = byDoc.values.count(_.exists(r => r._4 == 1L && r._2 == "the")).toDouble / byDoc.size
    assert(dfThe > 0.5, s"corpus assumption: 'the' is common (df=$dfThe)")
    assert(top1The < dfThe / 3, s"'the' wins ${top1The * 100}%% of top-1 slots — idf not discounting")
  }

  test("packAssignments: offsets are the shard-order running sum, packs cut at the budget") {
    val budget = 512
    val out = Corpus.packAssignments(docs, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var cum = 0L
      ordered.foreach { case (_, _, nTok, off, packId) =>
        assert(off == cum, s"offset must be the running token count")
        assert(packId == off / budget)
        assert(nTok >= 1) // split("\\s+") never yields an empty token list
        cum += nTok
      }
    }
    // multiple packs actually occur (the budget is smaller than a shard)
    assert(out.map(_._5).distinct.length > 1)
  }

  test("corpusReport: rollup total row equals the sum of the per-source rows") {
    val rows = Corpus.corpusReport(docs).collect()
    val (total, perSource) = rows.partition(_.isNullAt(0))
    assert(total.length == 1 && perSource.nonEmpty)
    assert(total.head.getLong(1) == perSource.map(_.getLong(1)).sum) // n_docs
    assert(total.head.getLong(2) == perSource.map(_.getLong(2)).sum) // n_tok_sum
    assert(total.head.getLong(4) == perSource.map(_.getLong(4)).sum) // n_dupes
    assert(total.head.getLong(1) == docs.count())
    // quality mass is positive and bounded by 2.0 per doc (see qualityScores)
    perSource.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) <= 2.0 * r.getLong(1)))
  }

  test("decontaminate matches a direct Scala ground truth") {
    val n = 8; val evalMod = 97
    def grams(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < n) Set.empty
      else t.sliding(n).map(_.mkString(" ")).toSet
    }
    val all = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalGrams = all.collect { case (id, tx) if id % evalMod == 0 => grams(tx) }
      .foldLeft(Set.empty[String])(_ ++ _)
    assert(evalGrams.nonEmpty, "pseudo-benchmark produced no n-grams")
    val expected = all.collect { case (id, tx) if id % evalMod != 0 =>
      id -> (grams(tx) & evalGrams).size.toLong
    }
    val out = Corpus.decontaminate(docs, evalMod, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == expected.size) // eval docs excluded, training docs total
    out.foreach { case (id, hits, flag) =>
      assert(hits == expected(id), s"doc $id")
      assert(flag == (hits > 0))
    }
    // an eval doc's full text IS an overlap: planting it must flag the plant
    val planted = all.find(_._1 % evalMod == 0).get._2
    import spark.implicits._
    val plantedDf = docs.select(col("doc_id"), col("text"))
      .union(Seq((999999L, planted)).toDF("doc_id", "text"))
    val flagged = Corpus.decontaminate(plantedDf, evalMod, n)
      .filter(col("doc_id") === 999999L).head()
    assert(flagged.getBoolean(2), "planted copy of an eval doc not flagged")
  }

  test("chunkWindows: windows tile every doc; spans reconstruct the text; stride honored") {
    import spark.implicits._
    val window = 8; val overlap = 2; val step = window - overlap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toksOf(t: String): Vector[String] =
      ("""( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +)""".r).findAllIn(t).toVector
    val out = Corpus.chunkWindows(docs, window, overlap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet.filter(id => texts(id).nonEmpty))
    byDoc.foreach { case (id, chunks) =>
      val toks = toksOf(texts(id))
      val expectChunks = 1 + math.max(0, math.ceil((toks.length - window).toDouble / step).toInt)
      assert(chunks.length == expectChunks, s"doc $id")
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until expectChunks).map(_.toLong))
      sorted.foreach { case (_, no, nTok, spanLen, sum) =>
        val span = toks.slice(no.toInt * step, no.toInt * step + window)
        assert(nTok == span.length && spanLen == span.mkString.length, s"doc $id chunk $no")
        assert(sum == Multimodal.md5hex(span.mkString.getBytes("UTF-8")), s"doc $id chunk $no")
      }
      // stitching chunk spans (dropping each successor's overlap) = the text
      val stitched = sorted.map(c => toks.slice(c._2.toInt * step, c._2.toInt * step + window))
        .zipWithIndex.map { case (s, i) => if (i == 0) s else s.drop(overlap min s.length) }
        .flatten.mkString
      // overlap tokens beyond a short final window never duplicate
      assert(stitched == texts(id), s"doc $id reconstruction")
    }
  }

  test("c8 domain curation: totals tie out, blocklist splits cleanly, hosts bounded") {
    val out = Corpus.domainCuration(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).sum == docs.count(), "every doc lands in exactly one domain")
    out.foreach { case (dom, n, hosts, blocked, kept) =>
      assert(blocked + kept == n, s"$dom: blocked+kept != n_docs")
      assert(hosts >= 1 && hosts <= n, s"$dom: host count out of range")
      if (dom.startsWith("spam")) assert(kept == 0, s"$dom must be fully blocked")
      else assert(blocked == 0, s"$dom must not block")
    }
    // the fixture produces both blocked and kept mass
    assert(out.exists(_._4 > 0) && out.exists(_._5 > 0))
  }

  test("c9 dedup report ties out against its component operators") {
    val rep = Corpus.dedupReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rep.map(_._2._1).sum == docs.count())
    val exactDups = Dedup.exactDuplicates(docs).agg(sum(col("n") - 1)).collect().head.getLong(0)
    assert(rep.map(_._2._3).sum == exactDups, "exact-dup mass drift vs d1")
    val p = Dedup.minhashPairs(docs, 0.8)
    val nearDocs = p.select("a").union(p.select("b")).distinct().count()
    assert(rep.map(_._2._4).sum == nearDocs, "near-dup mass drift vs d3")
    val cut = Dedup.lineDedup(docs).agg(sum(col("n_lines") - col("n_kept"))).collect().head.getLong(0)
    assert(rep.map(_._2._5).sum == cut, "line-cut mass drift vs d12")
    // exact duplicates may legitimately be absent at sf0.001; the near-dup
    // and line-cut channels must fire for the report to be meaningful
    assert(rep.map(_._2._4).sum > 0 && cut > 0, "fixture degenerate")
  }

  test("c10 snapshot diff ties out against the closed-form snapshot rules") {
    val docs = Tables.t(spark, dir, "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val got = Corpus.snapshotDiff(docs).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    def n(p: Long => Boolean) = ids.count(p).toLong
    val want = Map(
      "added" -> n(id => id % 7 == 0 && id % 13 != 0),
      "removed" -> n(id => id % 7 != 0 && id % 13 == 0),
      "changed" -> n(id => id % 7 != 0 && id % 13 != 0 && id % 11 == 0),
      "unchanged" -> n(id => id % 7 != 0 && id % 13 != 0 && id % 11 != 0))
      .filter(_._2 > 0)
    assert(got == want)
    // every class must be represented or the diff semantics are untested
    assert(want.keySet == Set("added", "removed", "changed", "unchanged"))
  }

  test("lengthHistogram tiles the corpus and its cumulative share closes at 1") {
    val rows = Corpus.lengthHistogram(docs).orderBy(col("bucket")).collect()
    val nDocs = docs.count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    assert(rows.last.getLong(4) == nDocs)
    assert(math.abs(rows.last.getDouble(5) - 1.0) < 1e-9)
    // buckets are [lo, lo+16): every doc's token count lands in its bin
    rows.foreach { r => assert(r.getLong(1) == r.getLong(0) * 16) }
    // cumulative is strictly increasing across the occupied buckets
    assert(rows.map(_.getLong(4)).toSeq == rows.map(_.getLong(4)).toSeq.sorted)
  }

  test("c14 JSONL ingest quarantines exactly the planted corrupt lines") {
    // drive the gated query first so the fixture (500 good lines + 2
    // planted garbage lines) exists
    val good = Corpus.jsonlIngest(spark, dir)
    assert(good.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    // count the quarantine column (cached: Spark disallows corrupt-only
    // projections straight off the scan)
    val raw = Corpus.jsonlIngestRaw(spark, dir).cache()
    try {
      assert(raw.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(raw.filter(col("_corrupt_record").isNull).count() == docs.count())
      // quarantined lines carry the ORIGINAL text for re-routing
      val bad = raw.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record")).collect().map(_.getString(0)).toSet
      assert(bad.exists(_.contains("unterminated")) && bad.exists(_.contains("not json")))
    } finally raw.unpersist()
  }

  test("c19 nutrition label agrees with its component operators") {
    import org.apache.spark.sql.functions._
    val r = Corpus.nutritionLabel(docs).head()
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(2) == docs.select("lang").distinct().count())
    assert(r.getLong(3) == docs.select("source").distinct().count())
    // the duplicate count must equal d1's non-keeper count
    val nonKeepers = docs.count() -
      docs.select(md5(col("text"))).distinct().count()
    assert(r.getLong(5) == nonKeepers, "dup count ties out to the d1 rule")
    // this corpus's duplication is NEAR-dup (d3's domain), not byte-exact:
    // the exact-dup rate is legitimately 0 here and the tie-out above is
    // the real check
    assert(r.getDouble(6) >= 0 && r.getDouble(6) < 1)
    assert(r.getDouble(4) > 0)
  }

  test("t26 mojibake screen flags exactly the injected documents") {
    val rows = TextOps.mojibakeScreen(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == docs.count())
    rows.foreach { case (id, nRepl, nMoji, corrupted) =>
      if (id % 30 == 0) {
        assert(corrupted && nRepl == 1 && nMoji == 8, s"doc $id: $nRepl/$nMoji")
      } else assert(nRepl == 0 && nMoji == 0 && !corrupted, s"doc $id is clean ASCII")
    }
    assert(rows.count(_._4) > 0 && rows.count(!_._4) > 0)
  }

  test("t25 blocklist blocks exactly the injected documents at any length") {
    val rows = TextOps.blocklistScreen(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    assert(rows.length == docs.count())
    rows.foreach { case (id, nf, blocked) =>
      if (id % 25 == 0) {
        assert(blocked && nf >= 3, s"doc $id: injected must block (hits=$nf)")
      } else assert(nf == 0 && !blocked, s"doc $id is clean")
    }
    assert(rows.count(_._3) > 0 && rows.count(!_._3) > 0)
  }

  test("c18 fuzzy decontam flags the planted near-verbatim eval leaks, and only those") {
    val rows = Corpus.fuzzyDecontam(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // exact brute force: train docs with 3-gram Jaccard >= 0.8 to any eval doc
    val sh = docs.collect().map { r =>
      val toks = r.getString(1).split("\\s+")
      r.getLong(0) -> toks.sliding(3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val evalIds = sh.keys.filter(_ % 97 == 0).toSet
    def jac(a: Set[String], b: Set[String]) =
      a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)
    val wantFlagged = sh.keys.filterNot(evalIds).filter { id =>
      evalIds.exists(e => math.rint(jac(sh(id), sh(e)) * 10000) / 10000 >= 0.8)
    }.toSet
    assert(rows.filter(_._4).map(_._1).toSet == wantFlagged)
    assert(wantFlagged.nonEmpty, "the screen must be non-vacuous on this corpus")
    rows.filter(_._4).foreach { case (_, n, mj, _) => assert(n >= 1 && mj >= 0.8) }
  }

  test("c17 epoch shuffle: total, reproducible, epochs decorrelated") {
    def run() = Corpus.epochShuffle(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    val a = run(); val b = run()
    assert(a == b, "the permutation must be a pure function of (epoch, doc_id)")
    val n = docs.count()
    (0 to 1).foreach { ep =>
      assert(a.collect { case ((e, _), (cnt, _)) if e == ep => cnt }.sum == n,
        s"epoch $ep must route every document exactly once")
    }
    // different epochs produce different shard contents/orders
    val e0 = a.collect { case ((0, sh), (_, h)) => sh -> h }.toMap
    val e1 = a.collect { case ((1, sh), (_, h)) => sh -> h }.toMap
    assert(e0.keySet.intersect(e1.keySet).exists(sh => e0(sh) != e1(sh)),
      "epoch permutations must decorrelate")
  }

  test("t24 lang consistency flags every cross-language injection") {
    val rows = TextOps.langConsistency(docs).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(rows.length == docs.count())
    val (injected, natural) = rows.partition(_._1 % 20 == 0)
    injected.foreach { case (id, head, tail, consistent) =>
      assert(!consistent, s"doc $id: injected tail must flip the tail language ($head/$tail)")
    }
    // natural docs are mostly monolingual; both verdicts must occur
    assert(natural.count(_._4) > natural.length / 2)
    assert(injected.nonEmpty && natural.nonEmpty)
  }

  test("t23 code detection flags exactly the injected documents") {
    val rows = TextOps.codeDetect(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    assert(rows.length == docs.count())
    rows.foreach { case (id, nSym, isCode) =>
      if (id % 10 == 0) {
        // injected: 3–5 snippet units, each carrying 11 symbol chars
        val units = 3 + id % 3
        assert(nSym == units * 11, s"doc $id nSym=$nSym")
        assert(isCode, s"doc $id must be flagged")
      } else {
        assert(nSym == 0 && !isCode, s"doc $id is prose")
      }
    }
    assert(rows.count(_._3) > 0 && rows.count(!_._3) > 0)
  }

  test("c16 split leakage matrix equals the brute-force pair/split recomputation") {
    val split = Corpus.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = Dedup.minhashPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      val (lo, hi, dlo, dhi) = if (sa <= sb) (sa, sb, a, b) else (sb, sa, b, a)
      ((lo, hi), (dlo, dhi))
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.length.toLong, vs.map(_._2._1).distinct.length.toLong,
        vs.map(_._2._2).distinct.length.toLong))
    }
    val got = Corpus.splitLeakage(docs, 0.8).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // every near-dup pair lands in exactly one cell
    assert(got.values.map(_._1).sum == pairs.length)
    // the audit is non-vacuous on this corpus: there ARE near-dup pairs
    assert(pairs.nonEmpty)
  }

  test("t22 misraGries: never loses a locally-heavy item") {
    val rnd = new scala.util.Random(7)
    // adversarial-ish stream: zipfy head + long uniform tail
    val stream = Seq.fill(5000)(s"w${rnd.nextInt(30)}") ++
      Seq.tabulate(5000)(i => s"rare${i % 3000}")
    val n = stream.length
    val cap = 64
    val kept = TextOps.misraGries(stream.iterator, cap).toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    exact.foreach { case (tok, freq) =>
      if (freq > n / (cap + 1)) assert(kept.contains(tok), s"$tok freq=$freq dropped")
    }
    assert(kept.size <= cap)
  }

  test("t22 heavyHitters equals the plain exact top-k (sketch invisible)") {
    val got = TextOps.heavyHitters(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = docs.select(explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(TextOps.HeavyHitterK)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1L) }
    assert(got.toSeq == exact.toSeq)
    assert(got.length == TextOps.HeavyHitterK)
    // the exactness condition itself holds with real margin on this corpus
    val nTok = docs.select(explode(split(col("text"), "\\s+"))).count()
    assert(got.last._2 >= nTok / TextOps.HeavyHitterCap * 4,
      s"k-th freq ${got.last._2} too close to N/cap ${nTok / TextOps.HeavyHitterCap}")
  }

  test("t21 novelty: a planted exact copy scores dup_share 1.0") {
    import spark.implicits._
    val copied = docs.limit(3).select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val aug = docs.select(col("doc_id"), col("text")).unionByName(copied)
    val nov = TextOps.ngramNovelty(aug)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every planted copy (and its original) shares ALL its 8-grams
    copied.collect().map(_.getLong(0)).foreach { id =>
      assert(nov(id) == 1.0, s"copy $id dup_share ${nov(id)}")
      assert(nov(id - 1000000L) == 1.0, s"original ${id - 1000000L}")
    }
    // and novelty is non-degenerate: most of the corpus is NOT fully duped
    assert(nov.values.count(_ < 1.0) > nov.size / 2)
  }

  test("c15 mergeSchema surfaces the late column as NULL on early shards") {
    val got = Corpus.schemaEvolution(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = docs.select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (lang, rows) =>
        lang -> ((rows.size.toLong,
          rows.count(_._2 % 2 == 1).toLong,
          rows.filter(_._2 % 2 == 1).map(_._3 % 97).sum))
      }
    assert(got == want)
    // every lang must have BOTH scored and unscored rows, or the
    // null-fill path is untested
    got.values.foreach { case (n, scored, _) => assert(scored > 0 && scored < n) }
  }

  test("importanceWeights ranks target-source documents above the raw mean") {
    val iw = Corpus.importanceWeights(docs).join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("iw").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(iw.length == docs.count())
    val (tgt, rest) = iw.partition(r => Corpus.ImportanceTargets.contains(r._2))
    val mt = tgt.map(_._3).sum / tgt.length
    val mr = rest.map(_._3).sum / rest.length
    // the DSIR estimator must score the target slice itself higher on
    // average than the remainder — otherwise the log-ratio is miswired
    assert(mt > mr, s"target mean $mt !> rest mean $mr")
    // weights are finite (smoothing covers unseen-in-target tokens)
    iw.foreach { case (id, _, w) => assert(!w.isNaN && !w.isInfinite, s"doc $id") }
  }

  test("bloomDedup equals incrementalDedup (the sketch is invisible)") {
    val viaBloom = Dedup.bloomDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val plain = Dedup.incrementalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaBloom == plain)
    assert(viaBloom.nonEmpty)
    // the two corpus-facing paths split the delta: bloom-negative rows are
    // kept with NO join — at a realistic fpp nearly all of a mostly-new
    // delta short-circuits (here: every row, since the fixture has no
    // cross-split dups and fpp collisions at this scale are unlikely)
    val plan = Dedup.bloomDedup(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("UDF"), plan) // the local sketch test is in-plan
  }

  test("c21 stratified split: exact per-stratum allocation, deterministic, exhaustive") {
    val rows = Corpus.stratifiedSplit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._4).sum == docs.count(), "every document assigned exactly once")
    val strata = rows.groupBy(r => (r._1, r._2))
    assert(strata.size > 5, "need several strata for the test to mean anything")
    strata.foreach { case ((lang, b), ss) =>
      val m = ss.map(r => r._3 -> r._4).toMap
      val n = m.values.sum
      val (test, vl) = (m.getOrElse("test", 0L), m.getOrElse("val", 0L))
      // rank-mod allocation: each slice within ONE document of n/10 —
      // a Bernoulli split only achieves this in expectation
      assert(math.abs(test - n / 10.0) <= 1.0, s"stratum ($lang,$b): test=$test of $n")
      assert(math.abs(vl - n / 10.0) <= 1.0, s"stratum ($lang,$b): val=$vl of $n")
      assert(m.getOrElse("train", 0L) == n - test - vl)
    }
    // seeded: a second run is identical
    val again = Corpus.stratifiedSplit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("t28 homoglyph screen flags exactly the spoofed docs, with script counts conserved") {
    val rows = TextOps.homoglyphScreen(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, (nLat, nCyr, nMixed, spoofed)) =>
      val t = texts(id)
      val aeo = t.count("aeo".contains(_))
      val letters = t.count(_.isLetter) // fixture is pure ASCII letters+spaces
      if (id % 9 == 0) {
        // the swap moves exactly the a/e/o mass from Latin to Cyrillic
        assert(spoofed && nCyr == aeo && nLat == letters - aeo, s"doc $id")
        assert(nMixed >= 1, s"doc $id: swap must leave mixed-script tokens")
      } else {
        assert(!spoofed && nCyr == 0 && nMixed == 0 && nLat == letters, s"doc $id")
      }
    }
  }

  test("t27 boilerplate flags exactly the injected docs, at exactly the footer's interior grams") {
    val rows = TextOps.boilerplate(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(rows.size == docs.count())
    rows.foreach { case (id, (nGrams, nBoiler, flagged)) =>
      assert(nGrams > 0)
      if (id % 7 == 0) {
        // the 7-token footer contributes exactly its 7-4+1 = 4 interior
        // 4-grams as source-boilerplate; the splice-straddling grams mix
        // document-unique natural tokens and stay under the relative bar
        assert(flagged && nBoiler == 4, s"doc $id: nBoiler=$nBoiler flagged=$flagged")
      } else {
        // natural grams never reach max(3, ceil(5% of source docs))
        assert(!flagged && nBoiler == 0, s"doc $id: nBoiler=$nBoiler flagged=$flagged")
      }
    }
  }

  test("c23 curriculum: phases are quality-monotone deciles within one doc of ideal") {
    val rows = Corpus.curriculumSchedule(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val n = docs.count()
    assert(rows.length.toLong == n, "every document scheduled exactly once")
    // phase is monotone non-increasing in quality (better quality → earlier)
    val byPhase = rows.groupBy(_._3)
    assert(byPhase.keySet.forall(p => p >= 1 && p <= 10))
    for (p <- byPhase.keys; p2 <- byPhase.keys if p < p2) {
      assert(byPhase(p).map(_._2).min >= byPhase(p2).map(_._2).max,
        s"phase $p must dominate phase $p2 in quality")
    }
    // ceil-decile arithmetic: cumulative count through phase k is within a
    // quality-TIE GROUP of k·n/10 (ties never split phases)
    val phaseCounts = byPhase.view.mapValues(_.size.toLong).toMap
    val maxTie = rows.groupBy(_._2).values.map(_.size).max.toLong
    var cum = 0L
    for (k <- 1L to 10L) {
      cum += phaseCounts.getOrElse(k, 0L)
      if (k < 10) assert(math.abs(cum - k * n / 10.0) <= maxTie,
        s"phase boundary $k at $cum vs ideal ${k * n / 10.0} (tie $maxTie)")
    }
    // ord is the salted md5 — spot-check one
    val (id0, _, _, ord0) = rows.head
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(s"c23:$id0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(ord0 == want)
  }

  test("t32 Kneser-Ney: probabilities are a proper distribution and match a recount") {
    val rows = TextOps.knBigramScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
      .filter(_._2.length >= 2)
    assert(rows.length == texts.length)
    // fits from the raw fixture
    val allBigrams = texts.flatMap { case (_, t) => t.zip(t.tail) }
    val big = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = allBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1pW1 = big.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1pW2 = big.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = big.size.toDouble
    def p(w1: String, w2: String): Double =
      math.max(big((w1, w2)).toDouble - 0.75, 0.0) / c1(w1) +
        (0.75 * n1pW1(w1) / c1(w1)) * (n1pW2(w2) / nTypes)
    // KN leaves a PROPER conditional: Σ_w2 p(w2|w1) == 1 for every context
    // present in the corpus (the discounted mass exactly funds the backoff
    // when the continuation distribution is normalized over seen types)
    val someCtx = c1.keys.take(20)
    someCtx.foreach { w1 =>
      // keys is a SET — map through a Seq or equal p-values collapse
      val total = n1pW2.keys.toSeq.map { w2 =>
        math.max(big.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) / c1(w1) +
          (0.75 * n1pW1(w1) / c1(w1)) * (n1pW2(w2) / nTypes)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context '$w1' sums to $total")
    }
    // per-doc score recount
    rows.foreach { case (id, nB, lp) =>
      val t = texts.toMap.apply(id)
      val lns = t.zip(t.tail).map { case (a, b) =>
        BigDecimal(math.log(p(a, b))).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(nB == t.length - 1L)
      val want = BigDecimal(lns.sum.toDouble / nB)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lp - want) <= 1e-4, s"doc $id: $lp vs $want")
    }
  }

  test("t31 keywords: scores match a recount, stopword-class tokens never win") {
    val rows = TextOps.keywords(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val n = texts.size
    val dfm = texts.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (id, ks) =>
      assert(ks.map(_._2).sorted.toSeq == (1L to math.min(3, texts(id).distinct.size)))
      def sc(tok: String, tf: Long): Double =
        BigDecimal(tf.toDouble * math.log(n.toDouble / dfm(tok)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      ks.foreach { case (_, _, tok, tf, df, score) =>
        assert(tf == texts(id).count(_ == tok).toLong && df == dfm(tok))
        assert(score == sc(tok, tf), s"doc $id tok $tok: $score vs ${sc(tok, tf)}")
      }
      // the winner is the true argmax under (score desc, token)
      val cand = texts(id).distinct.map { tok =>
        (tok, sc(tok, texts(id).count(_ == tok).toLong))
      }.sortBy { case (tok, s) => (-s, tok) }
      assert(ks.minBy(_._2)._3 == cand.head._1, s"doc $id winner")
    }
    // corpus-universal tokens (df == N) score zero and can only appear if a
    // document has almost no distinctive vocabulary
    val universal = dfm.filter(_._2 == n.toLong).keySet
    assert(rows.filter(r => universal(r._3)).forall(_._6 == 0.0))
  }

  test("c25 quality drift: z-scores match a recount, batches exhaustive") {
    val rows = Corpus.qualityDrift(docs).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val scored = TextOps.qualityScores(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().map(r => ((r.getString(r.length - 1), r.getLong(0) / 50),
        r.getDouble(r.fieldIndex("quality"))))
    val byBatch = scored.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.keySet == byBatch.keySet)
    assert(rows.values.map(_._1).sum == docs.count())
    byBatch.foreach { case (k, qs) =>
      val (n, mq, z, drifted) = rows(k)
      assert(n == qs.length.toLong)
      val wantMq = BigDecimal(qs.map(BigDecimal(_)).sum.toDouble / qs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mq == wantMq, s"$k mean $mq vs $wantMq")
      assert(drifted == (math.abs(z) > 2.0))
    }
    // the monitor discriminates: flagged and unflagged batches both exist
    assert(rows.values.exists(_._4) && rows.values.exists(!_._4))
  }

  test("c24 repetition budget: epochs follow phases, served mass adds up") {
    val rows = Corpus.repetitionBudget(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length.toLong == docs.count())
    rows.foreach { case (_, phase, nTok, epochs, served) =>
      val want = if (phase <= 2) 4L else if (phase <= 5) 2L else 1L
      assert(epochs == want && served == nTok * epochs)
    }
    // the schedule actually discriminates: all three repetition tiers occur,
    // and served mass strictly exceeds unique mass
    assert(rows.map(_._4).distinct.sorted.toSeq == Seq(1L, 2L, 4L))
    assert(rows.map(_._5).sum > rows.map(_._3).sum)
  }

  test("t30 heaps growth: checkpoint censuses match a recount, curve monotone, fit sane") {
    val rows = TextOps.heapsGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val texts = docs.collect().map(r => r.getLong(0) ->
      (r.getString(1) + " w" + math.floor(math.sqrt(r.getLong(0).toDouble)).toLong)
        .split("\\s+").toSeq)
    val (mn, mx) = (texts.map(_._1).min, texts.map(_._1).max)
    rows.foreach { case (k, nDocs, nTok, vocab, _, _) =>
      val cut = mn + (mx - mn) * k / 10
      val prefix = texts.filter(_._1 <= cut)
      assert(nDocs == prefix.length.toLong, s"k=$k docs")
      assert(nTok == prefix.map(_._2.size.toLong).sum, s"k=$k tokens")
      assert(vocab == prefix.flatMap(_._2).distinct.size.toLong, s"k=$k vocab")
    }
    // growth curve is monotone and sub-linear (vocab grows slower than tokens)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 > a._3 && b._4 >= a._4)
    }
    val beta = rows.head._5
    assert(rows.forall(r => r._5 == beta && r._6 == rows.head._6), "fit must be global")
    assert(beta > 0 && beta < 1, s"Heaps exponent out of range: $beta")
  }

  test("t29 collocations: dice matches hand-count, min-count honored, ordered cut") {
    val rows = TextOps.collocations(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 50)
    // recompute counts from the raw fixture
    val texts = docs.collect().map(_.getString(1)).map(_.split("\\s+").toSeq).filter(_.length >= 2)
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = texts.flatMap(t => t.zip(t.tail)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (w1, w2, nPair, nW1, nW2, dice) =>
      assert(nPair >= 3 && big((w1, w2)) == nPair)
      assert(uni(w1) == nW1 && uni(w2) == nW2)
      assert(math.abs(dice - 2.0 * nPair / (nW1 + nW2)) < 1e-4)
    }
    // the cut is the global (dice desc, w1, w2) prefix of the qualifying set
    val all = big.filter(_._2 >= 3).toSeq.map { case ((w1, w2), c) =>
      (BigDecimal(2.0 * c / (uni(w1) + uni(w2))).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, w1, w2)
    }.sortBy { case (d, w1, w2) => (-d, w1, w2) }.take(50)
    assert(rows.map(r => (r._6, r._1, r._2)).toSeq == all)
  }

  test("c22 cluster reps: one keeper per cluster, and it is the best-quality member") {
    val rows = Corpus.clusterReps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // covers exactly the d5 cluster membership
    assert(rows.length.toLong == Dedup.dupClusters(docs, 0.8).count())
    assert(rows.nonEmpty, "fixture must contain near-dup clusters")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $c: ${keepers.length} keepers")
      // the elected member is the (quality desc, doc_id asc) minimum
      val expected = members.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == expected._1,
        s"cluster $c kept ${keepers.head._1}, expected ${expected._1}")
    }
    // at least one cluster must have elected a NON-minimum doc_id keeper
    // somewhere across both SFs for the operator to differ from d5's
    // cluster==doc_id rule; on this fixture quality ties are broken by
    // doc_id so equality CAN happen per cluster — assert only the rule.
    val again = Corpus.clusterReps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("c31 sampling shares: distributions normalize, temperature flattens, repetition prices it") {
    val rows = Corpus.samplingShares(docs).collect().map { r =>
      (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
    }
    assert(rows.nonEmpty)
    // both share columns are distributions (rounding slack only)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "raw shares")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3, "temp shares")
    // expected draws re-spend exactly the one-epoch token budget
    val tot = rows.map(_._2).sum.toDouble
    assert(math.abs(rows.map(_._5).sum - tot) < tot * 1e-3)
    // temperature FLATTENS: the biggest source's temp share is below its
    // raw share, the smallest's above — and the repetition factor prices
    // it (smallest repeats > 1, biggest < 1)
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(big._4 < big._3, s"big source must be damped: $big")
    assert(small._4 > small._3, s"small source must be boosted: $small")
    assert(small._6 > 1.0 && big._6 < 1.0, s"repetition prices the flattening: $small $big")
  }

  test("c35: the m28 plant straddling the visual split lands as a drop verdict") {
    // train image 18 is eval image 15's +1-pixel copy (the m28 plant) —
    // its TEXT is clean, so c33 says keep; the multimodal ledger must say
    // drop on the visual signal alone (media and text gate together)
    val led = Corpus.decontamLedgerMm(spark, dir)
      .select(col("doc_id"), col("n_visual"), col("verdict")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val (nVis18, verdict18) = led(18L)
    assert(nVis18 > 0, s"train 18 must carry the visual signal: $nVis18")
    assert(verdict18 == "drop", s"visual near-identity must drop: $verdict18")
    // every visually flagged doc is dropped, none leaks through as keep
    led.values.filter(_._1 > 0).foreach { case (_, v) => assert(v == "drop") }
    // and the visual signal is additive: no doc LOST its text verdict —
    // c33's drop set is a subset of c35's
    val c33drop = Corpus.decontamLedger(spark, dir)
      .filter(col("verdict") === "drop").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val c35drop = led.filter(_._2._2 == "drop").keySet
    assert(c33drop.subsetOf(c35drop), s"lost drops: ${c33drop -- c35drop}")
  }

  test("c34: attrition columns are consistent and survivors pack exactly") {
    val rows = Corpus.releaseExport(spark, dir).collect()
    assert(rows.nonEmpty)
    // the one-row attach is constant across pack rows
    val att = rows.map(r => (r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8))).distinct
    assert(att.length == 1, s"attrition must be constant: $att")
    val (docsIn, dropQ, dropD, dropC, packed) = att.head
    assert(docsIn == dropQ + dropD + dropC + packed,
      s"stage attribution must partition docs_in: $att")
    assert(packed > 0 && dropQ > 0, s"both flows must be live at the gate SF: $att")
    // pack-grain docs sum back to the survivor count
    assert(rows.map(_.getLong(2)).sum == packed)
  }

  test("c36: incremental export conserves survivors/tokens vs the global repack; packs append-only") {
    val full = Corpus.releaseExport(spark, dir).collect()
    val incr = Corpus.incrementalReleaseExport(spark, dir).collect()
    // staging commutes with the shard split: identical attrition counters
    assert(full.head.getLong(4) == incr.head.getLong(5), "docs_in diverged")
    assert(full.head.getLong(8) == incr.head.getLong(9), "docs_packed diverged")
    // token conservation: the survivors' mass is split-invariant
    assert(full.map(_.getLong(3)).sum == incr.map(_.getLong(3)).sum, "token mass diverged")
    // immutability price: append-only packing never uses FEWER packs than
    // the global repack (fragmentation is bounded below by optimality)
    assert(incr.length >= full.length, s"incr=${incr.length} full=${full.length}")
    // append-only: every delta pack id sits at/after its source's standing
    // pack range
    val standingMax = incr.filter(!_.getBoolean(4))
      .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).max }
    incr.filter(_.getBoolean(4)).foreach { r =>
      standingMax.get(r.getString(0)).foreach { mx =>
        assert(r.getLong(1) > mx, s"delta pack ${r.getLong(1)} inside standing range (max $mx)")
      }
    }
    // both shards actually contribute packs at the gate SF
    assert(incr.exists(_.getBoolean(4)) && incr.exists(!_.getBoolean(4)))
  }
}
