package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, heuristic language ID, and winnowing document
  * fingerprints. All per-document — embarrassingly parallel, no shuffle
  * except final aggregation. */
object TextOps {

  private def toks: Column = split(col("text"), "\\s+")

  /** Token counting: whitespace tokens, distinct tokens, mean token length. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tok"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_uniq"),
        round(
          expr("aggregate(toks, 0, (acc, t) -> acc + length(t))").cast(DoubleType) / size(col("toks")),
          4).as("avg_len"))

  /** Array scalar-function panel over token arrays (sort / membership /
    * slice / distinct-count), oracle-checked against DuckDB list functions. */
  def arrayOps(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        element_at(sort_array(col("toks")), 1).as("first_tok"),
        element_at(sort_array(col("toks"), asc = false), 1).as("last_tok"),
        array_contains(col("toks"), "the").as("has_the"),
        size(slice(col("toks"), 1, 3)).cast(LongType).as("head3"))

  /** BPE-style pre-tokenization regex (GPT-2-ish word/number/punct groups
    * with attached leading space), restricted to constructs whose semantics
    * are identical in Java regex (Spark) and RE2 (DuckDB) so the oracle can
    * replicate token counts exactly. */
  val BpeTokenRe: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** BPE-ish token panel: pre-tokenizer token count, distinct token count,
    * and the whitespace-token ratio (how much finer the BPE-ish split is). */
  def bpeTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        // group index 0 (whole match) — Spark defaults to group 1, DuckDB to 0
        expr(s"regexp_extract_all(text, '${BpeTokenRe}', 0)").as("bt"),
        toks.as("wt"))
      .select(col("doc_id"),
        size(col("bt")).cast(LongType).as("n_bpe"),
        size(array_distinct(col("bt"))).cast(LongType).as("n_bpe_uniq"),
        round(size(col("bt")).cast(DoubleType) / size(col("wt")), 4).as("fanout"))

  /** DuckDB oracle twin of [[bpeTokens]], built from the same regex. */
  def bpeTokensOracleSql: String =
    s"""SELECT doc_id,
       | len(bt) AS n_bpe,
       | len(list_distinct(bt)) AS n_bpe_uniq,
       | round(CAST(len(bt) AS DOUBLE) / len(wt), 4) AS fanout
       |FROM (SELECT doc_id, regexp_extract_all(text, '$BpeTokenRe') AS bt,
       |             string_split_regex(text, '\\s+') AS wt
       |      FROM documents) s""".stripMargin

  // ---------------- REAL BPE (fitted merges + encode) ----------------

  /** Merge-table size and the word-vocabulary cap for the fit. The cap is
    * what makes the fit corpus-size-INDEPENDENT at 100 TB: the driver loop
    * runs over the top-`BpeVocabCap` (word, freq) rows — the same
    * bounded-artifact shape as [[Similarity]]'s IvfTrainCap — while the
    * distributed side is one (token → count) aggregation. */
  val BpeNumMerges = 120
  val BpeVocabCap = 20000

  /** Where the fitted merge table is dumped so the oracle can replay
    * encoding from the same artifact (the centroid/codebook pattern). */
  lazy val BpeMergesDump: String = s"${Similarity.OracleDumpRoot}/t6b_merges"

  /** One merge step applied to a symbol sequence: greedy left-to-right,
    * non-overlapping — the BPE learner's replacement rule. A merged symbol
    * can never re-merge within the same pass (`l+r == l` or `== r` would
    * need the other side empty), which is exactly why this fold is
    * equivalent to DuckDB's left-to-right non-overlapping `replace()` on
    * the delimited string form the oracle uses. */
  private[ops] def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out(out.length - 1) == l && syms(i) == r)
        out(out.length - 1) = l + r
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Fit a BPE merge table on the corpus: pre-tokenize with [[BpeTokenRe]],
    * aggregate the (token, freq) vocabulary (ONE shuffle, capped at
    * [[BpeVocabCap]] by freq DESC, token ASC — deterministic), then run the
    * classic learner loop on the driver: count adjacent symbol pairs
    * weighted by word frequency, merge the most frequent pair (ties to the
    * lexicographically smallest), repeat. Stops early when the best pair
    * occurs once — merging hapax pairs is noise. */
  private[ops] def fitBpeMerges(docs: DataFrame, nMerges: Int = BpeNumMerges,
      cap: Int = BpeVocabCap): Array[(String, String)] = {
    val wf: Array[(String, Long)] = docs
      .select(explode(expr(s"regexp_extract_all(text, '$BpeTokenRe', 0)")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(cap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (w.toCharArray.map(_.toString), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, bestN) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (bestN < 2) done = true
        else {
          out += best
          words = words.map { case (syms, f) => (mergePair(syms, best._1, best._2), f) }
        }
      }
    }
    out.toArray
  }

  /** Dump the fitted merges for the replay oracle
    * (schema: rank int starting at 1, l string, r string). */
  private def dumpMerges(spark: SparkSession, merges: Array[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.toSeq.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "l", "r").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Encode one pre-token: apply every merge in rank order (one greedy
    * left-to-right pass each — identical operation sequence to the
    * oracle's recursive replace), return the surviving symbol count. */
  private[ops] def bpeSymbolCount(tok: String, merges: Array[(String, String)]): Int = {
    var syms = tok.toCharArray.map(_.toString)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = mergePair(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms.length
  }

  /** REAL BPE encoding as a gated query: fit merges on the corpus, dump
    * them, then encode every document row-locally (per-partition memo
    * cache over the token vocabulary — the encode cost is per DISTINCT
    * token, not per occurrence). Emits per-doc pre-token count, total
    * post-merge symbol count, and the chars-per-symbol compression ratio.
    *
    * Scale shape: the fit is one capped aggregation + a driver loop over
    * ≤[[BpeVocabCap]] rows (corpus-size independent); the encode pass is a
    * zero-shuffle map with the ~120-pair merge table riding in the task
    * closure. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = fitBpeMerges(docs)
    dumpMerges(spark, merges, BpeMergesDump)
    implicit val inEnc = Encoders.product[(Long, Seq[String])]
    val outEnc = Encoders.product[(Long, Long, Long, Long)]
    docs.select(col("doc_id"),
        expr(s"regexp_extract_all(text, '$BpeTokenRe', 0)").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        // zero-token docs (empty text — every nonempty string matches the
        // pre-tokenizer) emit NO row, matching the oracle's inner join on
        // the token vocabulary
        it.filter(_._2.nonEmpty).map { case (id, toks) =>
          var nTok = 0L; var nChar = 0L; var nSym = 0L
          toks.foreach { t =>
            nTok += 1; nChar += t.length
            nSym += cache.getOrElseUpdate(t, bpeSymbolCount(t, merges))
          }
          (id, nTok, nChar, nSym)
        }
      }(outEnc)
      .toDF("doc_id", "n_tok", "n_char", "n_sym")
      .withColumn("ratio", round(col("n_char").cast(DoubleType) / col("n_sym"), 4))
  }

  /** DuckDB twin of [[bpeEncode]]: reads the dumped merge table and
    * replays encoding over the DISTINCT token vocabulary with a recursive
    * CTE — one step per merge rank, each step a left-to-right
    * non-overlapping `replace()` on a chr(1)-delimited symbol string
    * (symbols never contain chr(1), so matches cannot span or split
    * symbols) — then joins symbol counts back to token occurrences. It can
    * only match if the engine applied the same merges in the same order
    * with the same greedy semantics. */
  def bpeEncodeOracleSql: String =
    s"""WITH RECURSIVE
       | merges AS (SELECT CAST(rank AS INT) AS rank, l, r
       |            FROM read_parquet('$BpeMergesDump/*.parquet')),
       | nm AS (SELECT CAST(coalesce(max(rank), 0) AS INT) AS n FROM merges),
       | toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '$BpeTokenRe')) AS tok
       |          FROM documents),
       | vocab AS (SELECT DISTINCT tok FROM toks),
       | enc AS (
       |   SELECT tok,
       |     array_to_string(list_transform(range(1, length(tok) + 1),
       |       i -> chr(1) || substr(tok, CAST(i AS INT), 1) || chr(1)), '') AS s,
       |     0 AS rank
       |   FROM vocab
       |   UNION ALL
       |   SELECT e.tok,
       |     replace(e.s, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
       |             chr(1) || m.l || m.r || chr(1)),
       |     e.rank + 1
       |   FROM enc e JOIN merges m ON m.rank = e.rank + 1
       | ),
       | fin AS (SELECT tok,
       |          CAST((length(s) - length(replace(s, chr(1), ''))) / 2 AS BIGINT) AS n_sym,
       |          CAST(length(tok) AS BIGINT) AS n_char
       |         FROM enc, nm WHERE enc.rank = nm.n)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       | CAST(sum(f.n_char) AS BIGINT) AS n_char,
       | CAST(sum(f.n_sym) AS BIGINT) AS n_sym,
       | round(CAST(sum(f.n_char) AS DOUBLE) / sum(f.n_sym), 4) AS ratio
       |FROM toks t JOIN fin f USING (tok)
       |GROUP BY t.doc_id""".stripMargin

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Deterministic line-structure injection for the t16 gate (the
    * [[withSyntheticPii]] pattern): the synthetic corpus is single-line, so
    * the gate synthesizes the structure the line-level Gopher rules read —
    * 12-token lines, every line with `(doc_id + line) % 4 == 0` bulleted
    * with `"- "`, every line with `(doc_id + line) % 5 == 0` suffixed with
    * `" ..."`. Purely positional, so DuckDB replays it exactly. */
  def withSyntheticLines(docs: DataFrame): DataFrame = {
    val toksC = split(col("text"), "\\s+")
    val nLines = ceil(size(toksC).cast(DoubleType) / lit(12.0)).cast(IntegerType)
    val linesC = transform(sequence(lit(0), nLines - 1), j =>
      concat(
        when((col("doc_id") + j) % 4 === 0, lit("- ")).otherwise(lit("")),
        concat_ws(" ", slice(toksC, j * lit(12) + 1, lit(12))),
        when((col("doc_id") + j) % 5 === 0, lit(" ...")).otherwise(lit(""))))
    docs.withColumn("text", array_join(linesC, "\n"))
  }

  /** Gopher-style quality-rule verdicts (Rae et al. 2021, the repetition
    * signals are [[repetitionStats]]'s job): per-document rule flags and the
    * composite `keep` decision a corpus filter actually cuts on —
    * word-count bounds, mean-word-length bounds, bullet-line and
    * ellipsis-line ratios, and a minimum stopword-variety count. Words are
    * whitespace tokens containing a letter, so injected bullet/ellipsis
    * markers count toward line structure, not toward words.
    *
    * Every flag compares INTEGERS (cross-multiplied rationals: mean word
    * length in [3, 23/5], bullet ratio ≤ 3/10, ellipsis ratio ≤ 1/4), so
    * the verdicts are bit-exact cross-engine; the 4-decimal ratio columns
    * are reporting only. The word-length band is tightened from Gopher's
    * published [3, 10] so the synthetic corpus exercises both outcomes.
    *
    * Scale shape: zero shuffle — one row-local pass; at 100 TB this is a
    * map-only filter stage ahead of every expensive operator. */
  def gopherRules(docs: DataFrame, minWords: Int = 20, maxWords: Int = 80,
      minStop: Int = 2): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    val sig = docs.select(col("doc_id"),
      split(col("text"), "\n").as("lns"),
      filter(split(col("text"), "\\s+"), w => w.rlike("[a-z]")).as("words"))
      .select(col("doc_id"),
        size(col("words")).cast(LongType).as("n_words"),
        aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).as("sum_wlen"),
        size(col("lns")).cast(LongType).as("n_lines"),
        size(filter(col("lns"), l => l.startsWith("- "))).cast(LongType).as("n_bullet"),
        size(filter(col("lns"), l => l.endsWith("..."))).cast(LongType).as("n_ellipsis"),
        size(array_intersect(array_distinct(col("words")), stopArr)).cast(LongType).as("n_stop"))
    sig.select(col("doc_id"), col("n_words"), col("sum_wlen"), col("n_lines"),
        col("n_bullet"), col("n_ellipsis"), col("n_stop"),
        // ANSI mode throws on /0, DuckDB yields NULL — make NULL explicit
        when(col("n_words") > 0,
          round(col("sum_wlen").cast(DoubleType) / col("n_words"), 4)).as("mean_wlen"),
        round(col("n_bullet").cast(DoubleType) / col("n_lines"), 4).as("bullet_ratio"),
        round(col("n_ellipsis").cast(DoubleType) / col("n_lines"), 4).as("ellipsis_ratio"),
        col("n_words").between(minWords, maxWords).as("ok_words"),
        (col("sum_wlen") >= lit(3) * col("n_words") &&
          lit(5) * col("sum_wlen") <= lit(23) * col("n_words")).as("ok_wlen"),
        (lit(10) * col("n_bullet") <= lit(3) * col("n_lines")).as("ok_bullet"),
        (lit(4) * col("n_ellipsis") <= col("n_lines")).as("ok_ellipsis"),
        (col("n_stop") >= minStop).as("ok_stop"))
      .withColumn("keep",
        col("ok_words") && col("ok_wlen") && col("ok_bullet") && col("ok_ellipsis") && col("ok_stop"))
  }

  /** DuckDB oracle twin of [[withSyntheticLines]] ∘ [[gopherRules]] —
    * injection and every rule replayed from the same constants
    * ([[Stopwords]] interpolated, never copied). */
  /** The [[withSyntheticLines]] injection as DuckDB CTEs — `inj(doc_id,
    * ls)` (the line list) and `st(doc_id, text)` (rejoined). ONE copy
    * shared by the t16 and d12 oracles so the replay can never drift from
    * itself. */
  private[ops] val syntheticLinesCtes: String =
    """base AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      | inj AS (SELECT doc_id,
      |   [CASE WHEN (doc_id + j) % 4 = 0 THEN '- ' ELSE '' END ||
      |    array_to_string(t[12*j+1:12*j+12], ' ') ||
      |    CASE WHEN (doc_id + j) % 5 = 0 THEN ' ...' ELSE '' END
      |    FOR j IN range(0, CAST(ceil(len(t) / 12.0) AS INT))] AS ls
      |   FROM base),
      | st AS (SELECT doc_id, array_to_string(ls, chr(10)) AS text FROM inj)""".stripMargin

  def gopherRulesOracleSql(minWords: Int = 20, maxWords: Int = 80,
      minStop: Int = 2): String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(",")
    s"""WITH $syntheticLinesCtes,
       | r AS (SELECT doc_id, string_split(text, chr(10)) AS lns,
       |        list_filter(string_split_regex(text, '\\s+'), w -> regexp_matches(w, '[a-z]')) AS words
       |       FROM st),
       | sig AS (SELECT doc_id,
       |   CAST(len(words) AS BIGINT) AS n_words,
       |   CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS sum_wlen,
       |   CAST(len(lns) AS BIGINT) AS n_lines,
       |   CAST(len(list_filter(lns, l -> starts_with(l, '- '))) AS BIGINT) AS n_bullet,
       |   CAST(len(list_filter(lns, l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis,
       |   CAST(len(list_intersect(list_distinct(words), [$stopList])) AS BIGINT) AS n_stop
       |  FROM r)
       |SELECT doc_id, n_words, sum_wlen, n_lines, n_bullet, n_ellipsis, n_stop,
       | round(CAST(sum_wlen AS DOUBLE) / n_words, 4) AS mean_wlen,
       | round(CAST(n_bullet AS DOUBLE) / n_lines, 4) AS bullet_ratio,
       | round(CAST(n_ellipsis AS DOUBLE) / n_lines, 4) AS ellipsis_ratio,
       | (n_words BETWEEN $minWords AND $maxWords) AS ok_words,
       | (sum_wlen >= 3 * n_words AND 5 * sum_wlen <= 23 * n_words) AS ok_wlen,
       | (10 * n_bullet <= 3 * n_lines) AS ok_bullet,
       | (4 * n_ellipsis <= n_lines) AS ok_ellipsis,
       | (n_stop >= $minStop) AS ok_stop,
       | ((n_words BETWEEN $minWords AND $maxWords) AND
       |  (sum_wlen >= 3 * n_words AND 5 * sum_wlen <= 23 * n_words) AND
       |  (10 * n_bullet <= 3 * n_lines) AND (4 * n_ellipsis <= n_lines) AND
       |  (n_stop >= $minStop)) AS keep
       |FROM sig""".stripMargin
  }

  /** BM25-style salient-term extraction: the top-k most relevant terms per
    * document, scored with the BM25 weighting (k1=1.2, b=0.75) over
    * whitespace tokens — the standard relevance primitive for corpus
    * exploration and topic filters.
    *
    * The idf is the standard (Lucene-shape) smoothed log
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` — the log must stay, because it
    * scales only the idf FACTOR of the idf×tf-saturation product, so a
    * log-free variant can rank terms differently within a document (high-idf
    * low-tf vs low-idf high-tf). `ln` is 1-ulp implementation-defined across
    * engines, but the gate's `round(score, 4)` absorbs last-ulp differences
    * (same argument as q25's quantile_cont — measured clean cross-engine).
    *
    * Scale shape: tf is one (doc,term) aggregation, df one term-keyed
    * aggregation of the tf relation, the corpus stats a broadcast one-row
    * join; the final top-k is a per-doc window that plans as
    * WindowGroupLimit. */
  def bm25TopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), toks.as("toks"))
    val lens = base.select(col("doc_id"), size(col("toks")).cast(LongType).as("len"))
    val tf = base.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      (sum(col("len")).cast(DoubleType) / count(lit(1))).as("avglen"))
    val score =
      log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avglen")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    tf.join(lens, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), round(col("score"), 4).as("bm25"),
        col("rnk").cast(LongType).as("rnk"))
  }

  /** DuckDB oracle twin of [[bm25TopTerms]] — same expression tree, same
    * smoothed log idf, same (score DESC, term) rank. */
  def bm25OracleSql(k: Int = 3): String =
    s"""WITH base AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       | lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM base),
       | tf AS (SELECT doc_id, unnest(toks) AS term FROM base),
       | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
       | dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
       | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |            CAST(sum(len) AS DOUBLE) / count(*) AS avglen FROM lens),
       | scored AS (SELECT t.doc_id, t.term,
       |    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (t.tf * 2.2) /
       |    (t.tf + 1.2 * (0.25 + 0.75 * l.len / s.avglen)) AS score
       |  FROM tfc t JOIN lens l USING (doc_id) JOIN dfreq d USING (term), stats s),
       | r AS (SELECT doc_id, term, round(score, 4) AS bm25,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
       |       FROM scored)
       |SELECT doc_id, term, bm25, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= $k""".stripMargin

  /** Quality scoring: length, whitespace ratio, stopword ratio, vocabulary
    * richness, and a composite score — the usual cheap pre-filters before
    * expensive pipeline stages. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(",")
    docs.select(col("doc_id"), col("text"), toks.as("toks"))
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("len_text"),
        (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit("")))).cast(LongType).as("n_space"),
        round(expr(s"size(filter(toks, t -> t IN ($stopList)))").cast(DoubleType) / size(col("toks")), 4)
          .as("stop_ratio"),
        round(size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks")), 4).as("uniq_ratio"))
      // sum (not mean) of the two already-4-decimal ratios: a halved mean
      // would land exactly on 5th-decimal rounding boundaries, where Spark
      // (binary-exact HALF_UP) and DuckDB (decimal-string rounding) diverge
      .withColumn("quality", round(lit(1.0) - col("stop_ratio") + col("uniq_ratio"), 4))
  }

  /** Repetition-based quality signals (the Gopher-report family): the
    * most-frequent token's share of the document and the duplicated-2-gram
    * share — the cheap detectors for boilerplate, keyword stuffing, and
    * decode-loop degeneration that corpus filters cut on.
    *
    * Integer numerators/denominators are emitted alongside the 4-decimal
    * ratios so the cross-engine compare is exact. Scale shape: two
    * doc-keyed aggregations (token counts, 2-gram counts) and a doc-keyed
    * join — no corpus-wide state, embarrassingly parallel. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    // Both signals are row-local, so the whole operator is a single map
    // pass with ZERO shuffle: the top-token count is the longest run in the
    // sorted token array (a fold, not a groupBy), and the duplicated-2-gram
    // count is total minus distinct grams. The per-doc arrays are tens of
    // elements, so the interpreted HOF fold and ArrayDistinct's nested loop
    // are nanoseconds per row — unlike the corpus-grain case in
    // Dedup.shingles where the explode+distinct shuffle wins.
    val maxRun =
      """aggregate(sort_array(toks),
        |  named_struct('p', '', 'r', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT)),
        |  (acc, t) -> named_struct(
        |    'p', t,
        |    'r', IF(t = acc.p, acc.r + 1, CAST(1 AS BIGINT)),
        |    'b', greatest(acc.b, IF(t = acc.p, acc.r + 1, CAST(1 AS BIGINT)))),
        |  acc -> acc.b)""".stripMargin
    docs.select(col("doc_id"), toks.as("toks")).filter(size(col("toks")) >= 2)
      .withColumn("g2",
        expr("transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"))
      .select(col("doc_id"),
        expr(maxRun).as("top_cnt"),
        size(col("toks")).cast(LongType).as("n_tok"),
        (size(col("g2")) - size(array_distinct(col("g2")))).cast(LongType).as("dup_2gram"),
        size(col("g2")).cast(LongType).as("n_2gram"))
      .select(col("doc_id"), col("top_cnt"), col("n_tok"),
        round(col("top_cnt").cast(DoubleType) / col("n_tok"), 4).as("top_ratio"),
        col("dup_2gram"), col("n_2gram"),
        round(col("dup_2gram").cast(DoubleType) / col("n_2gram"), 4).as("rep_ratio"))
  }

  /** DuckDB oracle twin of [[repetitionStats]] (HUGEINT sums cast back to
    * BIGINT; same ≥2-token guard; `t[i:i+1]` is Spark's 2-gram window). */
  def repetitionOracleSql: String =
    s"""WITH base AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |              FROM documents WHERE len(string_split_regex(text, '\\s+')) >= 2),
       | tc AS (SELECT doc_id, tok, count(*) AS cnt
       |        FROM (SELECT doc_id, unnest(t) AS tok FROM base) GROUP BY 1, 2),
       | tt AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_cnt,
       |         CAST(sum(cnt) AS BIGINT) AS n_tok FROM tc GROUP BY 1),
       | gc AS (SELECT doc_id, g, count(*) AS cnt
       |        FROM (SELECT doc_id,
       |               unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS g
       |              FROM base) GROUP BY 1, 2),
       | r2 AS (SELECT doc_id, CAST(sum(cnt) - count(*) AS BIGINT) AS dup_2gram,
       |         CAST(sum(cnt) AS BIGINT) AS n_2gram FROM gc GROUP BY 1)
       |SELECT doc_id, top_cnt, n_tok,
       |       round(CAST(top_cnt AS DOUBLE) / n_tok, 4) AS top_ratio,
       |       dup_2gram, n_2gram,
       |       round(CAST(dup_2gram AS DOUBLE) / n_2gram, 4) AS rep_ratio
       |FROM tt JOIN r2 USING (doc_id)""".stripMargin

  /** DuckDB oracle twin of [[qualityScores]], generated from [[Stopwords]]
    * so the word list can never drift; referenced by BOTH the t2 gate and
    * the curation-report oracle (single source, no hand-copied SQL). */
  def qualityOracleSql: String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(",")
    s"""SELECT doc_id, len_text, n_space, stop_ratio, uniq_ratio,
       | round(1.0 - stop_ratio + uniq_ratio, 4) AS quality
       |FROM (
       | SELECT doc_id, length(text) AS len_text,
       |  length(text) - length(replace(text, ' ', '')) AS n_space,
       |  round(CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS uniq_ratio
       | FROM (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks FROM documents) s) r""".stripMargin
  }

  /** Heuristic language ID from language-specific stopword profiles
    * (n-gram-free variant suited to whitespace-tokenized text). Returns the
    * argmax language and its evidence ratio. Deterministic: ties break on
    * the language code (struct max). */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "es" -> Seq("el", "la", "los", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  /** DuckDB oracle for [[langId]], generated from the same [[LangProfiles]]
    * so the word lists can never drift. DuckDB 1.0's `greatest` rejects
    * structs, but struct comparison itself is lexicographic like Spark's, so
    * the argmax is `list_reverse_sort([...structs...])[1]`. */
  /** The SQL twin of [[langScoreStructs]] — the per-language score-struct
    * list both langid oracles build their `best` from (shared for the same
    * can-never-drift reason as the Spark-side helper). */
  private def langScoreStructsSql: String =
    LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(",")
      s"{'hits': len(list_filter(toks, x -> x IN ($list))), 'lang': '$lang'}"
    }.mkString(",\n      |    ".stripMargin)

  def langIdOracleSql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       | s AS (SELECT doc_id, len(toks) AS n_tok, list_reverse_sort([
       |    $langScoreStructsSql])[1] AS best FROM t)
       |SELECT doc_id, best.lang AS pred_lang, round(CAST(best.hits AS DOUBLE) / n_tok, 4) AS conf FROM s""".stripMargin

  /** The per-language stopword-hit score structs over a token-array column
    * — the ONE scoring definition [[langId]], [[langIdEval]], and
    * [[langConsistency]] share. */
  private def langScoreStructsOn(c: String): Seq[Column] =
    LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(",")
      struct(expr(s"size(filter($c, t -> t IN ($list)))").as("hits"), lit(lang).as("lang"))
    }

  private def langScoreStructs: Seq[Column] = langScoreStructsOn("toks")

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tok"),
        greatest(langScoreStructs: _*).as("best"))
      .select(col("doc_id"),
        col("best.lang").as("pred_lang"),
        round(col("best.hits").cast(DoubleType) / col("n_tok"), 4).as("conf"))

  /** Language-ID accuracy evaluation against the corpus's ground-truth
    * `lang` column — the quality check a pipeline runs on its langid
    * filter before trusting it for routing: one row per (true, predicted)
    * confusion cell with the document count and mean confidence. The mean
    * follows the exact-decimal discipline (conf is already 4-decimal;
    * summed as DECIMAL(18,4) so the reduction is order-insensitive, then
    * one presentation rounding). ONE scan, one confusion-cell-keyed
    * aggregation — no join against a second read of the table. */
  def langIdEval(docs: DataFrame): DataFrame =
    docs.select(col("lang").as("true_lang"), toks.as("toks"))
      .select(col("true_lang"), size(col("toks")).as("n_tok"),
        greatest(langScoreStructs: _*).as("best"))
      .select(col("true_lang"), col("best.lang").as("pred_lang"),
        round(col("best.hits").cast(DoubleType) / col("n_tok"), 4).as("conf"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("conf").cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1)), 4)
          .as("mean_conf"))

  /** DuckDB twin of [[langIdEval]] — the t3 scoring replay (same shared
    * struct list) grouped into confusion cells with the same decimal-sum
    * discipline. */
  def langIdEvalOracleSql: String =
    s"""WITH t AS (SELECT lang AS true_lang, string_split_regex(text, '\\s+') AS toks FROM documents),
       | s AS (SELECT true_lang, len(toks) AS n_tok, list_reverse_sort([
       |    $langScoreStructsSql])[1] AS best FROM t),
       | p AS (SELECT true_lang, best.lang AS pred_lang,
       |        round(CAST(best.hits AS DOUBLE) / n_tok, 4) AS conf FROM s)
       |SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       | round(CAST(sum(CAST(conf AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS mean_conf
       |FROM p GROUP BY true_lang, pred_lang""".stripMargin

  /** PII patterns, restricted (like [[BpeTokenRe]]) to constructs whose
    * semantics are identical in Java regex (Spark) and RE2 (DuckDB):
    * character classes, bounded repetition, `\b`/`\d` — no lookaround, no
    * backreferences (RE2 has neither). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction — the standard pre-training privacy pass
    * (emails, phone numbers, IPv4 addresses → typed placeholder tokens),
    * with per-document match counts for the curation report. Pure row-local
    * regex work: a single map pass, zero shuffle, codegen'd `RegExpReplace`
    * / `RegExpExtractAll` — embarrassingly parallel at any corpus size.
    * Masking order (email → phone → ip) is fixed and mirrored in the
    * oracle, so overlapping-class inputs cannot produce engine-dependent
    * output. */
  def piiMask(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast(LongType).as("n_email"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast(LongType).as("n_phone"),
        size(regexp_extract_all(col("t"), lit(Ipv4Re), lit(0))).cast(LongType).as("n_ip"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>").as("redacted"))

  /** Deterministic PII injection for the correctness gate: the synthetic
    * corpus carries no real emails/phones/IPs, so the t11 gate appends
    * reproducible ones derived from `doc_id` (same expression in the DuckDB
    * oracle) — otherwise the redaction path would be tested on a corpus
    * where it never fires. Every doc gains one email, one phone, one IP;
    * every third doc a second email — so counts vary and the redacted text
    * hash-checks every substitution. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      lit(" contact user"), col("doc_id"), lit("@mail.example.com via 10."),
      col("doc_id") % 256, lit(".0."), col("doc_id") % 100,
      lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" alt u"), col("doc_id"), lit("@x2.example.org")))
        .otherwise(lit(""))))

  /** DuckDB oracle twin of [[withSyntheticPii]] ∘ [[piiMask]], built from
    * the same regex constants (single source, no drift). RE2 string
    * literals keep backslashes literal, so the Scala pattern embeds
    * verbatim; `'g'` makes `regexp_replace` global like Spark's. */
  def piiMaskOracleSql: String =
    s"""WITH p AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com via 10.' ||
       |  CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
       |  ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |  CASE WHEN doc_id % 3 = 0
       |       THEN ' alt u' || CAST(doc_id AS VARCHAR) || '@x2.example.org'
       |       ELSE '' END AS t
       | FROM documents)
       |SELECT doc_id,
       | CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
       | CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
       | CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ip,
       | regexp_replace(regexp_replace(regexp_replace(t,
       |   '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'), '$Ipv4Re', '<IP>', 'g') AS redacted
       |FROM p""".stripMargin

  /** Text canonicalization — the normalization every exact-dedup pass runs
    * first (a case or punctuation difference must not defeat an md5
    * match): lowercase, strip everything outside `[a-z0-9 ]`, collapse
    * whitespace runs, trim. ASCII-level canonicalization; Unicode
    * compatibility folding is the separate [[nfkcNormalize]] pass (t13b),
    * which runs BEFORE this one in a full pipeline. Row-local single map
    * pass, zero shuffle. Emits the canonical text, its md5 (the dedup
    * key), and both lengths so the curation report can measure shrink. */
  def normalizeText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " ")).as("norm"),
        length(col("text")).cast(LongType).as("len_raw"))
      .select(col("doc_id"), col("norm"), md5(col("norm")).as("h"),
        col("len_raw"), length(col("norm")).cast(LongType).as("len_norm"))

  /** DuckDB oracle twin of [[normalizeText]] (RE2 'g' ≡ Spark's
    * replace-all; same replacement order). */
  def normalizeTextOracleSql: String =
    s"""SELECT doc_id, norm, md5(norm) AS h, len_raw,
       | CAST(length(norm) AS BIGINT) AS len_norm
       |FROM (SELECT doc_id,
       |       trim(regexp_replace(regexp_replace(lower(text),
       |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
       |       CAST(length(text) AS BIGINT) AS len_raw
       |      FROM documents) s""".stripMargin

  /** Compatibility characters injected for the NFKC gate, with their known
    * NFKC images — ligatures, superscript, circled digit, full-width forms,
    * roman numeral, unit square, no-break space. Every source char is a
    * single BMP codepoint and every image is plain ASCII (or space), which
    * is what lets the DuckDB oracle replay the normalization from the
    * image table without an ICU/NFKC implementation of its own. */
  private[graft] val CompatChars: Seq[(String, String)] = Seq(
    "ﬁ" -> "fi", // LATIN SMALL LIGATURE FI
    "ﬀ" -> "ff", // LATIN SMALL LIGATURE FF
    "²" -> "2", // SUPERSCRIPT TWO
    "③" -> "3", // CIRCLED DIGIT THREE
    "Ｈ" -> "H", // FULLWIDTH LATIN CAPITAL LETTER H
    "ｗ" -> "w", // FULLWIDTH LATIN SMALL LETTER W
    "Ⅸ" -> "IX", // ROMAN NUMERAL NINE
    "㎒" -> "MHz", // SQUARE MHZ
    " " -> " ") // NO-BREAK SPACE

  /** Deterministic Unicode-compat injection (the [[withSyntheticPii]]
    * pattern): appends one rotating compat char plus a fixed tail holding
    * a decomposed accent (`e` + U+0301 — must COMPOSE to é), a composed é
    * (must pass through), and a ligature+superscript pair. The base corpus
    * is printable ASCII (NFKC-invariant), so the oracle replays the
    * normalized text as `text` + the known images. */
  private[ops] def withCompatText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"), lit(" "),
        element_at(array(CompatChars.map(c => lit(c._1)): _*),
          (pmod(col("doc_id"), lit(CompatChars.size)) + 1).cast(IntegerType)),
        lit(" é é ﬁ²")).as("text"))

  /** Unicode NFKC normalization (t13b) — the compatibility-folding pass a
    * dedup pipeline runs before [[normalizeText]]'s ASCII canonicalization:
    * JDK `java.text.Normalizer` behind the codegen'd `nfkc()` expression
    * ([[graft.functions.NfkcExpr]]), no ICU dependency, zero shuffle.
    * Gated through the synthetic compat injection: DuckDB has no NFKC, but
    * it doesn't need one — the injected chars' NFKC images are known
    * constants ([[CompatChars]]), so the oracle rebuilds the expected
    * normalized string and its md5 exactly. */
  def nfkcNormalize(docs: DataFrame): DataFrame =
    withCompatText(docs)
      .select(col("doc_id"),
        graft.functions.NfkcExpr.nfkc(col("text")).as("kc"),
        length(col("text")).cast(LongType).as("len_in"))
      .select(col("doc_id"), col("kc"), md5(col("kc")).as("h"),
        col("len_in"), length(col("kc")).cast(LongType).as("len_kc"))

  /** DuckDB oracle twin of [[nfkcNormalize]]: the normalized text is
    * replayed from the known NFKC images (rotating char by doc_id, fixed
    * tail " é é fi2"), `len_in` as length(text) + 10 because every
    * injected char is one codepoint (1 space + 1 rotating + 8 tail). */
  def nfkcNormalizeOracleSql: String = {
    val imgs = CompatChars.map(c => s"'${c._2}'").mkString("[", ",", "]")
    s"""SELECT doc_id, kc, md5(kc) AS h, len_in, CAST(length(kc) AS BIGINT) AS len_kc
       |FROM (SELECT doc_id,
       |       text || ' ' || ($imgs)[CAST(doc_id % ${CompatChars.size} AS INT) + 1] ||
       |         ' ' || chr(233) || ' ' || chr(233) || ' fi2' AS kc,
       |       CAST(length(text) + 10 AS BIGINT) AS len_in
       |      FROM documents) s""".stripMargin
  }

  /** Unigram language-model scoring — the cheap, self-contained stand-in
    * for the perplexity filter of CCNet-family pipelines: a unigram LM
    * with add-one smoothing is fitted on the corpus itself in ONE
    * token-keyed aggregation, and every document is scored by its mean
    * token log-probability (monotone in perplexity: lp = −ln(ppl)).
    * Documents full of corpus-typical tokens score high; rare-token noise
    * scores low — the signal the real filter thresholds on.
    *
    * Scale shape: the tokenized relation is materialized ONCE
    * ([[Tables.materialize]]) because BOTH the frequency fit and the
    * scoring join consume it — left as lineage, Catalyst re-tokenizes the
    * whole corpus per consumer (the exact double-regex trap t14's chunking
    * hit, and the r6 bench-variance suspect here). Corpus term frequencies
    * are then one map-side-combined aggregation over the checkpoint; the
    * corpus constants (total tokens, vocab size) are a broadcast one-row
    * join; scoring joins tokens to the frequency table (token-keyed
    * shuffle — broadcast the table instead when the vocab fits, as it does
    * for most natural-language corpora) and reduces per document. No
    * driver state, no iteration.
    *
    * Cross-engine: each token's ln rounds to DECIMAL(18,8) before the
    * per-document sum, so the reduction is order-insensitive and exact in
    * both engines (the same discipline as every dsum aggregate; the 1-ulp
    * `ln` risk is absorbed by the 8-decimal rounding, as with t9's idf). */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toksOf = materialize(docs.select(col("doc_id"), explode(toks).as("tok")))
    val tf = toksOf.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val stats = tf.agg(sum(col("cnt")).cast(DoubleType).as("total"),
      count(lit(1)).cast(DoubleType).as("vocab"))
    val tokLp = log((col("cnt").cast(DoubleType) + lit(1.0)) / (col("total") + col("vocab")))
      .cast(DecimalType(18, 8))
    toksOf.join(tf, Seq("tok"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(tokLp).cast(DoubleType) / count(lit(1)), 4).as("lp"))
  }

  /** DuckDB oracle twin of [[unigramLogProb]] — same smoothing, same
    * per-token decimal rounding, same exact sum (HUGEINT-safe casts). */
  def unigramLogProbOracleSql: String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       | tf AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
       | st AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS vocab FROM tf),
       | lp AS (SELECT t.doc_id,
       |         CAST(ln((CAST(tf.cnt AS DOUBLE) + 1.0) / (st.total + st.vocab)) AS DECIMAL(18,8)) AS l
       |        FROM t JOIN tf USING (tok), st)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |       round(CAST(sum(l) AS DOUBLE) / count(*), 4) AS lp
       |FROM lp GROUP BY doc_id""".stripMargin

  /** Per-document BIGRAM LM score (t17) — [[unigramLogProb]] lifted one
    * order: mean ln p(w2|w1) with add-1 smoothing over the corpus-fitted
    * bigram table, p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V). The CCNet/KenLM
    * quality-filter shape: a low-order LM fitted on the corpus itself
    * scores fluency far better than unigram frequency (word salad built
    * from common tokens fools t12 but not the bigram table).
    *
    * Scale shape: bigrams are built ROW-LOCALLY from the token array (a
    * transform over sequence — no window, no position self-join, zero
    * exchange before the fits) and materialized ONCE for the three
    * consumers (bigram fit, context fit, scoring join) — the same
    * re-tokenize-per-consumer trap t12/t14 hit. The two fits are map-side
    * combined; vocab is a broadcast one-row join; scoring shuffles on the
    * bigram key (broadcast the table instead when the vocab fits). Per-ln
    * DECIMAL(18,8) rounding before the per-document sum, so the reduction
    * is order-insensitive cross-engine. Documents under 2 tokens have no
    * bigram to score and drop at the source filter. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val bg = materialize(docs
      .withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // vocab from the SAME materialized relation (w1 ∪ w2 covers every token
    // of every scored document) — a second corpus scan + tokenize pass just
    // to count distinct tokens is the t12/t14 trap in miniature
    val vocab = bg.select(col("w1").as("tok")).union(bg.select(col("w2").as("tok")))
      .agg(count_distinct(col("tok")).cast(DoubleType).as("vocab"))
    val pairLp = log((col("c2").cast(DoubleType) + lit(1.0)) / (col("c1").cast(DoubleType) + col("vocab")))
      .cast(DecimalType(18, 8))
    bg.join(big, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigram"),
        round(sum(pairLp).cast(DoubleType) / count(lit(1)), 4).as("lp"))
  }

  /** DuckDB oracle twin of [[bigramLogProb]] — same row-local bigram
    * construction, same smoothing, same decimal rounding discipline. */
  def bigramLogProbOracleSql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       | bge AS (SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
       |          SELECT doc_id, unnest([{'w1': toks[i], 'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS b
       |          FROM t WHERE len(toks) >= 2)),
       | big AS (SELECT w1, w2, count(*) AS c2 FROM bge GROUP BY w1, w2),
       | ctx AS (SELECT w1, count(*) AS c1 FROM bge GROUP BY w1),
       | v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vocab
       |       FROM (SELECT w1 AS tok FROM bge UNION ALL SELECT w2 FROM bge)),
       | lp AS (SELECT g.doc_id,
       |         CAST(ln((CAST(big.c2 AS DOUBLE) + 1.0) / (CAST(ctx.c1 AS DOUBLE) + v.vocab)) AS DECIMAL(18,8)) AS l
       |        FROM bge g JOIN big USING (w1, w2) JOIN ctx USING (w1), v)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigram,
       |       round(CAST(sum(l) AS DOUBLE) / count(*), 4) AS lp
       |FROM lp GROUP BY doc_id""".stripMargin

  /** Winnowing fingerprint (MOSS-style): rolling polynomial hash over
    * character k-grams, minimum hash per sliding window, document
    * fingerprint = set of window minima; returned here as the overall
    * minimum + count of distinct window minima (compact per-doc summary).
    * Imperative per-document loop → typed Dataset map (no shuffle). */
  def fingerprints(docs: DataFrame, k: Int = 8, window: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    implicit val enc = Encoders.product[(Long, String, Int)]
    val ds = docs.select(col("doc_id"), col("text")).as(Encoders.product[(Long, String)])
    val out = ds.map { case (id, text) =>
      val hashes = rollingHashes(text, k)
      if (hashes.isEmpty) (id, "", 0)
      else {
        val distinct = hashes.sliding(window, 1).map(_.min).toSeq.distinct
        // document fingerprint: order-insensitive fold of the winnowed set
        // (a shared minimum substring alone doesn't collide two documents)
        val folded = distinct.foldLeft(0L)((acc, h) => acc ^ (h * 0x9e3779b97f4a7c15L))
        (id, f"$folded%016x", distinct.length)
      }
    }
    out.toDF("doc_id", "fp", "n_fp")
  }

  /** DuckDB oracle twin of [[fingerprints]] — long thought inexpressible
    * (61-bit modular products overflow BIGINT), but DuckDB's HUGEINT is
    * 128-bit: each k-gram hash is the direct polynomial
    * `Σ c_j·257^(7-j) mod (2^61-1)` (powers < 2^57 inlined as literals, the
    * 8-term sum < 2^69 fits HUGEINT, and the direct sum ≡ the engine's
    * incremental Rabin–Karp by construction); window minima are slice-mins;
    * and the set fold replays the unsigned 64-bit wraparound multiply in
    * HUGEINT mod 2^64 with a `bit_xor` aggregate (XOR is order-insensitive,
    * exactly why the engine uses it). */
  def fingerprintsOracleSql(k: Int = 8, window: Int = 16): String = {
    val M = (1L << 61) - 1
    // 257^(k-1-j) mod M — all < 2^57 for k=8, so plain Long powers
    val pows = (0 until k).map { j =>
      var p = java.math.BigInteger.valueOf(257).modPow(
        java.math.BigInteger.valueOf(k - 1 - j), java.math.BigInteger.valueOf(M))
      p.longValueExact()
    }
    val terms = pows.zipWithIndex.map { case (p, j) =>
      s"CAST(ord(substr(text, i + $j, 1)) AS HUGEINT) * $p"
    }.mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id,
       |    [ ($terms) % $M FOR i IN range(1, length(text) - ${k - 2}) ] AS hashes
       |  FROM documents WHERE length(text) >= $k),
       | m AS (SELECT doc_id,
       |        list_distinct([ list_min(hashes[i:i+${window - 1}])
       |                        FOR i IN range(1, len(hashes) - ${window - 2}) ]) AS minima
       |       FROM h),
       | g AS (SELECT doc_id, unnest(minima) AS mh FROM m),
       | x AS (SELECT doc_id,
       |        bit_xor(CAST((CAST(mh AS HUGEINT) * 11400714819323198485) % 18446744073709551616 AS UBIGINT)) AS folded
       |       FROM g GROUP BY doc_id)
       |SELECT m.doc_id, lower(lpad(hex(x.folded), 16, '0')) AS fp, CAST(len(m.minima) AS INT) AS n_fp
       |FROM m JOIN x ON m.doc_id = x.doc_id
       |UNION ALL
       |SELECT doc_id, '' AS fp, 0 AS n_fp FROM documents WHERE length(text) < $k""".stripMargin
  }

  /** How many top-frequency tokens the Zipf fit regresses over — the
    * head of the rank–frequency curve, where Zipf's law holds and where a
    * corpus-health drift (boilerplate explosion, templated spam) shows up
    * as a slope change. */
  val ZipfTopK: Int = 1000

  /** Corpus Zipf diagnostic (t18): least-squares slope/intercept of
    * ln(freq) against ln(rank) over the [[ZipfTopK]] most frequent tokens,
    * plus the vocabulary size. Natural corpora sit near slope −1; a corpus
    * polluted by templated or machine-generated text bends the head of the
    * curve — this is the drift monitor curation dashboards track per
    * snapshot.
    *
    * Scale shape: term frequencies are ONE map-side-combined aggregation;
    * the head is a distributed top-k (`orderBy.limit` →
    * TakeOrderedAndProject — NOT a global row_number, which would funnel
    * the whole vocabulary through one partition); the rank window then
    * runs over [[ZipfTopK]] rows only, and the regression reduces five
    * scalars. The frequency relation is materialized once because both
    * the vocab count and the top-k consume it.
    *
    * Cross-engine: each point's ln rounds to DECIMAL(18,8) before the
    * sums; products stay in exact decimal arithmetic, so every regression
    * sum is order-insensitive and identical in both engines (the t12/t9
    * discipline); only the final slope/intercept divisions run in DOUBLE,
    * as one deterministic scalar expression each. */
  def zipfFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(18, 8)
    val tf = materialize(
      docs.select(explode(toks).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq")))
    val top = tf.orderBy(col("freq").desc, col("tok")).limit(ZipfTopK)
    val pts = top
      .withColumn("rank", row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
      .select(log(col("rank").cast(DoubleType)).cast(dec).as("lr"),
        log(col("freq").cast(DoubleType)).cast(dec).as("lf"))
    val s = pts.agg(count(lit(1)).cast(DoubleType).as("n"),
      sum(col("lr")).cast(DoubleType).as("sx"),
      sum(col("lf")).cast(DoubleType).as("sy"),
      sum(col("lr") * col("lf")).cast(DoubleType).as("sxy"),
      sum(col("lr") * col("lr")).cast(DoubleType).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    tf.agg(count(lit(1)).as("n_vocab"))
      .crossJoin(broadcast(s))
      .select(col("n_vocab"),
        round(slope, 4).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept"))
  }

  /** DuckDB oracle twin of [[zipfFit]] — same top-[[ZipfTopK]] head, same
    * per-point decimal rounding, same exact decimal sums, same final
    * DOUBLE divisions. */
  def zipfFitOracleSql: String =
    s"""WITH t AS (SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       | tf AS (SELECT tok, count(*) AS freq FROM t GROUP BY tok),
       | top AS (SELECT tok, freq FROM tf ORDER BY freq DESC, tok LIMIT $ZipfTopK),
       | pts AS (SELECT
       |    CAST(ln(CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE)) AS DECIMAL(18,8)) AS lr,
       |    CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,8)) AS lf FROM top),
       | s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(lr) AS DOUBLE) AS sx, CAST(sum(lf) AS DOUBLE) AS sy,
       |    CAST(sum(lr*lf) AS DOUBLE) AS sxy, CAST(sum(lr*lr) AS DOUBLE) AS sxx FROM pts),
       | v AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM tf)
       |SELECT v.n_vocab,
       | round((s.n*s.sxy - s.sx*s.sy)/(s.n*s.sxx - s.sx*s.sx), 4) AS slope,
       | round((s.sy - ((s.n*s.sxy - s.sx*s.sy)/(s.n*s.sxx - s.sx*s.sx))*s.sx)/s.n, 4) AS intercept
       |FROM s, v""".stripMargin

  /** Readability scoring (t20): Flesch reading ease from three regex
    * counts — whitespace words, sentence-terminator runs (`[.!?]+`,
    * clamped ≥ 1 for fragments), and vowel-group syllable approximation
    * (`[aeiouyAEIOUY]+`, the standard heuristic). Grade-level filtering is
    * a stock curation signal (too-low = fragment lists, too-high = OCR
    * noise and run-ons). Row-local single pass, whole-stage codegen; the
    * regex constructs are in the Java≡RE2 common subset (the t6
    * discipline) so both engines count identically, and the score is one
    * fixed-association DOUBLE expression over exact integer counts. */
  def readability(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_words"),
        greatest(lit(1L),
          size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast(LongType)).as("n_sent"),
        size(expr("regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)")).cast(LongType).as("n_syll"))
      .withColumn("flesch",
        round(lit(206.835)
          - lit(1.015) * col("n_words").cast(DoubleType) / col("n_sent")
          - lit(84.6) * col("n_syll").cast(DoubleType) / col("n_words"), 4))

  /** DuckDB oracle twin of [[readability]] — same regexes, same clamp,
    * same left-associated DOUBLE expression (literals cast to DOUBLE so
    * DuckDB's default DECIMAL literals can't change the arithmetic). */
  def readabilityOracleSql: String =
    """SELECT doc_id, n_words, n_sent, n_syll,
      | round(CAST(206.835 AS DOUBLE)
      |   - CAST(1.015 AS DOUBLE) * CAST(n_words AS DOUBLE) / n_sent
      |   - CAST(84.6 AS DOUBLE) * CAST(n_syll AS DOUBLE) / n_words, 4) AS flesch
      |FROM (SELECT doc_id,
      |        CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_words,
      |        CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sent,
      |        CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syll
      |      FROM documents) x""".stripMargin

  /** Character-entropy quality signal (t19): per-document Shannon entropy
    * of the character distribution, `H = ln(n) − (1/n)·Σ_c cnt_c·ln cnt_c`
    * — the cheap gibberish/encoded-blob detector (natural prose sits near
    * 3–4.5 nats; base64 walls, minified code, and single-char spam land
    * far outside the band) that complements t2's token-level ratios with a
    * sub-token signal.
    *
    * Scale shape: two map-side-combined aggregations — (doc, char) grain
    * first (bounded by alphabet size × docs after the combine), then doc
    * grain; no joins, no windows. Cross-engine: each distinct char's ln
    * rounds to DECIMAL(18,8) and multiplies the exact integer count in
    * decimal arithmetic, so the per-doc sum is order-insensitive and
    * identical in both engines; only the final H expression runs in
    * DOUBLE. */
  def charEntropy(docs: DataFrame): DataFrame = {
    val dec = DecimalType(18, 8)
    docs.select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        log(col("cnt").cast(DoubleType)).cast(dec).as("lc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_chars"), count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("lc")).as("s"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct"),
        round(log(col("n_chars").cast(DoubleType)) - col("s").cast(DoubleType) / col("n_chars"),
          4).as("ent"))
  }

  /** DuckDB oracle twin of [[charEntropy]] — same per-char decimal
    * rounding, same exact decimal sum, same final DOUBLE expression. */
  def charEntropyOracleSql: String =
    """WITH ch AS (SELECT doc_id,
      |             unnest([substr(text, CAST(i AS INT), 1) FOR i IN range(1, len(text) + 1)]) AS c
      |            FROM documents),
      | cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
      | tm AS (SELECT doc_id, cnt, CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,8)) AS lc FROM cc),
      | ag AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |         sum(cnt * lc) AS s FROM tm GROUP BY doc_id)
      |SELECT doc_id, n AS n_chars, k AS n_distinct,
      | round(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 4) AS ent
      |FROM ag""".stripMargin

  /** Rabin–Karp rolling hash sequence of all k-grams (base 257, mod 2^61-1). */
  private[ops] def rollingHashes(text: String, k: Int): Array[Long] = {
    val Mod = (1L << 61) - 1
    val Base = 257L
    if (text.length < k) return Array.empty
    def mulmod(a: Long, b: Long): Long = {
      // fold the 128-bit product mod 2^61-1: with p = hi*2^64 + lo,
      // 2^64 ≡ 8 and 2^61 ≡ 1, so p ≡ (lo & Mod) + (lo >>> 61) + 8*hi.
      // a,b < 2^61 keeps hi < 2^58, so no intermediate overflow.
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      ((lo & Mod) + (lo >>> 61) + (hi << 3)) % Mod
    }
    var pow = 1L
    (1 until k).foreach(_ => pow = mulmod(pow, Base))
    val out = new Array[Long](text.length - k + 1)
    var h = 0L
    var i = 0
    while (i < text.length) {
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      if (i >= k - 1) {
        out(i - k + 1) = h
        // remove the leading char for the next step
        val lead = mulmod(text.charAt(i - k + 1).toLong, pow)
        h = (h - lead + Mod) % Mod
      }
      i += 1
    }
    out
  }

  /** Per-document n-gram novelty / duplication-rate (t21) — the
    * memorization-risk profile: for each document, the fraction of its
    * word 8-grams that also occur in at least one OTHER document. High
    * dup_share = boilerplate/templated/copied passages a model would see
    * many times (the span-level view d-series dedup acts on, folded to a
    * per-document training-risk score); near-zero = novel prose. Distinct
    * from d13 (which finds the PAIRS): t21 is the per-document aggregate
    * a curation policy thresholds on.
    *
    * Scale shape: the gram relation materializes once and feeds both the
    * document-frequency fit and the scoring join; both reductions are
    * map-side combined, and the one corpus-grain exchange is gram-keyed
    * (the d2/c3 shuffle shape — gram cardinality scales with the corpus,
    * so the join stays a shuffle join by design, never a broadcast). */
  def ngramNovelty(docs: DataFrame, n: Int = 8): DataFrame = {
    val grams = materialize(Corpus.ngramsOf(docs, n))
    val df = grams.groupBy(col("gram")).agg(count_distinct(col("doc_id")).as("ndocs"))
    grams.join(df, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("ndocs") >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"))
      .withColumn("dup_share",
        round(col("n_shared").cast(DoubleType) / col("n_grams"), 4))
  }

  /** Misra–Gries summary of a token stream: at most `cap` counters; a new
    * key past capacity decrements every counter (dropping zeros) instead
    * of evicting one. Classic guarantee: any item whose frequency in the
    * stream exceeds n/(cap+1) is still present when the stream ends —
    * the sketch can under-count but never lose a heavy item. Exposed at
    * ops scope for the unit property test. */
  private[ops] def misraGries(it: Iterator[String], cap: Int): Iterator[String] = {
    // java.lang.Long values: a scala.Long-valued java map would unbox an
    // absent key's null to 0 and read as a hit, growing without bound
    val m = new java.util.HashMap[String, java.lang.Long](cap * 2)
    while (it.hasNext) {
      val tok = it.next()
      val cur = m.get(tok)
      if (cur ne null) m.put(tok, java.lang.Long.valueOf(cur.longValue + 1L))
      else if (m.size < cap) m.put(tok, java.lang.Long.valueOf(1L))
      else {
        val e = m.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue.longValue == 1L) e.remove()
          else kv.setValue(java.lang.Long.valueOf(kv.getValue.longValue - 1L))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    m.keySet().iterator().asScala
  }

  val HeavyHitterK: Int = 20
  val HeavyHitterCap: Int = 4096

  /** Sketch-pruned frequent-item mining (t22) — exact top-k tokens found
    * the way a 100 TB corpus has to find them: the n-gram/token vocabulary
    * at crawl scale is billions of keys, so even the map-side-combined
    * exact aggregation (t18's shape) shuffles a vocabulary-grain relation.
    * Phase 1 runs a [[misraGries]] summary per partition (`mapPartitions` —
    * a sketch is genuine imperative per-partition state, the documented
    * last-resort case) and unions the surviving keys: the exchange carries
    * at most partitions×cap candidate rows, independent of vocabulary
    * size. Phase 2 semi-joins the token relation to the BROADCAST candidate
    * set and exactly counts only those — the one full-vocabulary shuffle is
    * replaced by a candidate-grain one.
    *
    * Exactness condition (documented, not hoped): the union of
    * per-partition MG survivors contains every token with global freq ≥
    * N/cap (pigeonhole: such a token is locally heavy in at least one
    * partition, and MG never drops a locally-heavy item). Top-k is
    * therefore exact whenever freq(k-th) ≥ N/cap — for k=20, cap=4096 on
    * Zipf-shaped text the margin is ~10×; the ORACLE is the plain exact
    * top-k, so any violation fails the gate rather than passing silently. */
  def heavyHitters(docs: DataFrame, k: Int = HeavyHitterK,
      cap: Int = HeavyHitterCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksDf = materialize(docs.select(explode(toks).as("tok")))
    val cands = toksDf.select(col("tok")).as(Encoders.STRING)
      .mapPartitions(it => misraGries(it, cap))(Encoders.STRING)
      .toDF("tok").distinct()
    toksDf.join(broadcast(cands), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))).cast(LongType))
  }

  /** DuckDB oracle twin of [[heavyHitters]] — the PLAIN exact top-k (the
    * sketch must be invisible in the answer, exactly like q28's salt and
    * q30's buckets). */
  def heavyHittersOracleSql(k: Int = HeavyHitterK): String =
    s"""WITH t AS (SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       | tf AS (SELECT tok, count(*) AS freq FROM t GROUP BY tok),
       | top AS (SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rnk FROM tf)
       |SELECT tok, CAST(freq AS BIGINT) AS freq, CAST(rnk AS BIGINT) AS rnk
       |FROM top WHERE rnk <= $k""".stripMargin

  /** The SQL twin of [[langScoreStructsOn]] over an arbitrary list
    * expression. */
  private def langScoreStructsSqlOn(c: String): String =
    LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(",")
      s"{'hits': len(list_filter($c, x -> x IN ($list))), 'lang': '$lang'}"
    }.mkString(",\n      ")

  /** Mixed-language / code-switching detection (t24) — the document-level
    * consistency check a multilingual pipeline runs before trusting one
    * language label per document (a doc that switches language mid-way
    * poisons both its langid routing and its per-language mixture
    * accounting): the token stream splits at its midpoint and each half is
    * language-identified independently (the SAME t3 scoring — one profile
    * set serves t3, t15, and t24); a disagreement flags the document.
    * Detection is PROVEN, not hoped: every 20th document WITH ≥ 5 tokens
    * gets a German stopword block appended, SCALED to the document
    * (r = ⌊n/14⌋+1 repeats of the 6-word unit — a pure function of
    * (doc_id, text) replayed by the oracle); this corpus's natural text
    * never scores German, so those docs must flag. The ≥ 5 guard (ADVICE
    * r8) makes the tail-confinement PROVABLE instead of fixture-dependent:
    * the head half is tokens 1..⌊(n+6r)/2⌋ and the block starts at n+1, so
    * the head stays natural iff 6r ≤ n+1 — which holds for every n ≥ 5
    * (r=1 needs n ≥ 5; each +1 to r adds 14 to n but only 6 to the bound).
    * Unguarded, a 4-token document would leak German into its head half
    * and report consistent=true despite the injection. Fixture docs have
    * ≥ 10 tokens, so outputs are unchanged. Row-local slice + filter
    * counts, whole-stage codegen, zero shuffle. */
  def langConsistency(docs: DataFrame): DataFrame = {
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(20)) === 0 &&
          expr("size(split(text, '\\\\s+'))") >= 5,
        concat(col("text"), expr(
          s"repeat('$DeUnit', CAST(size(split(text, '\\\\s+')) DIV 14 + 1 AS INT))")))
        .otherwise(col("text")).as("t"))
    aug.select(col("doc_id"), split(col("t"), "\\s+").as("all"))
      .select(col("doc_id"), size(col("all")).cast(LongType).as("n_tok"),
        expr("slice(all, 1, size(all) div 2)").as("h1"),
        expr("slice(all, size(all) div 2 + 1, size(all) - size(all) div 2)").as("h2"))
      .select(col("doc_id"), col("n_tok"),
        greatest(langScoreStructsOn("h1"): _*).getField("lang").as("lang_head"),
        greatest(langScoreStructsOn("h2"): _*).getField("lang").as("lang_tail"))
      .withColumn("consistent", col("lang_head") === col("lang_tail"))
  }

  /** The six German profile stopwords — one unit of the t24 injection. */
  val DeUnit: String = " der die das und nicht ist"

  /** DuckDB oracle twin of [[langConsistency]] — same injection, same
    * midpoint split, same shared scoring structs and tie order. */
  def langConsistencyOracleSql: String =
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 20 = 0
       |                  AND len(string_split_regex(text, '\\s+')) >= 5
       |                 THEN text || repeat('$DeUnit',
       |                        CAST(len(string_split_regex(text, '\\s+')) // 14 + 1 AS INT))
       |                 ELSE text END AS t
       |           FROM documents),
       | s AS (SELECT doc_id, string_split_regex(t, '\\s+') AS al FROM a),
       | h AS (SELECT doc_id, len(al) AS n_tok,
       |        al[1:len(al)//2] AS h1, al[len(al)//2+1:len(al)] AS h2 FROM s),
       | p AS (SELECT doc_id, n_tok,
       |        list_reverse_sort([
       |      ${langScoreStructsSqlOn("h1")}])[1].lang AS lang_head,
       |        list_reverse_sort([
       |      ${langScoreStructsSqlOn("h2")}])[1].lang AS lang_tail
       |       FROM h)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, lang_head, lang_tail,
       | (lang_head = lang_tail) AS consistent
       |FROM p""".stripMargin

  /** The t26 mojibake block: the classic CP1252-decoded-as-UTF-8 artifacts
    * (Ã©=é, Ã¨=è, â€™=', â€œ=") plus a replacement character — what a
    * double-encoding bug actually produces. */
  val MojibakeUnit: String = " Ã©tÃ© donâ€™t â€œquoteâ€�"

  /** Encoding-corruption detection (t26) — the mojibake screen every
    * web-crawl pipeline needs (CP1252 bytes decoded as UTF-8, double
    * encodings, replacement characters): count U+FFFD occurrences and the
    * signature `Ã`/`â` lead bytes of misdecoded Latin-1 pairs, flag when
    * present. The corpus is clean ASCII, so detection is PROVEN by the
    * injection device — every 30th document gets a mojibake block
    * appended (pure function of doc_id, replayed by the oracle). Row-local
    * codepoint counts in the Java≡RE2 common subset, zero shuffle. */
  def mojibakeScreen(docs: DataFrame): DataFrame = {
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(30)) === 0, concat(col("text"), lit(MojibakeUnit)))
        .otherwise(col("text")).as("t"))
    aug.select(col("doc_id"),
      length(col("t")).cast(LongType).as("n_chars"),
      size(expr("regexp_extract_all(t, '�', 0)")).cast(LongType).as("n_repl"),
      size(expr("regexp_extract_all(t, '[Ã¢Ââ€]', 0)")).cast(LongType).as("n_moji"))
      .withColumn("corrupted", col("n_repl") > 0 || col("n_moji") >= 3)
  }

  /** DuckDB oracle twin of [[mojibakeScreen]] — same injection, character
    * classes, and thresholds. */
  def mojibakeOracleSql: String =
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 30 = 0 THEN text || '$MojibakeUnit' ELSE text END AS t
       |           FROM documents)
       |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
       | CAST(len(regexp_extract_all(t, '�')) AS BIGINT) AS n_repl,
       | CAST(len(regexp_extract_all(t, '[Ã¢Ââ€]')) AS BIGINT) AS n_moji,
       | (len(regexp_extract_all(t, '�')) > 0
       |  OR len(regexp_extract_all(t, '[Ã¢Ââ€]')) >= 3) AS corrupted
       |FROM a""".stripMargin

  /** The t25 blocklist — stands in for the wordlist a production filter
    * loads (LDNOOBW-style); lowercase exact-token matching. */
  val Blocklist: Seq[String] = Seq("badword1", "badword2", "slur1", "slur2", "nsfw1")

  /** Blocklist screening (t25) — the wordlist filter every public-corpus
    * pipeline runs (the C4 cleanup used exactly this shape): count
    * exact-token blocklist hits per document and flag when the count or
    * density crosses threshold. The corpus contains no blocklist tokens
    * naturally, so detection is PROVEN by injection: every 25th document
    * gets blocklist tokens appended, scaled as ⌊n/20⌋+2 so both the count
    * and density signals fire at any document length (a pure function of
    * (doc_id, text), replayed by the oracle). Row-local filter counts over
    * the token array, whole-stage codegen, zero shuffle. */
  def blocklistScreen(docs: DataFrame): DataFrame = {
    val unit = " " + Blocklist.mkString(" ")
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(25)) === 0,
        concat(col("text"), expr(
          s"repeat('$unit', CAST(size(split(text, '\\\\s+')) DIV 20 + 2 AS INT))")))
        .otherwise(col("text")).as("t"))
    val list = Blocklist.map(w => s"'$w'").mkString(",")
    aug.select(col("doc_id"), split(col("t"), "\\s+").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tok"),
        expr(s"size(filter(toks, x -> lower(x) IN ($list)))").cast(LongType).as("n_flagged"))
      .withColumn("flag_ratio", round(col("n_flagged").cast(DoubleType) / col("n_tok"), 4))
      .withColumn("blocked", col("n_flagged") >= 3 || col("flag_ratio") >= 0.02)
  }

  /** DuckDB oracle twin of [[blocklistScreen]] — same injection, list,
    * counts, and thresholds. */
  def blocklistOracleSql: String = {
    val unit = " " + Blocklist.mkString(" ")
    val list = Blocklist.map(w => s"'$w'").mkString(",")
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 25 = 0
       |                 THEN text || repeat('$unit',
       |                        CAST(len(string_split_regex(text, '\\s+')) // 20 + 2 AS INT))
       |                 ELSE text END AS t
       |           FROM documents),
       | s AS (SELECT doc_id, string_split_regex(t, '\\s+') AS toks FROM a),
       | c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
       |        CAST(len(list_filter(toks, x -> lower(x) IN ($list))) AS BIGINT) AS n_flagged
       |       FROM s)
       |SELECT doc_id, n_tok, n_flagged,
       | round(CAST(n_flagged AS DOUBLE) / n_tok, 4) AS flag_ratio,
       | (n_flagged >= 3 OR round(CAST(n_flagged AS DOUBLE) / n_tok, 4) >= 0.02) AS blocked
       |FROM c""".stripMargin
  }

  /** Code-vs-prose detection (t23) — the corpus-composition screen every
    * mixed crawl runs (code wants different dedup, tokenization, and
    * mixture weights than prose; The-Stack-style pipelines route on it):
    * count code-symbol characters (`{}();=[]`) and flag documents whose
    * symbol mass and density cross thresholds. The fixture proves
    * detection rather than assuming it: every 10th document gets a
    * deterministic code block APPENDED (the d13 injection device — a pure
    * function of doc_id, replayed identically by the oracle), so the
    * detector must flag exactly those and nothing else (natural docs here
    * carry zero code symbols). Row-local regex counts in the Java≡RE2
    * common subset (the t6 discipline), whole-stage codegen, zero
    * shuffle. */
  def codeDetect(docs: DataFrame): DataFrame = {
    // injection scaled with document LENGTH (ADVICE r8): each 43-char unit
    // carries 11 class symbols, so r = 3 + id%3 + n_chars/1000 repeats give
    // sym_ratio = 11r/(n+43r) ≥ 11(n/1000)/(n+43r) > 0.01 at ANY document
    // length (a fixed 3–5 repeats stopped clearing the 1% density past
    // ~3.2 kchars) while n_sym ≥ 33 clears the absolute floor — the
    // flags-exactly-the-injected invariant is now length-independent, like
    // t24/t25. Fixture docs are < 1 kchars, so outputs are unchanged.
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("text"), expr(
          s"repeat('$CodeSnippetUnit', CAST(3 + doc_id % 3 + length(text) DIV 1000 AS INT))")))
        .otherwise(col("text")).as("t"))
    aug.select(col("doc_id"),
      length(col("t")).cast(LongType).as("n_chars"),
      size(expr(s"regexp_extract_all(t, '$CodeSymRe', 0)")).cast(LongType).as("n_sym"))
      .withColumn("sym_ratio", round(col("n_sym").cast(DoubleType) / col("n_chars"), 4))
      .withColumn("is_code", col("n_sym") >= 10 && col("sym_ratio") >= 0.01)
  }

  /** One code-block unit for the t23 injection (appended 3–5×): carries a
    * fixed, counted set of code-symbol characters. Single-quote-free so it
    * embeds verbatim in both engines' string literals. */
  val CodeSnippetUnit: String = " int f(int x) { y[0] = x*2; return y[0]; }"

  /** Code-symbol character class, Java≡RE2-identical. */
  val CodeSymRe: String = "[{}();=\\\\[\\\\]]"

  /** DuckDB oracle twin of [[codeDetect]] — same injection, same counts,
    * same thresholds. */
  def codeDetectOracleSql: String =
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 10 = 0
       |                 THEN text || repeat('$CodeSnippetUnit',
       |                        CAST(3 + doc_id % 3 + length(text) // 1000 AS INT))
       |                 ELSE text END AS t
       |           FROM documents)
       |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
       | CAST(len(regexp_extract_all(t, '[{}();=\\[\\]]')) AS BIGINT) AS n_sym,
       | round(CAST(len(regexp_extract_all(t, '[{}();=\\[\\]]')) AS DOUBLE) / length(t), 4) AS sym_ratio,
       | (len(regexp_extract_all(t, '[{}();=\\[\\]]')) >= 10
       |  AND round(CAST(len(regexp_extract_all(t, '[{}();=\\[\\]]')) AS DOUBLE) / length(t), 4) >= 0.01) AS is_code
       |FROM a""".stripMargin

  /** DuckDB oracle twin of [[ngramNovelty]] — same 1-based list-slice
    * grams (the c3 convention), same distinct-doc frequency, same share. */
  def ngramNoveltyOracleSql(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       | grams AS (SELECT doc_id,
       |            unnest([array_to_string(t[i:i+${n - 1}], ' ') FOR i IN range(1, len(t) - ${n - 2})]) AS gram
       |           FROM toks WHERE len(t) >= $n),
       | df AS (SELECT gram, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY gram)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       | CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       | round(CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_share
       |FROM grams g JOIN df USING (gram) GROUP BY g.doc_id""".stripMargin

  // ---------------- Source-scoped boilerplate detection (t27) ----------

  /** The injected per-source footer — 7 tokens, a pure function of
    * `source` (identical across a source's injected docs, distinct across
    * sources), so its 4 interior 4-grams become source-boilerplate while
    * the grams straddling the splice stay document-unique. */
  private[ops] def footerSql: String =
    "concat(' visit ', source, ' homepage click subscribe now today')"

  /** Source-scoped boilerplate screen (t27) — the crawl-cleanup t21
    * cannot do: navigation chrome, footers, and cookie banners repeat
    * across the pages of ONE site, so the detection grain is (source,
    * gram) with a threshold RELATIVE to that source's page count — a
    * gram is boilerplate in a source when it appears in
    * `max(minDocs, ceil(pct · source_docs))` distinct documents of that
    * source (the absolute floor stops tiny sources from flagging chance
    * repeats; the relative bar keeps the rule meaningful at ANY source
    * size — t21's global df≥2 would drown in cross-site near-dups).
    * Detection is PROVEN by the corpus injection device: every 7th
    * document gets [[footerSql]] appended (pure function of (doc_id,
    * source), oracle-replayed), planting identical interior 4-grams in
    * ~14% of each source's docs — above any sane pct — while natural
    * grams sit far below the relative bar.
    *
    * Scale shape: gram df is computed at (source, md5(gram)) grain —
    * 16-byte keys in the exchange regardless of gram length — via the
    * two-stage exact-distinct (dedup (src,h,doc) then count), both
    * map-side combined; per-source doc counts are a broadcast dimension;
    * the surviving boilerplate-gram relation is TINY (chrome, not
    * content) and broadcasts back onto the gram stream, so the corpus is
    * scanned once, shuffled once at 16-byte grain, and never joined
    * wide-to-wide. */
  def boilerplate(docs: DataFrame, k: Int = 4, minDocs: Int = 3,
      pct: Double = 0.05): DataFrame = {
    val aug = docs.select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), expr(footerSql))).otherwise(col("text")).as("t"))
    // materialized (r13 opt): the gram stream feeds TWO consumers — the
    // per-source df census and the final probe — and under AQE the
    // unshared lineage re-ran the injection + tokenize + md5 pipeline
    // per consumer (the d2/r4 lesson). One pass, two readers of
    // (doc_id, source, h) triples.
    val grams = Tables.materialize(aug
      .select(col("doc_id"), col("source"), split(col("t"), "\\s+").as("toks"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"""IF(size(toks) >= $k,
           |   transform(sequence(1, size(toks) - ${k - 1}),
           |             p -> array_join(slice(toks, p, $k), ' ')),
           |   array())""".stripMargin)).as("gram"))
      .select(col("doc_id"), col("source"), md5(col("gram")).as("h")))
    val srcDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("src_docs"))
    val dfg = grams.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("df"))
    val boiler = dfg.join(broadcast(srcDocs), Seq("source"))
      .filter(col("df") >= greatest(lit(minDocs.toLong),
        ceil(col("src_docs") * pct).cast(LongType)))
      .select(col("source"), col("h"), lit(true).as("b"))
    grams.join(broadcast(boiler), Seq("source", "h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        outd(col("n_boiler") / col("n_grams"), 4).as("boiler_ratio"),
        (col("n_boiler") >= 3).as("is_boiler"))
  }

  /** DuckDB oracle twin of [[boilerplate]] — same injection, 1-based
    * sliding grams, md5-keyed per-source distinct-doc frequency, same
    * max(floor, ceil(pct·docs)) bar and finals. */
  def boilerplateOracleSql(k: Int = 4, minDocs: Int = 3, pct: Double = 0.05): String =
    s"""WITH a AS (SELECT doc_id, source,
       |            CASE WHEN doc_id % 7 = 0
       |                 THEN text || ' visit ' || source || ' homepage click subscribe now today'
       |                 ELSE text END AS t
       |           FROM documents),
       | toks AS (SELECT doc_id, source, string_split_regex(t, '\\s+') AS tk FROM a),
       | g AS (SELECT doc_id, source,
       |        md5(unnest([array_to_string(tk[p:p+${k - 1}], ' ')
       |                    FOR p IN range(1, len(tk) - ${k - 2})])) AS h
       |       FROM toks WHERE len(tk) >= $k),
       | sd AS (SELECT source, CAST(count(*) AS BIGINT) AS src_docs FROM documents GROUP BY source),
       | dfg AS (SELECT source, h, count(*) AS df FROM (
       |          SELECT DISTINCT source, h, doc_id FROM g) dd GROUP BY source, h),
       | b AS (SELECT dfg.source, dfg.h FROM dfg JOIN sd USING (source)
       |       WHERE dfg.df >= greatest($minDocs, CAST(ceil(sd.src_docs * $pct) AS BIGINT)))
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       | CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       | round(CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS boiler_ratio,
       | (sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) >= 3) AS is_boiler
       |FROM g LEFT JOIN b ON g.source = b.source AND g.h = b.h
       |GROUP BY g.doc_id""".stripMargin

  // ---------------- Homoglyph / mixed-script spoofing (t28) ----------

  /** Homoglyph spoof screen (t28) — the adversarial-text sibling of t26's
    * accidental mojibake: spam and jailbreak corpora evade ASCII
    * blocklists by swapping Latin letters for Cyrillic LOOKALIKES (а е о,
    * U+0430/0435/043E — pixel-identical in most fonts), and the tell is
    * MIXED-SCRIPT TOKENS: a word carrying both Latin and Cyrillic letters
    * is virtually never legitimate text in either language. Per document:
    * Latin and Cyrillic letter counts and the count of mixed-script
    * tokens; spoofed = any mixed token. Detection is PROVEN by the
    * injection device: every 9th document has its `a/e/o` swapped for the
    * Cyrillic lookalikes (a pure function of (doc_id, text) the oracle
    * replays); this clean-ASCII corpus never flags otherwise, and the
    * swap leaves consonants Latin, so injected tokens are mixed-script by
    * construction. Row-local regex counts in the Java≡RE2 common-subset
    * discipline (character classes only), whole-stage codegen, zero
    * shuffle. */
  def homoglyphScreen(docs: DataFrame): DataFrame = {
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(9)) === 0,
        translate(col("text"), "aeo", "аео"))
        .otherwise(col("text")).as("t"))
    val latin = "[A-Za-z]"
    val cyr = "[Ѐ-ӿ]"
    aug.select(col("doc_id"),
      expr(s"CAST(length(regexp_replace(t, '[^A-Za-z]', '')) AS BIGINT)").as("n_latin"),
      expr(s"CAST(length(regexp_replace(t, '[^Ѐ-ӿ]', '')) AS BIGINT)").as("n_cyr"),
      expr(s"""CAST(size(filter(split(t, '\\\\s+'),
              |  w -> w RLIKE '$latin' AND w RLIKE '$cyr')) AS BIGINT)""".stripMargin)
        .as("n_mixed_tokens"))
      .withColumn("spoofed", col("n_mixed_tokens") >= 1)
  }

  /** DuckDB oracle twin of [[homoglyphScreen]] — same injection, same
    * character classes (RE2 `\x{...}` spelling of the identical ranges),
    * same mixed-token rule. */
  def homoglyphOracleSql: String =
    """WITH a AS (SELECT doc_id,
      |            CASE WHEN doc_id % 9 = 0
      |                 THEN translate(text, 'aeo', 'аео')
      |                 ELSE text END AS t
      |           FROM documents)
      |SELECT doc_id,
      | CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
      | CAST(length(regexp_replace(t, '[^\x{0400}-\x{04ff}]', '', 'g')) AS BIGINT) AS n_cyr,
      | CAST(len(list_filter(string_split_regex(t, '\s+'),
      |       w -> regexp_matches(w, '[A-Za-z]') AND regexp_matches(w, '[\x{0400}-\x{04ff}]')))
      |   AS BIGINT) AS n_mixed_tokens,
      | (len(list_filter(string_split_regex(t, '\s+'),
      |       w -> regexp_matches(w, '[A-Za-z]') AND regexp_matches(w, '[\x{0400}-\x{04ff}]'))) >= 1)
      |   AS spoofed
      |FROM a""".stripMargin

  /** Interpolated Kneser–Ney bigram LM scoring (t32) — the smoothing the
    * CCNet/KenLM quality filters actually deploy, upgraded from t17's
    * add-one: absolute discount d = 0.75 on the bigram count, with the
    * discounted mass redistributed through the CONTINUATION unigram
    * `P_cont(w2) = N1+(·w2) / |bigram types|` — the "how many contexts
    * does this word complete" estimate that fixes add-one's
    * high-frequency bias ("Francisco" is frequent but only follows "San";
    * KN scores it low in fresh contexts where add-one overrates it).
    * `p(w2|w1) = max(c12 − d, 0)/c1 + (d·N1+(w1·)/c1)·P_cont(w2)`, per-doc
    * score = mean ln p over its bigrams.
    *
    * Cross-engine: d = 0.75 is decimally exact; every factor is an exact
    * integer count; p is ONE identically-associated double expression on
    * both engines, each ln rounds to DECIMAL(18,8) before the per-doc sum
    * (the t17 discipline), so the reduction is order-insensitive.
    *
    * Scale shape: identical to t17 — bigrams built row-locally and
    * materialized ONCE for all fit grains; the three fits are map-side
    * combined (bigram, context, continuation); |types| is a one-row
    * broadcast attach (the t12 class); scoring shuffles on the bigram
    * key. */
  def knBigramScore(docs: DataFrame, d: Double = 0.75): DataFrame = {
    val dec = DecimalType(18, 8)
    val bg = materialize(docs
      .withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // type-grain fits come from the DISTINCT-bigram relation `big` itself:
    // per context, followers = row count and c1 = mass; per word, the
    // continuation count is the rows it terminates
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_w1"))
    val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("n1p_w2"))
    val types = big.agg(count(lit(1)).cast(DoubleType).as("n_types"))
    val p = (greatest(col("c12").cast(DoubleType) - lit(d), lit(0.0)) / col("c1")) +
      (lit(d) * col("n1p_w1") / col("c1")) * (col("n1p_w2").cast(DoubleType) / col("n_types"))
    bg.join(big, Seq("w1", "w2")).join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("doc_id"), log(p).cast(dec).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigram"),
        round(sum(col("lp")).cast(DoubleType) / count(lit(1)), 4).as("kn_lp"))
  }

  /** DuckDB oracle twin of [[knBigramScore]] — same fits, the same
    * single-association double expression, same decimal-ln discipline. */
  def knBigramScoreOracleSql(d: Double = 0.75): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       | bge AS (SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
       |          SELECT doc_id, unnest([{'w1': toks[i], 'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS b
       |          FROM t WHERE len(toks) >= 2)),
       | big AS (SELECT w1, w2, count(*) AS c12 FROM bge GROUP BY w1, w2),
       | ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p_w1 FROM big GROUP BY w1),
       | cont AS (SELECT w2, count(*) AS n1p_w2 FROM big GROUP BY w2),
       | ty AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big),
       | lp AS (SELECT g.doc_id,
       |         CAST(ln((greatest(CAST(big.c12 AS DOUBLE) - CAST($d AS DOUBLE), 0.0) / ctx.c1) +
       |                 (CAST($d AS DOUBLE) * ctx.n1p_w1 / ctx.c1) *
       |                 (CAST(cont.n1p_w2 AS DOUBLE) / ty.n_types))
       |           AS DECIMAL(18,8)) AS l
       |        FROM bge g JOIN big USING (w1, w2) JOIN ctx USING (w1) JOIN cont USING (w2), ty)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigram,
       |       round(CAST(sum(l) AS DOUBLE) / count(*), 4) AS kn_lp
       |FROM lp GROUP BY doc_id""".stripMargin

  /** Per-document keyword extraction (t31) — the tf·idf tagger a corpus
    * exploration / clustering-label pipeline runs: each document's top-3
    * tokens by `tf · ln(N/df)` (raw document-frequency idf — the classic
    * salience score; stopwords die because df ≈ N drives idf → 0). The
    * score is ROW-LOCAL (nothing aggregates over it), so it follows t20's
    * plain-double discipline — one identically-associated `tf · ln`
    * product per row, rounded once — not t12's decimal-sum discipline,
    * which exists for order-insensitive REDUCTIONS; the cut is a fully
    * ordered (score desc, token) rank ≤ 3.
    *
    * Scale shape: one tokenize pass materialized for its two grains (the
    * (doc, token) tf fold and the token-grain df fold — the t12/t14
    * re-tokenize trap); the df relation is vocabulary-sized and joins the
    * tf relation on the token key; the top-3 is a PER-DOCUMENT window
    * whose rank≤3 pushes into the exchange as a group-limit — no global
    * sort, no driver state. */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = materialize(docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val n = docs.count()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"), col("df"),
        log(lit(n.toDouble) / col("df")).as("idf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, Seq("tok"))
      .withColumn("score", round(col("tf").cast(DoubleType) * col("idf"), 4))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"), col("score"))
  }

  /** DuckDB oracle twin of [[keywords]] — same folds, same plain-double
    * product, same ordered cut. */
  def keywordsOracleSql(k: Int = 3): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       | tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
       | n AS (SELECT count(*) AS n FROM documents),
       | df AS (SELECT tok, count(*) AS df,
       |         ln(CAST((SELECT n FROM n) AS DOUBLE) / count(*)) AS idf
       |        FROM tf GROUP BY tok),
       | s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
       |        round(CAST(tf.tf AS DOUBLE) * df.idf, 4) AS score
       |       FROM tf JOIN df USING (tok)),
       | r AS (SELECT doc_id, tok, tf, df, score,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk FROM s)
       |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok,
       | CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
       |FROM r WHERE rnk <= $k""".stripMargin

  /** Heaps'-law vocabulary growth (t30) — the companion diagnostic to
    * t18's Zipf fit: vocabulary size as a function of corpus size,
    * V(n) ≈ K·n^β, measured at ten deterministic ingestion checkpoints
    * and fitted in log-log space with t18's exact-decimal regression
    * discipline. The curve answers the tokenizer-planning questions (how
    * fast is the open vocabulary still growing? has the crawl saturated
    * its domain?) and a β drifting toward 1 flags boilerplate/ID-like
    * token floods.
    *
    * Scale shape: checkpoints are doc_id VALUE cuts (min + k·span/10 from
    * a one-row agg — driver scalars, the c20 device), NOT rank cuts, so no
    * global sort exists anywhere; the corpus tokenizes ONCE (materialized
    * at array grain) feeding two map-side-combined folds — per-doc token
    * counts and per-token FIRST-occurrence (min doc_id) — and each fold
    * joins the broadcast 10-row checkpoint dimension with a ≤ predicate
    * (a 10-row BNLJ attach, the q31 dimension-grid class). Vocabulary at
    * a cut = tokens whose first occurrence precedes it — an O(vocab)
    * relation, never a re-scan per checkpoint.
    *
    * Growth is PROVEN, not hoped: the synthetic corpus draws from a
    * 31-token pool, saturating vocabulary at the first checkpoint (a
    * degenerate β = 0 fit), so every document appends one token
    * `w⌊√doc_id⌋` — a pure function of doc_id replayed by the oracle.
    * Fresh tokens then arrive exactly at perfect-square ids, the textbook
    * V(n) ~ √n sub-linear growth the fit is built to measure. */
  def heapsGrowth(docs: DataFrame): DataFrame = {
    val dec = DecimalType(18, 8)
    val spark = docs.sparkSession
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val cuts = broadcast(spark.range(1, 11).select(col("id").as("k"),
      expr(s"CAST($mn + ($mx - $mn) * id div 10 AS BIGINT)").as("cut")))
    val aug = docs.withColumn("text", concat(col("text"), lit(" w"),
      expr("CAST(floor(sqrt(CAST(doc_id AS DOUBLE))) AS BIGINT)").cast("string")))
    val t = materialize(aug.select(col("doc_id"), toks.as("tk")))
    val ds = t.select(col("doc_id"), size(col("tk")).cast(LongType).as("nt"))
    val first = t.select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("fid"))
    val per = ds.join(cuts, col("doc_id") <= col("cut"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val voc = first.join(cuts, col("fid") <= col("cut"))
      .groupBy(col("k")).agg(count(lit(1)).as("vocab"))
    val curve = per.join(voc, Seq("k"))
    val pts = curve.select(
      log(col("n_tokens").cast(DoubleType)).cast(dec).as("lx"),
      log(col("vocab").cast(DoubleType)).cast(dec).as("ly"))
    val s = pts.agg(count(lit(1)).cast(DoubleType).as("n"),
      sum(col("lx")).cast(DoubleType).as("sx"),
      sum(col("ly")).cast(DoubleType).as("sy"),
      sum(col("lx") * col("ly")).cast(DoubleType).as("sxy"),
      sum(col("lx") * col("lx")).cast(DoubleType).as("sxx"))
    val beta = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    curve.crossJoin(broadcast(s))
      .select(col("k"), col("n_docs"), col("n_tokens"), col("vocab"),
        round(beta, 4).as("beta"),
        round((col("sy") - beta * col("sx")) / col("n"), 4).as("c0"))
  }

  /** DuckDB oracle twin of [[heapsGrowth]] — same value cuts, folds, and
    * t18 regression arithmetic. */
  def heapsGrowthOracleSql: String =
    s"""WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
       | cuts AS (SELECT k, mn + (mx - mn) * k // 10 AS cut
       |          FROM (SELECT unnest(range(1, 11)) AS k), mm),
       | a AS (SELECT doc_id, text || ' w' ||
       |         CAST(CAST(floor(sqrt(CAST(doc_id AS DOUBLE))) AS BIGINT) AS VARCHAR) AS text
       |       FROM documents),
       | t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM a),
       | ds AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS nt FROM t),
       | fo AS (SELECT tok, min(doc_id) AS fid FROM (
       |         SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY tok),
       | per AS (SELECT c.k, CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(sum(ds.nt) AS BIGINT) AS n_tokens
       |         FROM ds JOIN cuts c ON ds.doc_id <= c.cut GROUP BY c.k),
       | voc AS (SELECT c.k, CAST(count(*) AS BIGINT) AS vocab
       |         FROM fo JOIN cuts c ON fo.fid <= c.cut GROUP BY c.k),
       | curve AS (SELECT per.k, n_docs, n_tokens, vocab FROM per JOIN voc USING (k)),
       | pts AS (SELECT CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,8)) AS lx,
       |          CAST(ln(CAST(vocab AS DOUBLE)) AS DECIMAL(18,8)) AS ly FROM curve),
       | s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(lx) AS DOUBLE) AS sx, CAST(sum(ly) AS DOUBLE) AS sy,
       |    -- ln(n_tokens) exceeds 10, so the scale-16 product needs more
       |    -- than DECIMAL(18)'s int64 window (t18's ln(rank) never does);
       |    -- widening one factor keeps the product exact in both engines
       |    CAST(sum(CAST(lx AS DECIMAL(28,8)) * ly) AS DOUBLE) AS sxy,
       |    CAST(sum(CAST(lx AS DECIMAL(28,8)) * lx) AS DOUBLE) AS sxx FROM pts)
       |SELECT curve.k, n_docs, n_tokens, vocab,
       | round((s.n*s.sxy - s.sx*s.sy)/(s.n*s.sxx - s.sx*s.sx), 4) AS beta,
       | round((s.sy - ((s.n*s.sxy - s.sx*s.sy)/(s.n*s.sxx - s.sx*s.sx))*s.sx)/s.n, 4) AS c0
       |FROM curve, s""".stripMargin

  /** Corpus-level bigram collocation mining (t29) — the vocabulary-analysis
    * pass run before tokenizer training and domain profiling: which word
    * pairs co-occur far more than chance (multi-word entities, templated
    * phrases, boilerplate seeds). Scored by the Dice coefficient
    * `2·c(w1,w2) / (c(w1) + c(w2))` — bounded [0,1], the standard
    * lexicographic collocation measure, and (unlike log-PMI) a single
    * rational of exact integer counts, so the score is bit-identical
    * cross-engine by construction. Pairs below `minCount` are pruned
    * BEFORE any join (the Zipf tail is almost all hapax bigrams), and the
    * report is the global top-`k` by (dice desc, w1, w2) — fully ordered,
    * so the cut is deterministic.
    *
    * Scale shape: one tokenize pass materialized for its two grains
    * (bigram fold + unigram fold — the t12/t14 re-tokenize trap), both
    * folds map-side combined; the min-count filter shrinks the pair
    * relation by orders of magnitude before the two token-keyed count
    * joins; the top-k is TakeOrderedAndProject (per-partition heaps + one
    * k-row driver merge — no global sort at any corpus size). */
  def collocations(docs: DataFrame, minCount: Int = 3, k: Int = 50): DataFrame = {
    val tk = materialize(docs.withColumn("tk", toks)
      .filter(size(col("tk")) >= 2).select(col("tk")))
    val bg = tk.select(explode(expr(
      "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = tk.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c1").as("n_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("n_w2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(lit(2.0) * col("n_pair") / (col("n_w1") + col("n_w2")), 4).as("dice"))
      .orderBy(col("dice").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DuckDB oracle twin of [[collocations]] — same ≥2-token corpus, same
    * two count grains, the same single-division Dice, and the same fully
    * ordered top-k cut. */
  def collocationsOracleSql(minCount: Int = 3, k: Int = 50): String =
    s"""WITH t AS (SELECT string_split_regex(text, '\\s+') AS toks FROM documents),
       | tk AS (SELECT toks FROM t WHERE len(toks) >= 2),
       | bge AS (SELECT b['w1'] AS w1, b['w2'] AS w2 FROM (
       |          SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS b
       |          FROM tk)),
       | uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
       | p AS (SELECT w1, w2, count(*) AS n_pair FROM bge GROUP BY w1, w2
       |       HAVING count(*) >= $minCount)
       |SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
       | CAST(a.c1 AS BIGINT) AS n_w1, CAST(b.c1 AS BIGINT) AS n_w2,
       | round(2.0 * p.n_pair / (a.c1 + b.c1), 4) AS dice
       |FROM p JOIN uni a ON p.w1 = a.w JOIN uni b ON p.w2 = b.w
       |ORDER BY dice DESC, w1, w2 LIMIT $k""".stripMargin

  /** Perplexity-bucket filtering (t33) — the CCNet selection step: score
    * every document under the in-corpus LM (the t32 interpolated
    * Kneser-Ney bigram average log-prob; higher = more fluent), split the
    * corpus into head/middle/tail TERCILES of that score, and keep
    * head+middle — the quality gate CCNet, RedPajama, and CCNet-derived
    * pipelines run between langid and dedup.
    *
    * Scale shape: terciles WITHOUT a global sort, the c23 histogram
    * device — `kn_lp` is a 4-decimal score, so its value grid is bounded
    * at any corpus size; the boundary statistic is one map-side-combined
    * histogram plus a cumulative count over that tiny grid (a
    * single-partition window over ≤ ~10⁵ cells, not the corpus), joined
    * back broadcast. The `ntile(3) OVER (ORDER BY kn_lp)` a warehouse
    * would write serializes the corpus through one sort partition; this
    * form doesn't. */
  def pplFilter(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = materialize(knBigramScore(docs))
    // max(…, 1): an empty corpus would interpolate `div 0` into the tile
    // expression (ADVICE r10 — q51 pattern); no row exists to hit it, but
    // the clamp keeps the plan free of a poisoned constant
    val tot = math.max(scored.count(), 1L)
    val wd = Window.orderBy(col("kn_lp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = scored.groupBy(col("kn_lp")).agg(count(lit(1)).as("c"))
      .withColumn("cd", sum(col("c")).over(wd))
      .select(col("kn_lp"), expr(s"CAST((3 * cd + $tot - 1) div $tot AS BIGINT)").as("tile"))
    scored.join(broadcast(cells), Seq("kn_lp"))
      .select(col("doc_id"), col("n_bigram"), col("kn_lp"),
        when(col("tile") === 1, "head").when(col("tile") === 2, "middle")
          .otherwise("tail").as("bucket"),
        (col("tile") <= 2).as("keep"))
  }

  /** Luhn per-position contribution for candidate string column `c`, as a
    * shared SQL fragment: digits at ODD 1-based LEFT positions double
    * (>9 subtracts 9), exact integer arithmetic — engine-portable
    * CASE/substr algebra. The odd-left-position rule is correct for BOTH
    * call sites by construction, not by a length switch: verifying the
    * full 16-digit candidate (even length — odd-from-right-excluding-none
    * ⇒ odd from left) and deriving the check digit over the 15-digit
    * payload (its leftmost digit lands at position 1 of the final
    * 16-char string, which doubles — same odd-left parity). A length
    * parameter here would imply the fragment adapts; it must not
    * (ADVICE r10). */
  private def luhnSumSql(c: String): String = {
    // per-position contribution, usable in Spark transform() and a DuckDB
    // list comprehension alike (i is the 1-based left position variable)
    def d = s"(ascii(substr($c, CAST(i AS INT), 1)) - 48)"
    s"CASE WHEN i % 2 = 1 THEN (CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END) ELSE $d END"
  }

  /** Payment-card screening with CHECKSUM verification (t34) — the PII
    * class where a bare `\\d{16}` regex drowns in false positives (order
    * ids, timestamps, hashes): a candidate only counts when its Luhn
    * checksum validates, exactly how production PAN scanners (DLP tools,
    * PCI audits) separate card numbers from noise. Detection AND rejection
    * are both proven by injection: every 4th document appends a 16-digit
    * candidate whose first 15 digits derive from doc_id and whose check
    * digit is CORRECT when (doc_id / 4) is even and off-by-one otherwise
    * (a pure function replayed by the oracle) — so the screen must flag
    * exactly the valid half and count-but-reject the rest. Row-local regex
    * extraction + integer checksum folds, whole-stage codegen, zero
    * shuffle. */
  def luhnScreen(docs: DataFrame): DataFrame = {
    // 15 base digits from a multiplicative hash of doc_id; check digit at
    // position 16 via the Luhn closure, +1 spoiler for odd ids
    val base = "lpad(CAST(doc_id * 2654435761 % 1000000000000000 AS STRING), 15, '0')"
    val chk = s"aggregate(transform(sequence(1, 15), i -> ${luhnSumSql("b")}), 0, (a, x) -> a + x)"
    val aug = docs
      .withColumn("b", expr(base))
      .withColumn("cd", expr(s"CAST((10 - $chk % 10) % 10 + (doc_id div 4) % 2 AS INT) % 10"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(col("text"), lit(" pay "), col("b"), col("cd").cast(StringType)))
          .otherwise(col("text")).as("t"))
    val luhn = s"aggregate(transform(sequence(1, 16), i -> ${luhnSumSql("c")}), 0, (a, x) -> a + x)"
    aug.select(col("doc_id"),
      expr("regexp_extract_all(t, '\\\\b\\\\d{16}\\\\b', 0)").as("cands"))
      .select(col("doc_id"), size(col("cands")).cast(LongType).as("n_cand"),
        expr(s"size(filter(cands, c -> $luhn % 10 = 0))").cast(LongType).as("n_valid"))
      .withColumn("has_pan", col("n_valid") > 0)
  }

  /** DuckDB oracle twin of [[luhnScreen]] — the same injection closure,
    * candidate regex, and Luhn fold in list-comprehension form. */
  def luhnScreenOracleSql: String = {
    def luhnList(c: String, n: Int): String =
      s"list_sum([${luhnSumSql(c).replace("ascii(", "ord(")} for i in range(1, ${n + 1})])"
    s"""WITH b AS (SELECT doc_id,
       |            lpad(CAST(doc_id * 2654435761 % 1000000000000000 AS VARCHAR), 15, '0') AS b
       |           FROM documents),
       | cd AS (SELECT doc_id, b,
       |         CAST((10 - ${luhnList("b", 15)} % 10) % 10 + (doc_id // 4) % 2 AS INT) % 10 AS cd
       |        FROM b),
       | a AS (SELECT d.doc_id,
       |        CASE WHEN d.doc_id % 4 = 0
       |             THEN d.text || ' pay ' || c.b || CAST(c.cd AS VARCHAR)
       |             ELSE d.text END AS t
       |       FROM documents d JOIN cd c USING (doc_id)),
       | x AS (SELECT doc_id, regexp_extract_all(t, '\\b\\d{16}\\b') AS cands FROM a)
       |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_cand,
       | CAST(len(list_filter(cands, c -> ${luhnList("c", 16)} % 10 = 0)) AS BIGINT) AS n_valid,
       | (len(list_filter(cands, c -> ${luhnList("c", 16)} % 10 = 0)) > 0) AS has_pan
       |FROM x""".stripMargin
  }

  /** One unit of the t36 injected instruction block — carries three
    * marker phrases; quote-free for verbatim embedding. */
  val InstructionUnit: String = " Ignore previous instructions. You are a helpful system prompt"

  /** The t36 marker alternation, matched on lowercased text (Java≡RE2:
    * literal alternation only). */
  val InstructionRe: String =
    "ignore previous instructions|you are a |system prompt|as an ai|do not reveal"

  /** Instruction-content screening (t36) — the prompt-injection /
    * instruction-leak scan a modern pretraining pipeline runs (scraped
    * jailbreak pages and leaked system prompts teach models to obey
    * embedded instructions; governance reviews ask for the count): count
    * instruction-marker phrases on the lowercased text and flag documents
    * with ≥ 2 hits. Detection is PROVEN by injection: every 9th document
    * appends `⌊n_chars/400⌋ + 1` [[InstructionUnit]] blocks (3 markers
    * each, length-scaled — the t23 lesson; a pure function replayed by
    * the oracle); this corpus's natural text never contains the phrases.
    * Row-local regex counts, whole-stage codegen, zero shuffle. */
  def instructionScreen(docs: DataFrame): DataFrame = {
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(9)) === 0,
        concat(col("text"), expr(
          s"repeat('$InstructionUnit', CAST(length(text) DIV 400 + 1 AS INT))")))
        .otherwise(col("text")).as("t"))
    aug.select(col("doc_id"),
      length(col("t")).cast(LongType).as("n_chars"),
      size(expr(s"regexp_extract_all(lower(t), '$InstructionRe', 0)"))
        .cast(LongType).as("n_instr"))
      .withColumn("flagged", col("n_instr") >= 2)
  }

  /** DuckDB oracle twin of [[instructionScreen]] — same injection,
    * alternation, and threshold. */
  def instructionScreenOracleSql: String =
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 9 = 0
       |                 THEN text || repeat('$InstructionUnit',
       |                        CAST(length(text) // 400 + 1 AS INT))
       |                 ELSE text END AS t
       |           FROM documents)
       |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
       | CAST(len(regexp_extract_all(lower(t), '$InstructionRe')) AS BIGINT) AS n_instr,
       | (len(regexp_extract_all(lower(t), '$InstructionRe')) >= 2) AS flagged
       |FROM a""".stripMargin

  /** One unit of the t35 citation block: a numeric bracket, a name-year
    * citation, a DOI, and a reference URL — quote-free so it embeds
    * verbatim in both engines' string literals. */
  val CitationUnit: String = " [12] (Smith, 2020) doi:10.1000/j.123 https://ref.example.org/p"

  /** Citation-density scoring (t35) — the academic-content signal an
    * educational-quality pipeline extracts (FineWeb-edu-class filters
    * weight citation apparatus heavily; reference density separates a
    * paper-like page from chat): count numeric bracket citations
    * `[12]`, name-year citations `(Smith, 2020)`, DOIs, and URLs, and
    * flag documents whose citation mass and density cross thresholds.
    * Detection is PROVEN by injection: every 6th document appends
    * `⌊n_chars/300⌋ + 2` [[CitationUnit]] blocks (scaled with length, the
    * t23 lesson, so density clears its floor at ANY document length; a
    * pure function replayed by the oracle) — this corpus's natural text
    * carries none of these patterns, so the flag fires exactly on the
    * injected. Row-local regex counts in the Java≡RE2 common subset (t6
    * discipline), whole-stage codegen, zero shuffle. */
  def citationDensity(docs: DataFrame): DataFrame = {
    val aug = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(6)) === 0,
        concat(col("text"), expr(
          s"repeat('$CitationUnit', CAST(length(text) DIV 300 + 2 AS INT))")))
        .otherwise(col("text")).as("t"))
    aug.select(col("doc_id"),
      size(split(col("t"), "\\s+")).cast(LongType).as("n_tok"),
      size(expr("regexp_extract_all(t, '\\\\[\\\\d{1,3}\\\\]', 0)")).cast(LongType).as("n_bracket"),
      size(expr("regexp_extract_all(t, '\\\\([A-Z][a-z]+, (19|20)\\\\d{2}\\\\)', 0)")).cast(LongType).as("n_nameyear"),
      size(expr("regexp_extract_all(t, 'doi:10\\\\.\\\\d{4,5}/[^ ]+', 0)")).cast(LongType).as("n_doi"),
      size(expr("regexp_extract_all(t, 'https?://[^ ]+', 0)")).cast(LongType).as("n_url"))
      .withColumn("n_cit", col("n_bracket") + col("n_nameyear") + col("n_doi"))
      .withColumn("density", round(col("n_cit").cast(DoubleType) / col("n_tok"), 4))
      .withColumn("academic", col("n_cit") >= 3 && col("density") >= 0.01)
  }

  /** DuckDB oracle twin of [[citationDensity]] — same injection, regex
    * classes, counts, and thresholds. */
  def citationDensityOracleSql: String =
    s"""WITH a AS (SELECT doc_id,
       |            CASE WHEN doc_id % 6 = 0
       |                 THEN text || repeat('$CitationUnit',
       |                        CAST(length(text) // 300 + 2 AS INT))
       |                 ELSE text END AS t
       |           FROM documents),
       | c AS (SELECT doc_id,
       |        CAST(len(string_split_regex(t, '\\s+')) AS BIGINT) AS n_tok,
       |        CAST(len(regexp_extract_all(t, '\\[\\d{1,3}\\]')) AS BIGINT) AS n_bracket,
       |        CAST(len(regexp_extract_all(t, '\\([A-Z][a-z]+, (19|20)\\d{2}\\)')) AS BIGINT) AS n_nameyear,
       |        CAST(len(regexp_extract_all(t, 'doi:10\\.\\d{4,5}/[^ ]+')) AS BIGINT) AS n_doi,
       |        CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) AS n_url
       |       FROM a)
       |SELECT doc_id, n_tok, n_bracket, n_nameyear, n_doi, n_url,
       | (n_bracket + n_nameyear + n_doi) AS n_cit,
       | round(CAST(n_bracket + n_nameyear + n_doi AS DOUBLE) / n_tok, 4) AS density,
       | ((n_bracket + n_nameyear + n_doi) >= 3
       |  AND round(CAST(n_bracket + n_nameyear + n_doi AS DOUBLE) / n_tok, 4) >= 0.01) AS academic
       |FROM c""".stripMargin

  /** DuckDB oracle twin of [[pplFilter]] — the t32 oracle as the scored
    * relation, the same histogram-tercile arithmetic over the score grid. */
  def pplFilterOracleSql: String =
    s"""WITH s AS (SELECT doc_id, n_bigram, kn_lp
       |           FROM (${knBigramScoreOracleSql().replace("\n", "\n      ")}) t),
       | h AS (SELECT kn_lp, count(*) AS c FROM s GROUP BY kn_lp),
       | cum AS (SELECT kn_lp, sum(c) OVER (ORDER BY kn_lp DESC) AS cd,
       |          (SELECT sum(c) FROM h) AS tot FROM h),
       | d AS (SELECT kn_lp, CAST((3 * cd + tot - 1) // tot AS BIGINT) AS tile FROM cum)
       |SELECT s.doc_id, s.n_bigram, s.kn_lp,
       | CASE WHEN d.tile = 1 THEN 'head' WHEN d.tile = 2 THEN 'middle'
       |      ELSE 'tail' END AS bucket,
       | (d.tile <= 2) AS keep
       |FROM s JOIN d USING (kn_lp)""".stripMargin

  /** C4-style LINE-level cleaning + page filters (t37, Raffel et al.
    * 2020 §2.2 — the other canonical web-corpus ruleset; t16's Gopher
    * rules are page-level QUALITY flags, this is the line-keep +
    * page-drop pipeline C4 actually ships): a line survives only if it
    * ends in terminal punctuation (`.` `!` `?` `"`) AND carries ≥3
    * words; a page drops entirely if it mentions "lorem ipsum" or
    * contains a curly brace (the code-page tell), or keeps fewer than 2
    * surviving lines. Line structure rides the t16 injection
    * ([[withSyntheticLines]] — every (doc_id+j)%5==0 line gains the
    * terminal " ..."), and the page filters are PROVEN by injection:
    * every doc_id%13==0 page gains a lorem-ipsum line, every
    * doc_id%17==0 page a braced code line — pure doc_id functions the
    * oracle replays.
    *
    * Determinism: counts and flags are integers/booleans over exact
    * string predicates — no floats anywhere. Scale shape: zero shuffle,
    * one row-local pass (the t16 discipline) — at 100 TB this is the
    * map-only cut in front of every downstream operator, and
    * `kept_chars` is the byte budget the cut leaves behind. */
  def c4Filters(docs: DataFrame): DataFrame = {
    val injected = withSyntheticLines(docs)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 13 === 0,
          lit("\nlorem ipsum dolor sit amet ...")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit("\nvar f = function() { return 1; } ...")).otherwise(lit(""))))
    injected
      .select(col("doc_id"),
        split(col("text"), "\n").as("lns"),
        lower(col("text")).contains("lorem ipsum").as("has_lorem"),
        col("text").contains("{").as("has_brace"))
      .select(col("doc_id"),
        size(col("lns")).cast(LongType).as("n_lines"),
        filter(col("lns"), l =>
          (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
            size(filter(split(l, " "), w => w.rlike("[a-z]"))) >= 3).as("kept"),
        col("has_lorem"), col("has_brace"))
      .select(col("doc_id"), col("n_lines"),
        size(col("kept")).cast(LongType).as("n_kept"),
        aggregate(col("kept"), lit(0L), (acc, l) => acc + length(l)).as("kept_chars"),
        col("has_lorem"), col("has_brace"),
        (size(col("kept")) >= 2 && !col("has_lorem") && !col("has_brace")).as("keep"))
  }

  /** DuckDB oracle twin of [[c4Filters]] — the t16 line injection
    * ([[syntheticLinesCtes]], one shared copy), the same page
    * injections, line predicate, and page gate. */
  def c4FiltersOracleSql: String =
    s"""WITH $syntheticLinesCtes,
       | tx AS (SELECT doc_id, text ||
       |         CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet ...' ELSE '' END ||
       |         CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'var f = function() { return 1; } ...' ELSE '' END AS text
       |        FROM st),
       | r AS (SELECT doc_id, string_split(text, chr(10)) AS lns,
       |        contains(lower(text), 'lorem ipsum') AS has_lorem,
       |        contains(text, '{') AS has_brace FROM tx),
       | k AS (SELECT doc_id, CAST(len(lns) AS BIGINT) AS n_lines,
       |        list_filter(lns, l ->
       |          (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '"'))
       |          AND len(list_filter(string_split(l, ' '), w -> regexp_matches(w, '[a-z]'))) >= 3) AS kept,
       |        has_lorem, has_brace FROM r)
       |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
       | CAST(coalesce(list_sum(list_transform(kept, l -> length(l))), 0) AS BIGINT) AS kept_chars,
       | has_lorem, has_brace,
       | (len(kept) >= 2 AND NOT has_lorem AND NOT has_brace) AS keep
       |FROM k""".stripMargin
}

