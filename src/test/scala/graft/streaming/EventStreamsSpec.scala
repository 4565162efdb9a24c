package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.{Relational, Tables}
import graft.testutil.SparkSuite

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming hourly agg equals the batch equivalent") {
    val streamed = EventStreams.hourlyAggOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 3).as("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("e12 sliding-window agg equals the two-windows-per-event batch replay") {
    val streamed = EventStreams.slidingAggOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val e = Tables.events(spark, dir)
    val batch = e.select(col("event_type"), col("value"), col("ts"),
        explode(array(lit(0), lit(1))).as("o"))
      .select(col("event_type"), col("value"),
        date_format(
          (unix_timestamp(date_trunc("hour", col("ts"))) - col("o") * 3600).cast("timestamp"),
          "yyyy-MM-dd HH:mm").as("ws"))
      .groupBy(col("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 3).as("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    // overlap invariant: total window-rows are exactly 2× the event count
    assert(streamed.toSeq.map(_._3).sum == 2 * e.count())
  }

  test("e14 index maintenance: final index is exactly the corpus-wide distinct hash set") {
    val pfx = EventStreams.indexMaintainOnce(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.t(spark, dir, "documents")
      .select(md5(col("text")).as("h")).distinct()
      .groupBy(substring(col("h"), 1, 1).as("pfx"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pfx == want)
    // growth accounting: the delta must have contributed its novel hashes
    // (the fixture has no cross-split dups, so novel = all delta hashes)
    val corpusN = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0).select(md5(col("text"))).distinct().count()
    assert(pfx.values.sum > corpusN, "stream appended nothing")
  }

  test("e13 streaming rate anomaly equals the batch z-score replay") {
    val streamed = EventStreams.rateAnomalyOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val e = Tables.events(spark, dir)
    val hourly = e.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).cast("double").as("s1"),
        sum(col("n") * col("n")).cast("double").as("s2"),
        count(lit(1)).cast("double").as("c"))
    val batch = hourly.join(stats, Seq("event_type"))
      .select(col("hr"), col("event_type"), col("n"),
        round((col("n") - col("s1") / col("c")) /
          sqrt((col("s2") - col("s1") * col("s1") / col("c")) / (col("c") - 1)), 4).as("z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // anomalies must be detectable AND rare-ish, or the z-scale is miswired
    val zs = streamed.toSeq.map(_._4)
    assert(zs.exists(z => math.abs(z) > 1.0), "no hour deviates — profile degenerate")
    assert(zs.count(z => math.abs(z) > 3.0) < zs.size / 2, "half the corpus 'anomalous'")
  }

  test("stream-static enrichment join equals the batch equivalent") {
    val streamed = EventStreams.enrichedAggOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.events(spark, dir)
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 3).as("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("e9 near-dup stream plans ZERO stateful operators and matches d8's pair relation") {
    import graft.ops.Dedup
    val name = s"neardup_shape_${System.nanoTime()}"
    val q = EventStreams.nearDupStream(spark, dir, 0.8)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // the zero-state claim, machine-checked: no state stores, so per-doc
    // cost cannot grow with feed lifetime (the corpus memory lives in the
    // at-rest LSH index, not in streaming state)
    val prog = q.lastProgress
    assert(prog != null && prog.stateOperators.isEmpty,
      s"expected stateless plan, got ${prog.stateOperators.length} state operators")
    val streamed = spark.table(name).select("delta_id", "corpus_id", "jac").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalNearDup(spark, dir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "stream and batch must produce the same verified pairs")
    assert(streamed.nonEmpty)
  }

  test("e6 stream-stream interval join matches the batch interval self-join") {
    val streamed = EventStreams.intervalJoinOnce(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val batch = p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("c_id")).as("n_clicks"),
        count_distinct(col("p_id")).as("n_purchases"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("e7 LEFT interval join: staged sentinel drive flushes unmatched purchases") {
    // the r7 regression: this drive stages events0/events1.parquet into a
    // temp dir (no literal events.parquet), so it exercises both the
    // glob-based ts sniff AND the encoding-matched sentinel file
    val out = EventStreams.leftIntervalJoinOnce(spark, dir).cache()
    try {
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.nonEmpty, "e7 returned no rows")
      // every row: n_rows = n_matched + n_unmatched, and unmatched rows exist
      // somewhere (purchases with no click in-window), else LEFT degenerated
      // to INNER
      rows.foreach { case (u, n, m, um) =>
        assert(n == m + um, s"user $u: n_rows $n != matched $m + unmatched $um")
      }
      assert(rows.map(_._4).sum > 0, "no unmatched purchases — left join degenerated to inner")
      // batch LEFT JOIN twin (the oracle shape) must agree exactly
      val ev = Tables.events(spark, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      val batch = p.join(c, col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"), "left_outer")
        .groupBy(col("p_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_id")).as("n_matched"),
          sum(when(col("c_id").isNull, 1L).otherwise(0L)).as("n_unmatched"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.toSet == batch, "streamed left join disagrees with batch twin")
    } finally { out.unpersist(); () }
  }

  test("e10 native session_window matches batch island detection") {
    val streamed = EventStreams.sessionWindowOnce(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // batch twin: break a new session when ts - prev >= gap (session
    // covers [first, last+gap) — an event at exactly last+gap is outside)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts") >= col("prev") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"), max(col("n")).as("max_len"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("e11 streaming quality gate matches the batch verdict report") {
    import graft.ops.TextOps
    val streamed = EventStreams.qualityGateOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = TextOps.gopherRules(TextOps.withSyntheticLines(docs))
      .select(col("doc_id"), col("keep"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("keep")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    // both verdicts must occur somewhere, else the gate is degenerate
    assert(streamed.keys.exists(_._2) && streamed.keys.exists(!_._2))
  }

  test("e15 dual-sink routing: sinks reconcile exactly with the batch verdicts") {
    import graft.ops.TextOps
    val streamed = EventStreams.dualSinkOnce(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = TextOps.gopherRules(TextOps.withSyntheticLines(docs))
      .select(col("doc_id"), col("keep"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("keep"), col("source")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (if (r.getBoolean(0)) "keep" else "reject", r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    // exhaustive + exclusive: the two sinks partition the corpus
    assert(streamed.values.sum == docs.count())
    assert(streamed.keys.exists(_._1 == "keep") && streamed.keys.exists(_._1 == "reject"))
  }

  test("e19 streaming HLL distinct stays inside its envelope for every window") {
    val rows = EventStreams.approxUsersOnce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val hours = Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.expr("unix_timestamp(ts) DIV 3600")).distinct().count()
    assert(rows.length == hours, "one row per observed hour")
    rows.foreach { case (hr, nExact, ok) =>
      assert(nExact > 0)
      assert(ok, s"window $hr: estimate strayed past the HLL++ envelope of $nExact")
    }
  }

  test("e18 as-of enrichment equals a batch lag-walk transition matrix") {
    val got = EventStreams.asofEnrichOnce(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch truth: the per-user lag of event_type in (ts, event_id) order
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      sorted.zipWithIndex.foreach { case ((_, _, t, us), i) =>
        // prev = the state valid strictly before THIS timestamp (ties
        // collapse to the pre-tie state, the interval-tiling semantics)
        val prior = sorted.take(i).filter(_._4 < us)
        val p = if (prior.isEmpty) "none" else prior.last._3
        val k = (p, t)
        want(k) = want.getOrElse(k, 0L) + 1
      }
    }
    assert(got == want.toMap)
    assert(got.values.sum == ev.length, "every event enriched exactly once")
    assert(got.keys.exists(_._1 == "none") && got.keys.exists(_._1 != "none"))
  }

  test("e17 streaming media ingest matches the batch m7 audio slice") {
    import graft.ops.Multimodal
    val streamed = Multimodal.mediaStreamOnce(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // batch truth: the m7 ingest's audio rows, folded the same way
    val batch = Multimodal.modalIngest(spark, dir)
      .filter(org.apache.spark.sql.functions.col("modality") === "audio")
      .collect().map(r => (r.getLong(0) % 5, r.getLong(5), r.getLong(6)))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum, v.map(_._3).sum)).toMap
    assert(streamed == batch)
    assert(streamed.values.map(_._1).sum == 10, "all ten wav files streamed")
  }

  test("e16 idempotent sink: the doubled drive is absorbed, not appended") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = EventStreams.idempotentSinkOnce(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the gate ran the stream TWICE into one sink; totals must be ONE pass
    assert(out.values.map(_._1).sum == docs.count(),
      "a retried batch must overwrite its subdir, never double-append")
    val want = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), "\\s+")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0) % 10, r.getLong(1)))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(out == want)
  }

  test("stateful streaming sessionization matches the batch window version") {
    import EventStreams.{Ev, UserSessions}
    // drive the stateful operator through a real streaming query (memory
    // source would need manual batches; file source re-reads the parquet)
    implicit val evEnc = Encoders.product[Ev]
    val evs = EventStreams.readEventStream(spark, dir)
      .select(col("user_id"), col("ts")).as[Ev]
    val name = s"sessions_${System.nanoTime()}"
    val q = EventStreams.sessionize(evs).writeStream
      .outputMode(OutputMode.Update).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // Update mode: last emitted row per user is the final state
    val streamedMap = spark.table(name).groupBy("user_id")
      .agg(max(col("n_sessions")).as("ns"), max(col("n_events")).as("ne"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val batch = Relational.q15_sessionize(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getLong(2).toInt)).toMap
    assert(streamedMap == batch)
  }

  test("transformWithState sessionization matches the classic stateful form") {
    import EventStreams.{Ev, UserSessions}
    implicit val evEnc = Encoders.product[Ev]
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = EventStreams.readEventStream(spark, dir)
        .select(col("user_id"), col("ts")).as[Ev]
      val name = s"sessions_tws_${System.nanoTime()}"
      val q = EventStreams.sessionizeTws(evs).writeStream
        .outputMode(OutputMode.Update).format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val streamedMap = spark.table(name).groupBy("user_id")
        .agg(max(col("n_sessions")).as("ns"), max(col("n_events")).as("ne"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val batch = Relational.q15_sessionize(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getLong(2).toInt)).toMap
      assert(streamedMap == batch)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("watermark-aware sessionizer folds cross-batch out-of-order events in event-time order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.Ev
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val evEnc = Encoders.product[Ev]
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val evs = mem.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "10 seconds").as[Ev]
      val name = s"sessions_wm_${System.nanoTime()}"
      val q = EventStreams.sessionizeWm(evs, gapSeconds = 3).toDF()
        .writeStream.outputMode(OutputMode.Update).format("memory").queryName(name).start()
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      try {
        mem.addData((1L, ts(100)), (1L, ts(105))); q.processAllAvailable()
        // 102 is OLDER than both buffered events but inside the watermark
        // (wm = 105s - 10s = 95s): a sort-within-batch processor folds it
        // out of order and would report 2 sessions
        mem.addData((1L, ts(102))); q.processAllAvailable()
        // push the watermark past user 1's events: timer fires, fold runs
        mem.addData((2L, ts(1000))); q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).filter(col("user_id") === 1L).collect()
        .map(r => (r.getInt(1), r.getInt(2)))
      // event-time fold: 100,102,105 — gaps 2 and 3, neither > 3 → ONE session
      assert(rows.nonEmpty && rows.last == ((1, 3)),
        s"expected one 3-event session from the sorted fold, got ${rows.toSeq}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key)
    }
  }

  test("watermark drops late data in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "HH:mm").as("hr"), col("n"))
    val name = s"late_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      mem.addData((ts(1, 10), 1.0), (ts(1, 20), 1.0))
      q.processAllAvailable()
      // advance watermark far past hour 1: its window finalizes
      mem.addData((ts(4, 0), 1.0))
      q.processAllAvailable()
      // a late event for hour 1 arrives after the watermark passed: dropped
      mem.addData((ts(1, 40), 99.0))
      q.processAllAvailable()
      mem.addData((ts(6, 0), 1.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.get("01:00").contains(2L), s"late event must not count: $rows")
    } finally q.stop()
  }

  test("dedup state survives checkpoint recovery: no re-emits across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = graft.testutil.SparkSuite.tempDir("graft-ckpt")
    val outDir = graft.testutil.SparkSuite.tempDir("graft-ckpt-out")
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def start(mem: MemoryStream[(java.sql.Timestamp, Long)]) =
      mem.toDF().toDF("ts", "id")
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.outputMode(OutputMode.Append).format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    val batch1 = (1L to 10L).map(i => (ts(1, i.toInt), i))
    val mem1 = MemoryStream[(java.sql.Timestamp, Long)]
    val q1 = start(mem1)
    try { mem1.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: the new source replays the same block so
    // offsets line up (a real source would serve them from its log); the
    // dedup STATE and the file sink's batch log come from the checkpoint
    val mem2 = MemoryStream[(java.sql.Timestamp, Long)]
    mem2.addData(batch1: _*)
    val q2 = start(mem2)
    try {
      // ids 5-15: 5-10 are duplicates that only recovered state can catch
      mem2.addData((5L to 15L).map(i => (ts(1, 30 + i.toInt), i)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val out = spark.read.parquet(outDir).select(col("id")).as[Long].collect().sorted
    assert(out.toSeq == (1L to 15L), s"exactly-once violated: ${out.toSeq}")
  }

  test("streaming voxel ingestion: foreachBatch feeds fromVoxels incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.core.{Grid, Meta}
    import graft.volume.{Volume, VoxelBuffer}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("1_1_1", (16, 16, 4), "gzip", (1, 1, 1), (32, 32, 4), (0, 0, 0))))
    val vol = Volume.create(spark, graft.testutil.SparkSuite.tempDir("graft-singest"), meta)
    val mem = MemoryStream[(Int, Int, Int, Int, Int)] // x, y, z, c, value
    val q = mem.toDF().toDF("x", "y", "z", "c", "value")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        vol.fromVoxels(batch.withColumn("value",
          org.apache.spark.sql.functions.col("value").cast("smallint")))
        ()
      }.start()
    try {
      // two micro-batches covering two different chunks
      mem.addData((for (z <- 1 to 4; y <- 1 to 16; x <- 1 to 16) yield (x, y, z, 0, (x + y) % 250)): _*)
      q.processAllAvailable()
      mem.addData((for (z <- 1 to 4; y <- 1 to 16; x <- 17 to 32) yield (x, y, z, 0, (x * y) % 250)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = vol.cutout(Grid.Box(1, 32, 1, 16, 1, 4))
    assert(out.getLong(2, 3, 1) == (3 + 4) % 250)   // batch 1 region
    assert(out.getLong(20, 3, 1) == (21 * 4) % 250) // batch 2 region
  }

  test("e20 merge is batch-invariant and rewrites only touched buckets") {
    import org.apache.spark.sql.functions.col
    val ev = graft.ops.Tables.events(spark, dir)
    def state(target: String): Map[Long, (Long, String)] =
      spark.read.parquet(target).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(4))).toMap

    // one batch vs an arbitrary two-way split vs a three-way split —
    // identical final tables (the merge is the associative fold)
    val whole = SparkSuite.tempDir("graft-e20-whole") + "/t"
    EventStreams.mergeUserState(spark, whole, ev)
    val split2 = SparkSuite.tempDir("graft-e20-s2") + "/t"
    EventStreams.mergeUserState(spark, split2, ev.filter(col("event_id") % 2 === 0))
    EventStreams.mergeUserState(spark, split2, ev.filter(col("event_id") % 2 =!= 0))
    val split3 = SparkSuite.tempDir("graft-e20-s3") + "/t"
    for (m <- 0 to 2)
      EventStreams.mergeUserState(spark, split3, ev.filter(col("event_id") % 3 === m))
    assert(state(whole) == state(split2), "2-way split diverged")
    assert(state(whole) == state(split3), "3-way split diverged")

    // copy-on-write at bucket grain: a delta touching ONE user leaves
    // every other bucket's files untouched
    def stamps(t: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(t)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = stamps(whole)
    val oneUser = ev.orderBy(col("event_id")).limit(1)
    val uid = oneUser.select(col("user_id")).head().getLong(0)
    EventStreams.mergeUserState(spark, whole, oneUser)
    val after = stamps(whole)
    val touched = s"bucket=${uid % 16}"
    for ((p, t0) <- before if !p.contains(touched))
      assert(after.get(p).contains(t0), s"untouched bucket rewritten: $p")
    assert(state(whole)(uid)._1 == state(split2)(uid)._1 + 1, "re-merged delta must add")
  }

  test("e27 late audit: drops are exactly the stragglers behind the armed watermark") {
    val got = EventStreams.lateAuditOnce(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ev = Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hr"),
        col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
        unix_micros(date_trunc("hour", col("ts"))).as("w0us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // armed watermark: ms-truncated max on-time ts minus 1 h
    val wmUs = ev.filter(_._3 % 5 != 0).map(_._4).max / 1000 * 1000 - 3600L * 1000000
    val want = ev.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      val total = rows.length.toLong
      val dropped = rows.count(e => e._3 % 5 == 0 && e._5 + 3600L * 1000000 <= wmUs).toLong
      k -> ((total - dropped, total, dropped))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"window $k") }
    // the audit must observe real drops AND real survivors, or it is vacuous
    assert(got.values.map(_._3).sum > 0, "no stragglers dropped — watermark never armed")
    assert(got.values.exists(v => v._3 == 0 && v._2 > 0), "every window lost rows")
    // on-time rows never drop: per-window drops are bounded by the straggler count
    ev.groupBy(e => (e._1, e._2)).foreach { case (k, rows) =>
      assert(got(k)._3 <= rows.count(_._3 % 5 == 0).toLong, s"window $k dropped on-time rows")
    }
  }

  test("e22 heartbeat gaps equal a batch lag-diff recount") {
    val got = EventStreams.heartbeatOnce(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, ts) =>
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val (n, maxS, nOver) = got(u)
      assert(n == ts.length.toLong)
      assert(maxS == (if (gaps.isEmpty) 0L else gaps.max / 1000), s"user $u max gap")
      assert(nOver == gaps.count(_ > 172800000L).toLong, s"user $u n_over")
    }
    // the monitor must flag something on this fixture or the columns are vacuous
    assert(got.values.exists(_._3 > 0), "no over-threshold gaps in fixture")
    assert(got.values.exists(v => v._2 > 0 && v._3 == 0), "no healthy-but-gapped user")
  }

  test("e21 windowed quantiles equal a batch order-statistics recount") {
    val got = EventStreams.windowQuantilesOnce(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val byWin = Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hr"),
        col("event_type"), col("value"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    assert(got.keySet == byWin.keySet)
    byWin.foreach { case (k, vs) =>
      val n = vs.length
      val (gn, med, p90) = got(k)
      assert(gn == n.toLong)
      // discrete order statistics: RAW stored doubles, no interpolation
      assert(med == vs((n + 1) / 2 - 1), s"$k median")
      assert(p90 == vs((9 * n + 9) / 10 - 1), s"$k p90")
      assert(n < 2 || p90 >= med)
    }
    // fixture has windows where median and p90 pick DIFFERENT elements,
    // or the two columns are vacuously equal
    assert(byWin.values.exists(vs => (vs.length + 1) / 2 != (9 * vs.length + 9) / 10))
  }

  test("e28 ivf upkeep: micro-batch cadence invisible; served census conserves the corpus") {
    import graft.ops.{Similarity, Tables}
    val emb = Tables.t(spark, dir, "embeddings")
    val (cents, _, cellPath) = Similarity.ivfAtRest(spark, dir)
    // the same delta feed in ONE file vs THREE files (three micro-batches
    // under maxFilesPerTrigger semantics of the file source): the served
    // census must be identical — the fold is associative by construction
    def run(nFiles: Int): Map[Long, (Long, Double)] = {
      val feed = SparkSuite.tempDir(s"graft-e28-feed$nFiles")
      emb.repartition(nFiles).write.mode("overwrite").parquet(feed)
      val acc = SparkSuite.tempDir(s"graft-e28-acc$nFiles")
      EventStreams.streamIvfInto(spark, s"$feed/*.parquet", emb.schema, cents, acc,
        maxFilesPerTrigger = Some(1)) // one file per micro-batch
      val nBatches = new java.io.File(acc).listFiles().count(_.getName.startsWith("batch_"))
      assert(nBatches == nFiles, s"expected $nFiles micro-batches, got $nBatches")
      EventStreams.servedIvfCensus(spark, cellPath, acc).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    val one = run(1)
    val three = run(3)
    assert(one == three, "micro-batch cadence leaked into the served census")
    // conservation: standing + delta = every vector, each in exactly one cell
    assert(one.values.map(_._1).sum == emb.count())
    one.values.foreach { case (_, m) => assert(m >= -1.0 && m <= 1.0) }
  }
  test("e29 visual upkeep: micro-batch cadence invisible; union of shard folds equals the m30 batch pass") {
    import graft.ops.{Multimodal, Tables}
    val docs = Tables.t(spark, dir, "documents")
    val evalIdx = Multimodal.evalVisualIndex(spark, dir)
    val donors = Tables.materialize(Multimodal.donorRelation(spark, dir))
    // the same corpus as ONE file vs FOUR files (four micro-batches under
    // maxFilesPerTrigger=1): per-image folds complete inside each batch
    // (no cross-batch state), so the union must be cadence-independent
    def run(nFiles: Int): Map[Long, (Long, Long, Long)] = {
      val feed = SparkSuite.tempDir(s"graft-e29-feed$nFiles")
      docs.repartition(nFiles).write.mode("overwrite").parquet(feed)
      val acc = SparkSuite.tempDir(s"graft-e29-acc$nFiles")
      EventStreams.streamVisualInto(spark, s"$feed/*.parquet", evalIdx, donors,
        acc, evalMod = 15, tau = 3, maxFilesPerTrigger = Some(1))
      val nBatches = new java.io.File(acc).listFiles().count(_.getName.startsWith("batch_"))
      assert(nBatches == nFiles, s"expected $nFiles micro-batches, got $nBatches")
      spark.read.parquet(s"$acc/batch_*").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    val one = run(1)
    val four = run(4)
    assert(one == four, "micro-batch cadence leaked into the screen")
    // the streamed union IS the one-shot corpus pass (what the gate's
    // oracle replays)
    val batch = Multimodal.visualDecontam(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(one == batch, "streamed upkeep diverged from the batch screen")
    // the m28 plant is visible through the stream too
    assert(one.contains(18L), s"plant missing from streamed screen: ${one.keySet}")
  }

  test("drive hygiene: checkpoints are cleaned up; sentinel stages are cached per JVM") {
    // the r12 floor work routes drive checkpoints + staged fixtures at the
    // fast tmp root (tmpfs when present) — this pins the two contracts that
    // keep a 289-query bench from leaking RAM-backed files: (1) every
    // drive DELETES its per-run checkpoint dir, (2) the staged sentinel
    // fixture is built once per (dir, sentinelTypes) and REUSED, so
    // repeated drives add zero staging
    def fastTmp = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) shm else new java.io.File(System.getProperty("java.io.tmpdir"))
    }
    def count(prefix: String): Int =
      Option(fastTmp.listFiles()).map(_.count(_.getName.startsWith(prefix))).getOrElse(0)
    val ck0 = count("graft-ckpt")
    EventStreams.sessionWindowOnce(spark, dir).collect() // stages on first touch
    val ck1 = count("graft-ckpt"); val st1 = count("graft-stage")
    EventStreams.sessionWindowOnce(spark, dir).collect() // must reuse the stage
    val ck2 = count("graft-ckpt"); val st2 = count("graft-stage")
    assert(ck1 == ck0 && ck2 == ck0,
      s"drive leaked checkpoint dirs: before=$ck0 after=$ck1/$ck2")
    assert(st2 == st1, s"second drive re-staged the fixture: $st1 -> $st2")
  }
}
