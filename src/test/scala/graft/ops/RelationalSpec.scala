package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Relational-surface checks beyond the DuckDB oracle (which covers value
  * parity): properties the oracle can't express. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within HLL++ error bounds of exact") {
    val rows = Relational.q17_approx_distinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: exact=0")
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx strayed past 10% of exact=${r.getLong(1)}")
    }
  }

  test("q51 equi-depth histogram: contiguous buckets, conserved mass, ties never split") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q51_stats_histogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val cents = Tables.t(spark, dir, "lineitem")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val b = 8
    assert(rows.map(_._1).toSeq == (1L to b).toSeq, "bucket ids dense 1..B")
    assert(rows.map(_._2).sum == cents.length.toLong, "row mass conserved")
    assert(rows.map(_._5).sum == cents.distinct.length.toLong, "ndv conserved")
    // contiguity and no value split: hi(i) < lo(i+1)
    rows.sliding(2).foreach {
      case Array(a, c) => assert(a._4 < c._3, s"buckets ${a._1}/${c._1} overlap")
      case _ =>
    }
    rows.foreach { case (i, n, lo, hi, ndv) =>
      assert(lo <= hi && ndv >= 1 && n >= ndv, s"bucket $i shape")
      val inRange = cents.count(v => v >= lo && v <= hi).toLong
      assert(inRange == n, s"bucket $i count vs value range")
    }
    // equi-depth within one value's multiplicity: each bucket's START obeys
    // the integer rule, so depth drift is bounded by the largest tie group
    val maxTie = cents.groupBy(identity).values.map(_.length).max.toLong
    val ideal = cents.length.toLong / b
    rows.foreach { case (i, n, _, _, _) =>
      assert(n <= ideal + maxTie + b, s"bucket $i too deep: $n vs ideal $ideal")
    }
  }

  test("q50 attribution equals a driver fill-forward walk; purchases fully partitioned") {
    import org.apache.spark.sql.functions._
    val got = Relational.q50_attribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val touch = Set("click", "view", "signup")
    val want = scala.collection.mutable.Map.empty[String, (Long, BigDecimal)]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var lt: Option[(Long, String)] = None
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        if (r._4 == "purchase") {
          val ch = lt match {
            case Some((tts, c)) if tts >= r._2 - 72L * 3600 * 1000000 => c
            case _ => "unattributed"
          }
          val (n, v) = want.getOrElse(ch, (0L, BigDecimal(0)))
          want(ch) = (n + 1,
            v + BigDecimal(r._5).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }
        if (touch(r._4)) lt = Some((r._2, r._4))
      }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (ch, (n, rev)) =>
      assert(got(ch)._1 == n, s"$ch count")
      assert(math.abs(got(ch)._2 -
        rev.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$ch revenue")
    }
    assert(got.values.map(_._1).sum == ev.count(_._4 == "purchase"),
      "every purchase attributed to exactly one channel")
  }

  test("q41 time-weighted average equals a driver interval walk; differs from plain avg") {
    import org.apache.spark.sql.functions._
    val got = Relational.q41_time_weighted(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value").cast("double"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val want = scala.collection.mutable.Map.empty[String, (Long, Long, BigDecimal)]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val s = rows.sortBy(r => (r._5, r._2))
      s.sliding(2).foreach {
        case Array(a, b) =>
          val durS = (b._5 - a._5) / 1000000L
          val term = BigDecimal(a._4).setScale(4, BigDecimal.RoundingMode.HALF_UP) * durS
          val (n, t, ws) = want.getOrElse(a._3, (0L, 0L, BigDecimal(0)))
          want(a._3) = (n + 1, t + durS, ws + term)
        case _ =>
      }
    }
    want.foreach { case (et, (n, total, ws)) =>
      val (gn, gt, gavg) = got(et)
      assert(gn == n && gt == total, s"$et intervals/duration")
      assert(math.abs(gavg - (ws / total).toDouble) < 1e-3, s"$et tw_avg")
    }
    assert(got.keySet == want.keySet)
  }

  test("q40 MAD outliers: robust to contamination a mean/std rule is not") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q40_mad_outliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, n, med, mad, nOut) =>
      assert(mad > 0 && med > 0, s"$flag degenerate fit")
      assert(nOut < n / 10, s"$flag: an outlier rule flagging >10% is a broken rule")
      // driver recheck on one group
      val xs = Tables.t(spark, dir, "lineitem")
        .filter(col("l_returnflag") === flag)
        .select(col("l_extendedprice").cast("double")).collect().map(_.getDouble(0)).sorted
      def q50(a: Array[Double]) = {
        val h = (a.length - 1) * 0.5
        val lo = a(h.toInt); val hi = a(math.ceil(h).toInt)
        lo + (hi - lo) * (h - h.toInt)
      }
      val m = q50(xs)
      val madW = q50(xs.map(x => math.abs(x - m)).sorted)
      assert(math.abs(med - math.rint(m * 10000) / 10000) < 1e-6, s"$flag median")
      assert(math.abs(mad - math.rint(madW * 10000) / 10000) < 1e-6, s"$flag mad")
      assert(nOut == xs.count(x => math.abs(x - m) * 0.6745 > madW * 3.5), s"$flag outliers")
    }
  }

  test("q39 pivot→unpivot round-trips the sparse long form exactly") {
    import org.apache.spark.sql.functions._
    val got = Relational.q39_unpivot(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Tables.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.values.sum == Tables.t(spark, dir, "orders").count())
  }

  test("q38 observed metrics equal a dedicated aggregation pass") {
    import org.apache.spark.sql.functions._
    val got = Relational.q38_observe(spark, dir).head()
    val want = Tables.t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double"), 3).as("q"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("d"))
      .head()
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getDouble(1) == want.getDouble(1))
    assert(got.getLong(2) == want.getLong(2))
    assert(got.getLong(2) > 0 && got.getLong(2) < got.getLong(0), "discriminating counter")
  }

  test("q37 SCD2 intervals tile each user's history with one current row") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q37_scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        Some(r.getLong(4)).filter(_ != Long.MaxValue), r.getBoolean(5)))
    val n = Tables.events(spark, dir).count()
    assert(rows.length == n, "SCD2 must be total over the change log")
    rows.groupBy(_._1).foreach { case (user, hist0) =>
      val hist = hist0.sortBy(h => (h._3, h._2))
      // intervals tile: each row's valid_to is the next row's valid_from
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"user $user gap at ${a._2}")
        case _ =>
      }
      // exactly one open (current) interval per user, and it is the last
      assert(hist.count(_._5) == 1 && hist.last._5, s"user $user current-row invariant")
      assert(hist.last._4.isEmpty)
    }
  }

  test("q35 retention matrix equals a driver-side cohort walk; shares well-formed") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ev.map { case (u, w) => ((cohort(u), w - cohort(u)), u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Relational.q35_retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k @ (cwk, off), (n, size, share)) =>
      assert(n == want(k), k)
      assert(size == want((cwk, 0L)), k)
      assert(share <= 1.0 + 1e-9 || off == 0, k) // off-0 share is exactly 1
      if (off == 0) assert(share == 1.0)
    }
    // many offsets exist (non-degenerate fixture; cohort count is data-driven)
    assert(got.keys.map(_._2).toSet.size > 5)
  }

  test("q34 funnel equals a driver-side per-user stage walk") {
    import org.apache.spark.sql.functions._
    val winUs = 72L * 3600 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      val tv = rows.filter(_._2 == "view").map(_._3).minOption
      val tc = tv.flatMap(t =>
        rows.filter(r => r._2 == "click" && r._3 > t && r._3 <= t + winUs).map(_._3).minOption)
      val tp = tc.flatMap(t =>
        rows.filter(r => r._2 == "purchase" && r._3 > t && r._3 <= t + winUs).map(_._3).minOption)
      if (tv.isDefined) nv += 1
      if (tc.isDefined) nc += 1
      if (tp.isDefined) np += 1
    }
    val r = Relational.q34_funnel(spark, dir).head()
    assert(r.getLong(0) == byUser.size)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nv, nc, np)))
    // the funnel must narrow and be non-degenerate on this fixture
    assert(nv >= nc && nc >= np && np > 0)
  }

  test("q33 merged MV equals the full recompute, and repeats reuse the MV") {
    import org.apache.spark.sql.functions._
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    val full = Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts) DIV 3600").as("hr_idx"), col("event_type"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy("hr_idx", "event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("v")).cast("double"), 3).as("sv"))
      .collect().map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val got1 = Relational.q33_incremental_mv(spark, dir).collect()
    // second call must hit the standing MV (write-once registry), and the
    // maintained view must still equal the from-scratch aggregation
    val got2 = Relational.q33_incremental_mv(spark, dir).collect()
    Seq(got1, got2).foreach { got =>
      assert(got.length == full.size)
      got.foreach(r => assert(full(key(r)) == ((r.getLong(2), r.getDouble(3))), key(r)))
    }
  }

  test("q27 range frame equals a brute-force trailing-hour self-count") {
    import org.apache.spark.sql.functions._
    val out = Relational.q27_range_frame(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.size == ev.length, "frame query must be total over events")
    val byUser = ev.groupBy(_._2)
    ev.foreach { case (id, user, us, _) =>
      val peers = byUser(user).filter(e => e._3 >= us - 3600L * 1000000 && e._3 <= us)
      assert(out(id)._1 == peers.length, s"event $id trailing-hour count")
      assert(math.abs(out(id)._2 - peers.map(_._4).sum) < 1e-2, s"event $id trailing-hour sum")
    }
  }

  test("grouping sets covers exactly the declared sets") {
    val rows = Relational.q16_grouping_sets(spark, dir).collect()
    val statuses = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val prios = rows.count(r => r.isNullAt(0) && !r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(statuses == 3 && prios == 5 && grand == 1)
    // grand total equals the table size
    assert(rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2) == 1500L)
  }

  test("saltedJoin multiset equals the plain equi-join, including hot keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one hot key (700 of 1000 rows) plus a key missing from the build side
    val probe = (1 to 1000).map(i => (if (i <= 700) 1L else i.toLong % 90 + 2L, i))
      .toDF("k", "pv")
    val build = (1L to 60L).map(k => (k, s"b$k")).toDF("k", "bv")
    val got = Skew.saltedJoin(probe, build, "k", buckets = 8)
      .select(col("k"), col("pv"), col("bv"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val want = probe.join(build, Seq("k"))
      .select(col("k"), col("pv"), col("bv"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(got.length == want.length && got.sameElements(want))
    assert(got.count(_._1 == 1L) == 700, "hot key must survive salting intact")
  }

  test("q44 BOM rollup matches a single-threaded recursive climb") {
    import org.apache.spark.sql.functions.col
    val part = Tables.t(spark, dir, "part")
    val rows = Relational.q44_bom_rollup(part).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // reference climb over the collected fixture
    val parts = part.select(col("p_partkey"), col("p_retailprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, BigDecimal)]
    parts.foreach { case (key, price) =>
      var cur = key; var q = 1L; var d = 0L
      while (cur >= 8) { q *= cur % 3 + 1; cur = cur / 8; d += 1 }
      val (n0, d0, q0, c0) = acc.getOrElse(cur, (0L, 0L, 0L, BigDecimal(0)))
      acc(cur) = (n0 + 1, d0 max d, q0 + q,
        c0 + BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) * q)
    }
    assert(rows.keySet == acc.keySet && rows.keySet.forall(_ < 8))
    acc.foreach { case (root, (n, d, q, c)) =>
      val (gn, gd, gq, gc) = rows(root)
      assert((gn, gd, gq) == (n, d, q), s"root $root")
      assert(math.abs(gc - c.toDouble) < 1e-6, s"root $root cost $gc vs $c")
    }
    // roots 1-7 own non-trivial subtrees on this fixture (root 0 is the
    // singleton {0}: no key ≥ 8 divides down to 0 before hitting 1-7)
    assert(rows.filterKeys(_ >= 1).values.forall(_._1 > 1))
    assert(rows.values.exists(_._2 >= 2), "fixture must exercise depth ≥ 2")
  }
}
