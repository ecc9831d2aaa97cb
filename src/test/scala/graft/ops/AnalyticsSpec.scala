package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the most recent order at-or-before each event") {
    val rows = Analytics.asofLastOrder(spark, sf0001)
      .withColumn("ts2", lit(null)) // no-op keeps test shape obvious
      .drop("ts2").collect()
    assert(rows.nonEmpty)

    // cross-check a sample of events against a naive per-row computation
    // (timestamps collected as epoch millis — parquet cols are TIMESTAMP_NTZ)
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .limit(50).collect()
    val orders = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Analytics.asofLastOrder(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    ev.foreach { e =>
      val (eid, uid, ts) = (e.getLong(0), e.getLong(1), e.getLong(2))
      val cand = orders.filter(o => o._1 == uid && o._2 <= ts)
      val expect =
        if (cand.isEmpty) None
        else {
          val maxTs = cand.map(_._2).max
          Some(cand.filter(_._2 == maxTs).map(_._3).max)
        }
      assert(got(eid) === expect, s"event $eid user $uid")
    }
  }

  test("bloom prefilter join is output-identical to the plain join") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val o = graft.Tables.orders(spark, sf0001)
    val plain = li.join(o.filter(col("o_totalprice") > 480000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Analytics.bloomPrefilterJoin(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain)
    assert(got.nonEmpty)
  }

  test("funnel counts agree with a naive per-user replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ms"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)))
    var viewed, clicked, purchased = 0L
    byUser.foreach { case (_, es) =>
      var sv = false; var sc = false; var sp = false
      es.foreach { case (_, _, _, t) =>
        if (t == "view") sv = true
        if (t == "click" && sv) sc = true
        if (t == "purchase" && sc) sp = true
      }
      if (sv) viewed += 1; if (sc) clicked += 1; if (sp) purchased += 1
    }
    val got = Relational.eventsFunnel(spark, sf0001).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((byUser.size.toLong, viewed, clicked, purchased)))
  }

  test("contamination: exact copy of a benchmark doc is flagged, unrelated is clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    val benchText = (0 until 30).map(i => s"b$i").mkString(" ")
    Seq(
      (0L, benchText, "en", "a"),                                  // benchmark (0 % 50 == 0)
      (1L, benchText, "en", "a"),                                  // fully contaminated copy
      (2L, (0 until 30).map(i => s"c${i * 7}x").mkString(" "), "en", "b")) // clean
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got.keySet == Set(1L, 2L)) // benchmark docs excluded from output
    assert(got(1L) == ((28L, 1.0, 1)), s"copy: ${got(1L)}")  // 30 tokens → 28 trigrams
    assert(got(2L) == ((0L, 0.0, 0)), s"clean: ${got(2L)}")
  }

  test("vector-sum Aggregator sums duplicate keys (Vectors.sum semantics)") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      (1L, 10L, 1.5), (1L, 10L, 2.5), (1L, 11L, 1.0),
      (2L, 10L, 4.0)
    ).toDS()
    val vec = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.SparseVectorSum.toColumn.name("vec"))
      .collect().toMap
    assert(vec(1L) === Map(10L -> 4.0, 11L -> 1.0))
    assert(vec(2L) === Map(10L -> 4.0))
  }

  test("band join covers every order exactly once") {
    val n = Analytics.bandJoinPriceTiers(spark, sf0001)
      .agg(sum("n")).collect()(0).getLong(0)
    val total = graft.Tables.orders(spark, sf0001).count()
    assert(n === total)
  }

  test("bounded top-k aggregator reproduces the window top-k exactly, ties to smaller id") {
    val agg = Analytics.topKAgg(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val win = Relational.windowTopNPerCustomer(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(agg.toSeq == win.toSeq)

    // planted ties: equal scores must order by ascending id through trims
    val local = graft.functions.TopK(2)
    val fed = (1L to 100L).foldLeft(local.zero) { (b, i) => local.reduce(b, (5.0, 101L - i)) }
    assert(local.finish(fed) == Seq((5.0, 1L), (5.0, 2L)))

    // plan: two-phase ObjectHashAggregate — the partial (map-side) phase
    // must run BEFORE the exchange, so only ≤k pairs per group shuffle
    val p = Analytics.topKAgg(spark, sf0001).queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, s"not two-phase:\n$p")

    // Spark DESC-order corner semantics: NaN ranks above +Inf, and -0.0
    // ties 0.0 (id tiebreak applies, not sign ordering)
    val nk = graft.functions.TopK(2)
    val withNaN = Seq((1.0, 1L), (Double.NaN, 5L), (2.0, 2L))
      .foldLeft(nk.zero)(nk.reduce)
    val fin = nk.finish(withNaN)
    assert(fin.head._2 == 5L && fin.head._1.isNaN, s"NaN must rank first: $fin")
    assert(fin(1) == ((2.0, 2L)))
    val zeros = Seq((0.0, 9L), (-0.0, 3L)).foldLeft(nk.zero)(nk.reduce)
    assert(nk.finish(zeros).map(_._2) == Seq(3L, 9L), "signed zeros tie → id order")
  }

  test("sliding 30-day revenue matches a naive per-row replay") {
    val rows = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCust = rows.groupBy(_._1)
    val want = rows.map { case (c, o, day, _) =>
      val sum = byCust(c).filter(t => t._3 >= day - 30 && t._3 <= day).map(_._4).sum
      (c, o, day) -> BigDecimal(sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Analytics.slidingRevenue(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.size == want.size)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6, s"$k: got $v want ${want(k)}")
    }
  }

  test("cube includes all four grouping-set shapes") {
    val rows = Analytics.cubeFlags(spark, sf0001).collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).distinct.toSet
    assert(shapes === Set((false, false), (false, true), (true, false), (true, true)))
  }

  test("grouping sets: exactly the three declared shapes, no cube extras") {
    val rows = Analytics.groupingSetsFlags(spark, sf0001).collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).distinct.toSet
    // (flag,status), (flag), () — and NOT cube's fourth (status-only) set
    assert(shapes == Set((false, false), (false, true), (true, true)))
    // grand total row equals the table count
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2))
    assert(total.toSeq == Seq(graft.Tables.lineitem(spark, sf0001).count()))
  }

  test("LOCF fill: gap hours carry the last observed value forward") {
    val got = Relational.eventsLocf(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.nonEmpty)
    // per series: first grid hour is observed (span starts at min observed
    // hour), so locf is never null; every gap hour (n=0) equals the
    // previous hour's locf value
    got.groupBy(_._1).foreach { case (et, rs) =>
      val seq = rs.sortBy(_._2)
      assert(seq.head._4.isDefined, s"$et: leading locf null")
      seq.sliding(2).foreach {
        case Array(prev, cur) if cur._3 == 0L =>
          assert(cur._4 == prev._4, s"$et@${cur._2}: gap not carried (${cur._4} vs ${prev._4})")
        case _ =>
      }
    }
    // and the fixture actually exercises gaps
    assert(got.exists(_._3 == 0L), "no gap hours at this SF — test is vacuous")
  }

  test("attribution: first/last touch match a naive per-user replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val naive = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var first: Option[Long] = None; var last: Option[Long] = None
      sorted.flatMap { case (u, _, id, tp) =>
        if (tp == "purchase") Some((id, (u, first, last)))
        else { if (first.isEmpty) first = Some(id); last = Some(id); None }
      }
    }.toMap
    val got = Relational.eventsAttribution(spark, sf0001).collect()
      .map { r =>
        r.getLong(1) -> ((r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap
    assert(got == naive)
    // and some purchase actually has distinct first/last touches
    assert(got.values.exists(v => v._2 != v._3))
  }

  test("salted join: equal to plain join, hot key spread ~numSalts ways") {
    // planted skew: one key owns ~30% of the fact
    val nFact = 10000
    val fact = spark.range(nFact.toLong)
      .select(col("id"),
        when(pmod(col("id"), lit(10)) < 3, lit(7L))
          .otherwise(pmod(col("id"), lit(100))).as("k"),
        (col("id") * 3 % 97).cast("double").as("v"))
    val dim = spark.range(100).select(col("id").as("dk"),
      concat(lit("g"), pmod(col("id"), lit(5))).as("grp"))
    val k = 16
    val salted = Analytics.saltedEquiJoin(fact, "k", dim, "dk",
      pmod(col("id"), lit(k)), k)
    val plain = fact.join(dim, fact("k") === dim("dk"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getString(4))
    assert(salted.collect().map(key).sortBy(_._1).toSeq ==
      plain.collect().map(key).sortBy(_._1).toSeq)

    // the salted plan must not sneak a broadcast in (that would make the
    // salt moot) — the hint pins shuffle-hash
    val phys = salted.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastHashJoin"), phys.takeWhile(_ != '\n'))

    // shuffle-shape claim: the hot key's biggest (key, salt) cell is
    // ~1/numSalts of its unsalted row count
    val hot = fact.filter(col("k") === 7).count()
    val maxCell = fact
      .withColumn("salt", pmod(col("id"), lit(k)))
      .groupBy("k", "salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(hot >= nFact * 3 / 10)
    assert(maxCell <= hot / k * 2,
      s"hot=$hot spread over $k salts but max cell=$maxCell")
  }

  test("top-k with ties plans a WindowGroupLimit (rank filter pushed below the window)") {
    val df = Analytics.topkWithTies(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — full per-partition sort:\n$plan")
  }

  test("HLL rollup: merged dailies equal the direct weekly sketch, error bounded") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.hllRollup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every weekly estimate inside the declared 3-rsd band (the
    // declared query carries this as the est_in_band boolean)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"week ${r.getString(0)}: estimate out of the 3-rsd band")
    }
    // register-max union is associative: merging per-day sketches must
    // give the SAME estimate as sketching the whole week directly
    val ev = graft.Tables.events(spark, sf0001).select(
      date_trunc("week", col("ts")).as("week"),
      date_trunc("day", col("ts")).as("day"), col("user_id"))
    val merged = ev.groupBy("week", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("week")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val direct = ev.groupBy("week")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(merged == direct, "sketch merge is not lossless vs direct sketch")
  }

  test("quantile sketch: estimates within the log-linear error bound; merge = direct") {
    // exact weekly ORDER STATISTICS (the sketch's target is the
    // ceil(q·n)-th smallest value — `percentile()` interpolates between
    // order stats and can exceed the containing bucket's upper edge)
    val byWeek = graft.Tables.events(spark, sf0001)
      .filter(expr("cast(round(value * 100) as bigint)") > 0)
      .select(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (w, rs) => w -> rs.map(_.getDouble(1)).sorted }
    def orderStat(vs: Array[Double], q: Double): Double =
      vs(math.ceil(q * vs.length).toInt - 1)
    val exact = byWeek.map { case (w, vs) =>
      w -> (orderStat(vs, 0.5), orderStat(vs, 0.95), orderStat(vs, 0.99)) }
    val est = Analytics.quantileSketchRollup(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(est.keySet == exact.keySet)
    // upper-edge estimate of a log-linear bucket: est >= true and
    // est/true <= (1 + 1/16) + cents slack
    for ((w, (e50, e95, e99)) <- est; (t50, t95, t99) = exact(w)) {
      for ((e, t, nm) <- Seq((e50, t50, "p50"), (e95, t95, "p95"), (e99, t99, "p99"))) {
        assert(e >= t - 1e-9, s"$w $nm: estimate $e below exact $t")
        assert(e / t <= 1.0 + 1.0 / 16 + 0.01,
          s"$w $nm: estimate $e breaches the error bound vs exact $t")
      }
    }
    // merging daily sketches loses nothing vs sketching the week directly
    val daily = Analytics.quantileSketchDaily(spark, sf0001)
    val merged = daily.groupBy("week", "bin_id")
      .agg(sum("cnt").as("cnt")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val direct = graft.Tables.events(spark, sf0001).select(
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .filter(col("c") > 0)
      .withColumn("e", (length(bin(col("c"))) - 1).cast("int"))
      .withColumn("p2", expr("shiftleft(cast(1 as bigint), e)"))
      .withColumn("bin_id",
        col("e") * 16 + expr("cast(((c - p2) * 16) div p2 as int)"))
      .groupBy("week", "bin_id").agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == direct, "summed daily buckets != direct weekly buckets")
  }

  test("bitmap distinct cube: merged daily pages give the EXACT weekly distinct") {
    import org.apache.spark.sql.functions._
    val got = Analytics.bitmapDistinctRollup(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sf0001)
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, "bitmap OR-merge lost or invented distinct ids")
  }

  test("association rules: identities hold and supports are exact") {
    import org.apache.spark.sql.functions._
    val rules = Analytics.assocRules(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
    assert(rules.nonEmpty, "fixture should produce rules at minPair=3")
    val byPair = rules.toMap
    rules.foreach { case ((a, c), (pn, an, cn, conf, lift)) =>
      assert(pn >= 3)
      // confidence is exactly pair/ante (same rounding)
      assert(conf == BigDecimal(pn.toDouble / an)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // the mirrored rule exists with identical pair support and lift
      val (pn2, an2, cn2, _, lift2) = byPair((c, a))
      assert(pn2 == pn && an2 == cn && cn2 == an && lift2 == lift)
    }
    // spot-check one pair's supports against direct counts
    val ((a, c), (pn, an, _, _, _)) = rules.head
    val op = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val exactPair = op.filter(col("pk") === a).select("ok")
      .intersect(op.filter(col("pk") === c).select("ok")).count()
    val exactAnte = op.filter(col("pk") === a).count()
    assert(pn == exactPair && an == exactAnte)
  }

  test("weighted percentiles: each value is the exact cumulative-weight crossing") {
    val got = Analytics.weightedPercentiles(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(25, 50, 75, 90))
    // independent replay: exact integer weights and cents
    val rows = graft.Tables.lineitem(spark, sf0001)
      .select(round(round(col("l_extendedprice"), 2) * 100, 0).cast("long").as("c"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val wTot = rows.map(_._2).sum
    got.foreach { case (q, v) =>
      val below = rows.filter(_._1 < v).map(_._2).sum
      val upto = rows.filter(_._1 <= v).map(_._2).sum
      assert(upto * 100 >= q * wTot, s"p$q=$v does not reach the crossing")
      assert(below * 100 < q * wTot, s"p$q=$v overshoots the crossing")
    }
    // monotone in q
    assert(got(25) <= got(50) && got(50) <= got(75) && got(75) <= got(90))
  }
}
