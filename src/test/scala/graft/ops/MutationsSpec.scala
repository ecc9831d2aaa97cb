package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert: source wins on match, inserts survive, rest pass through") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    val source = Seq((2L, "B", 200.0), (9L, "new", 90.0))
      .toDF("k", "status", "price")
    val got = Mutations.mergeUpsert(target, source, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "B", 200.0),  // updated
      (3L, "c", 30.0),   // untouched
      (9L, "new", 90.0)  // inserted
    ))
  }

  test("mergeUpsert plan: single join, no driver-side diffing") {
    val merged = Mutations.ordersUpsert(spark, sf0001)
    val p = merged.queryExecution.executedPlan.toString
    assert("Join|HashJoin".r.findAllIn(p).nonEmpty)
    assert(!p.contains("CartesianProduct"), s"cartesian in upsert plan:\n$p")
  }

  test("scd2: planted status runs collapse to change-point intervals") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // customer 7: O,O,F,F,O — three change points; customer 8: single run
    val orders = Seq(
      (101L, 7L, "O", 1.0, ts(1), "1-URGENT"),
      (102L, 7L, "O", 1.0, ts(2), "1-URGENT"),
      (103L, 7L, "F", 1.0, ts(3), "1-URGENT"),
      (104L, 7L, "F", 1.0, ts(4), "1-URGENT"),
      (105L, 7L, "O", 1.0, ts(5), "1-URGENT"),
      (201L, 8L, "P", 1.0, ts(2), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = Mutations.scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    assert(got.toSeq == Seq(
      (7L, 1, "O", ts(1), Some(ts(3))),
      (7L, 2, "F", ts(3), Some(ts(5))),
      (7L, 3, "O", ts(5), None),
      (8L, 1, "P", ts(2), None)))
  }

  test("scd2: one exchange — change filter and interval windows share it") {
    val p = Mutations.scd2History(spark, sf0001).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("snapshot diff classifies exactly the planted modular changes") {
    val keys = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey").collect().map(_.getLong(0))
    def expectType(k: Long): Option[String] =
      if (k % 7 == 0 && k % 11 != 0) Some("insert")
      else if (k % 11 == 0 && k % 7 != 0) Some("delete")
      else if (k % 7 != 0 && k % 11 != 0 && k % 5 == 0) Some("update")
      else None // unchanged or absent from both snapshots
    val want = keys.flatMap(k => expectType(k).map(k -> _)).toMap
    val got = Mutations.snapshotDiff(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    // update rows really carry the +10.0 bump
    val upd = Mutations.snapshotDiff(spark, sf0001)
      .filter(col("change_type") === "update")
      .select((col("new_price") - col("old_price")).as("d")).collect()
    assert(upd.nonEmpty && upd.forall(_.getDouble(0) == 10.0))
  }

  test("erasure cascade: audit counts consistent and the cascade is referentially closed") {
    val rows = Mutations.erasurePropagation(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.values.foreach { case (before, deleted, after) =>
      assert(after == before - deleted && deleted > 0)
    }
    // the semantics, independently: no surviving order references a
    // deleted customer, no surviving lineitem references a deleted order
    val c = graft.Tables.customer(spark, sf0001)
    val o = graft.Tables.orders(spark, sf0001)
    val li = graft.Tables.lineitem(spark, sf0001)
    val del = c.filter(pmod(col("c_custkey"), lit(37)) === 0)
      .select(col("c_custkey").as("k"))
    val survO = o.join(del, col("o_custkey") === col("k"), "left_anti")
    assert(survO.join(del, col("o_custkey") === col("k"), "left_semi").count() == 0)
    val delOrders = o.join(del, col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey").as("ok"))
    val survLi = li.join(delOrders, col("l_orderkey") === col("ok"), "left_anti")
    assert(survLi.join(delOrders, col("l_orderkey") === col("ok"), "left_semi")
      .count() == 0)
    // and the audit's deleted counts equal the survivors' complement
    assert(rows("orders")._3 == survO.count())
    assert(rows("lineitem")._3 == survLi.count())
  }

  test("multi-table snapshot: every retained version of the PAIR is internally consistent") {
    import org.apache.spark.sql.functions._
    Mutations.multiTableSnapshot(spark, sf0001).collect()
    val root = graft.Tables.scratchDir("graft_up9_txn", sf0001)
    val counts = (0 to 1).map { back =>
      val v = graft.sources.Sources.resolveVersion(spark, root, back)
      val po = spark.read.parquet(s"$v/orders")
      val pl = spark.read.parquet(s"$v/lineitem")
      // no lineitem without its order in the SAME version — a torn
      // (cross-version) read would fail exactly this
      val orphans = pl.join(po, col("l_orderkey") === col("o_orderkey"),
        "left_anti").count()
      assert(orphans == 0, s"version back=$back is a torn pair")
      (po.count(), pl.count())
    }
    // the two retained versions really are different table states
    assert(counts(0)._1 > counts(1)._1 && counts(0)._2 > counts(1)._2)
  }

  test("up10 forget: untouched partitions byte-identical, users gone, re-run is a no-op") {
    import org.apache.spark.sql.functions._
    def listing(p: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
    }
    val dir = Mutations.forgetStoreDir(spark, sf0001)
    val pre = listing(dir)
    val untouchedDays = graft.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("user_id") % 101 === 7, 1L).otherwise(0L)).as("nf"))
      .filter(col("nf") === 0).select("day").collect()
      .map(_.getDate(0).toString).toSet
    assert(untouchedDays.nonEmpty, "fixture has no untouched day to pin")
    val touched = Mutations.forgetRestate(spark, dir)
    assert(touched > 0, "the forget rule matched nothing")
    val post = listing(dir)
    // every file in an untouched day partition survived byte-identically
    val preUntouched = pre.filter { case (path, _) =>
      untouchedDays.exists(day => path.contains(s"day=$day")) }
    preUntouched.foreach { case (path, meta) =>
      assert(post.get(path).contains(meta), s"untouched partition mutated: $path")
    }
    // the forgotten users are physically gone
    assert(spark.read.parquet(dir)
      .filter(col("user_id") % 101 === 7).count() == 0)
    // idempotence: deriving touched days from the STORE means a second
    // run finds nothing, restates nothing, and every file is untouched
    assert(Mutations.forgetRestate(spark, dir) == 0)
    assert(listing(dir) == post, "re-run rewrote files")
  }

  test("up10 forget: a day whose EVERY row is forgotten is physically removed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Plant a store where day 2024-01-01 contains ONLY forgettable users
    // (user_id % 101 == 7): dynamic overwrite alone would never rewrite it
    // because the remainder has no row for that day.
    val dir = graft.Tables.scratchDir("graft_up10_allforgot", sf0001)
    val rows = Seq(
      (1L, 7L, "view", 1.0, "2024-01-01"),    // 7 % 101 == 7
      (2L, 108L, "view", 2.0, "2024-01-01"),  // 108 % 101 == 7
      (3L, 5L, "click", 3.0, "2024-01-02"),   // kept
      (4L, 7L, "view", 4.0, "2024-01-02")     // forgotten, day survives
    ).toDF("event_id", "user_id", "event_type", "value", "d")
      .withColumn("day", to_date(col("d"))).drop("d")
    rows.write.partitionBy("day").mode("overwrite").parquet(dir)
    assert(Mutations.forgetRestate(spark, dir) == 2)
    val post = spark.read.parquet(dir)
    assert(post.filter(col("user_id") % 101 === 7).count() == 0,
      "forgotten rows survived in a fully-forgotten partition")
    assert(post.select("day").distinct().as[java.sql.Date].collect()
      .map(_.toString).toSet == Set("2024-01-02"))
    assert(!new java.io.File(dir.stripPrefix("file:"), "day=2024-01-01").exists,
      "emptied day partition dir not removed")
    // idempotent: nothing left to forget
    assert(Mutations.forgetRestate(spark, dir) == 0)
  }

  test("up11 compaction: fragmented days → 1 file, untouched days byte-identical, re-run no-op") {
    import org.apache.spark.sql.functions._
    def listing(p: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
    }
    def filesPerDay(p: String): Map[String, Int] =
      listing(p).keys.toSeq
        .flatMap(_.split('/').find(_.startsWith("day=")).map(_.stripPrefix("day=")))
        .groupBy(identity).view.mapValues(_.size).toMap
    val dir = Mutations.compactStoreDir(spark, sf0001)
    val before = filesPerDay(dir)
    val preListing = listing(dir)
    val nBefore = spark.read.parquet(dir).count()
    val frag = before.filter(_._2 > 1)
    val untouched = before.keySet -- frag.keySet
    assert(frag.nonEmpty, "fixture produced no fragmented day")
    assert(untouched.nonEmpty, "fixture produced no already-compact day")
    val rewrote = Mutations.compactRun(spark, dir)
    assert(rewrote == frag, "compactor rewrote a different day set than the fragmented one")
    val after = filesPerDay(dir)
    // every fragmented day collapsed to exactly one file; the rest untouched
    frag.keys.foreach(day => assert(after(day) == 1, s"$day still has ${after(day)} files"))
    val postListing = listing(dir)
    preListing.filter { case (p, _) => untouched.exists(day => p.contains(s"day=$day")) }
      .foreach { case (p, meta) =>
        assert(postListing.get(p).contains(meta), s"untouched partition mutated: $p")
      }
    // no row lost or duplicated by the rewrite
    assert(spark.read.parquet(dir).count() == nBefore)
    // idempotent: a second pass finds nothing above target and writes nothing
    assert(Mutations.compactRun(spark, dir).isEmpty)
    assert(listing(dir) == postListing, "no-op re-run rewrote files")
  }

  test("up12 occ: disjoint writer rebases, overlapping writer re-stages; serial result") {
    val (dir, ra, rb1, rb2) = Mutations.occScenario(spark, sf0001)
    // A committed first from v0: clean single-attempt commit
    assert(ra == Mutations.OccResult(1, 1, 1, rebased = false), s"A: $ra")
    // B1 was disjoint from A: REBASED through v1 without re-staging
    assert(rb1 == Mutations.OccResult(2, 1, 1, rebased = true), s"B1: $rb1")
    // B2 staged from v0 before A committed, overlaps A: forced re-stage
    assert(rb2.version == 3 && rb2.stagings == 2 && !rb2.rebased, s"B2: $rb2")
    // the log serialized exactly v0..v3
    val log = new java.io.File(s"$dir/_log").listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted
    assert(log.toSeq == Seq("v0.txt", "v1.txt", "v2.txt", "v3.txt"))
    // final store == serial application of the three updates to the base
    val base = graft.Tables.events(spark, sf0001)
      .select(col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("base_cents"),
        dayofmonth(to_date(col("ts"))).as("dom"))
    val expected = base.select(col("event_id"),
      (col("base_cents")
        + when(col("dom") % 2 === 1, 7L).otherwise(100L)
        + when(col("dom") % 3 === 0, 13L).otherwise(0L)).as("cents"))
    val got = spark.read.parquet(dir).select("event_id", "cents")
    assert(got.join(expected, Seq("event_id", "cents"), "left_anti").count() == 0
      && got.count() == expected.count(),
      "final store diverges from serial application — a lost update")
  }

  test("up13 time travel: files are immutable, COW touches one day, snapshots are metadata") {
    val dir = Mutations.ttStore(spark, sf0001)
    def statOf(rel: String) = {
      val f = new java.io.File(s"$dir/$rel")
      (f.exists(), f.length())
    }
    val live0 = Mutations.ttLiveFiles(spark, dir, 0)
    val live3 = Mutations.ttLiveFiles(spark, dir, 3)
    assert(live0.nonEmpty && live3.nonEmpty)
    // IMMUTABILITY: every v0 file still exists, byte-identical length,
    // even the ones v2/v3 logically REMOVED — history is metadata, the
    // rewrites never touched old bytes
    val stats0 = live0.map(f => f -> statOf(f)).toMap
    live0.foreach { f =>
      assert(stats0(f)._1, s"v0 file vanished: $f")
    }
    val removed = live0.toSet -- live3.toSet
    assert(removed.nonEmpty, "COW commits removed nothing — scenario broken")
    removed.foreach { f =>
      assert(statOf(f) == stats0(f), s"removed file mutated on disk: $f")
    }
    // COW LOCALITY: v2 swapped files of exactly ONE day directory, v3 of
    // exactly one OTHER day
    val live1 = Mutations.ttLiveFiles(spark, dir, 1)
    val live2 = Mutations.ttLiveFiles(spark, dir, 2)
    def days(fs: Set[String]) = fs.map(_.takeWhile(_ != '/'))
    val v2Touched = days((live1.toSet -- live2.toSet) ++ (live2.toSet -- live1.toSet))
    val v3Touched = days((live2.toSet -- live3.toSet) ++ (live3.toSet -- live2.toSet))
    assert(v2Touched.size == 1, s"v2 touched $v2Touched")
    assert(v3Touched.size == 1 && v3Touched != v2Touched, s"v3 touched $v3Touched")
    // the append (v1) removed nothing and is PURE metadata over new files
    assert(live0.toSet.subsetOf(live1.toSet) && live1.size > live0.size)
    // the head snapshot equals the logical serial state: base + append,
    // +9 cents on the v2 day, clicks deleted on the v3 day
    val got = Mutations.ttAsOf(spark, dir, 3)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val d0 = v2Touched.head.stripPrefix("day=")
    val d1 = v3Touched.head.stripPrefix("day=")
    val base = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_id"))
    val logical = base.unionByName(base.filter(col("event_id") % 7 === 0))
      .withColumn("cents",
        when(col("day") === d0, col("cents") + 9L).otherwise(col("cents")))
      .filter(!(col("event_type") === "click" && col("day") === d1))
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == logical.toSeq,
      "head snapshot diverges from the serial logical state")
  }

  test("up14 vacuum: deletes exactly the unretained files; retained snapshots intact; pre-horizon AS OF dies") {
    val dir = Mutations.ttStore(spark, sf0001)
    val live2 = Mutations.ttLiveFiles(spark, dir, 2).toSet
    val live3 = Mutations.ttLiveFiles(spark, dir, 3).toSet
    val live0 = Mutations.ttLiveFiles(spark, dir, 0).toSet
    val retained = live2 ++ live3
    // retained snapshot contents BEFORE vacuum
    val pre2 = Mutations.ttAsOf(spark, dir, 2)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val (before, after, removed) = Mutations.ttVacuum(spark, dir, keep = 2)
    assert(before == after + removed && removed > 0,
      s"vacuum accounting broken: $before/$after/$removed")
    // exactly the unretained files are gone; every retained file remains
    retained.foreach { f =>
      assert(new java.io.File(s"$dir/$f").exists(), s"vacuum ate a retained file: $f")
    }
    val doomed = live0 -- retained
    assert(doomed.nonEmpty)
    doomed.foreach { f =>
      assert(!new java.io.File(s"$dir/$f").exists(), s"unretained file survived: $f")
    }
    assert(after == retained.size, s"disk ($after) != retained set (${retained.size})")
    // retained snapshots answer identically post-vacuum
    val post2 = Mutations.ttAsOf(spark, dir, 2)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(post2.toSeq == pre2.toSeq, "retained snapshot changed under vacuum")
    // a pre-horizon read must FAIL LOUDLY, never silently return less
    val err = intercept[Exception] {
      Mutations.ttAsOf(spark, dir, 0).count()
    }
    assert(err != null)
    // idempotent: a second vacuum removes nothing
    val (_, after2, removed2) = Mutations.ttVacuum(spark, dir, keep = 2)
    assert(removed2 == 0 && after2 == after, "vacuum re-run not a no-op")
  }

  test("up15 cdf: reads only net-changed files; COW copies cancel; delete commit emits no inserts") {
    val dir = Mutations.ttStore(spark, sf0001)
    val live3 = Mutations.ttLiveFiles(spark, dir, 3).toSet
    // the 1→3 range spans a COW update AND a COW delete
    val (addedF, removedF) = Mutations.ttChangedFiles(spark, dir, 1, 3)
    assert(addedF.nonEmpty && removedF.nonEmpty)
    val changes = Mutations.ttChanges(spark, dir, 1, 3)
    // CDF cost ∝ churn: the plan reads ONLY the net-changed files,
    // a strict subset of the head's live set — never the store
    val planned = changes.inputFiles.map(f =>
      f.stripPrefix("file:").replaceAll("^/+", "/")).toSet
    val allowed = (addedF ++ removedF).map(f =>
      new java.io.File(s"$dir/$f").getAbsolutePath).toSet
    assert(planned.nonEmpty && planned.subsetOf(allowed),
      s"CDF read outside the changed set: ${planned -- allowed}")
    assert(allowed.size < live3.size + removedF.size,
      "changed set is not smaller than the store — scenario degenerate")
    // v2→v3 is a pure delete: the feed must contain NO insert rows
    val del = Mutations.ttChanges(spark, dir, 2, 3)
    assert(del.filter(col("_change_type") === "insert").count() == 0,
      "COW-copied rows leaked into the insert feed")
    assert(del.filter(col("_change_type") === "delete")
      .filter(col("event_type") =!= "click").count() == 0,
      "delete feed contains non-deleted rows")
    // applying the 1→3 feed to snapshot v1 reproduces snapshot v3 exactly
    val v1 = Mutations.ttAsOf(spark, dir, 1)
    val ins = changes.filter(col("_change_type") === "insert").drop("_change_type")
    val dels = changes.filter(col("_change_type") === "delete").drop("_change_type")
    val replayed = v1.unionByName(ins).exceptAll(dels)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val head = Mutations.ttAsOf(spark, dir, 3)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(replayed.toSeq == head.toSeq,
      "v1 + CDF(1→3) does not reproduce the v3 snapshot")
  }

  test("up16: delete-bearing maintenance equals full recompute without re-reading the store") {
    val dir = Mutations.ttStore(spark, sf0001)
    val v1Partials = Mutations.ttAsOf(spark, dir, 1).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .localCheckpoint(true) // freeze: the maintained side must not rescan v1
    val maintained = Mutations
      .maintainPartialsViaCdf(spark, dir, v1Partials, from = 1, to = 3)
    // the maintenance pass reads only the changed files (plus nothing:
    // partials are checkpointed), never the full store
    val (addedF, removedF) = Mutations.ttChangedFiles(spark, dir, 1, 3)
    val allowed = (addedF ++ removedF).map(f =>
      new java.io.File(s"$dir/$f").getAbsolutePath).toSet
    val planned = maintained.inputFiles.map(f =>
      f.stripPrefix("file:").replaceAll("^/+", "/")).toSet
    assert(planned.nonEmpty && planned.subsetOf(allowed),
      s"maintenance read outside the CDF set: ${planned -- allowed}")
    val got = maintained.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val full = Mutations.ttAsOf(spark, dir, 3).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == full.toSeq,
      "CDF-maintained partials diverge from the full v3 recompute")
  }

  test("up18 merge into: touched days only, CDF shows exactly the upsert, pre-merge snapshot intact") {
    val dir = Mutations.ttMergedStore(spark, sf0001)
    val ev = graft.Tables.events(spark, sf0001)
    val dayCut = ev.agg(date_format(
      date_add(min(to_date(col("ts"))), 2), "yyyy-MM-dd")).head.getString(0)
    val nUpd = ev.filter(col("event_id") % 13 === 0 &&
      date_format(col("ts"), "yyyy-MM-dd") <= dayCut).count()
    val nIns = ev.filter(col("event_id") % 17 === 0 &&
      date_format(col("ts"), "yyyy-MM-dd") <= dayCut).count()
    assert(nUpd > 0 && nIns > 0, "merge scenario degenerate")
    // COW locality: only the windowed days' files were replaced
    val (addedF, removedF) = Mutations.ttChangedFiles(spark, dir, 3, 4)
    val windowDays = (0 to 2).map(i => ev.agg(date_format(
      date_add(min(to_date(col("ts"))), i), "yyyy-MM-dd")).head.getString(0))
    (addedF ++ removedF).foreach(f =>
      assert(windowDays.exists(day => f.contains(s"day=$day/")),
        s"merge touched a file outside its day window: $f"))
    // row-level effect through the CDF: deletes = the replaced
    // pre-images (update arm only), inserts = post-images + new keys
    val ch = Mutations.ttChanges(spark, dir, 3, 4)
    assert(ch.filter(col("_change_type") === "delete").count() == nUpd,
      "CDF delete side is not exactly the replaced pre-images")
    assert(ch.filter(col("_change_type") === "insert").count() == nUpd + nIns,
      "CDF insert side is not exactly the merge's output rows")
    // updated keys carry the re-priced cents; inserted keys are the
    // +3e9 key space
    val ins = ch.filter(col("_change_type") === "insert")
    assert(ins.filter(col("event_id") >= 3000000000L).count() == nIns)
    // the pre-merge snapshot still answers (old files survive as v3)
    val v3n = Mutations.ttAsOf(spark, dir, 3).count()
    val v4n = Mutations.ttAsOf(spark, dir, 4).count()
    assert(v4n == v3n + nIns, s"head count $v4n != v3 $v3n + inserts $nIns")
  }

  test("up19 checkpoint: bounded resolution, idempotent re-write, equals full replay") {
    val dir = Mutations.ttManyCommitStore(spark, sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(s"$dir/_log")
    def ckptNames = fs.listStatus(log).map(_.getPath.getName)
      .filter(_.startsWith("ckpt-")).sorted.toSeq
    // interval-4 cadence over 10 commits → checkpoints at v4 and v8,
    // written as PARQUET manifests (Delta's checkpoint.parquet shape)
    assert(ckptNames == Seq("ckpt-v4.parquet", "ckpt-v8.parquet"),
      ckptNames.toString)
    // BOUNDED RESOLUTION: head (v9) reads ckpt8 + v9 — never the v0 replay
    val (headLive, headOpened) = Mutations.ttLiveFilesCounted(spark, dir, 9)
    assert(headOpened == 2, s"head resolution opened $headOpened log files")
    assert(headOpened <= 1 + Mutations.ttCheckpointInterval)
    // mid-interval (v6): ckpt4 + v5 + v6
    val (_, midOpened) = Mutations.ttLiveFilesCounted(spark, dir, 6)
    assert(midOpened == 3, s"v6 resolution opened $midOpened log files")
    // pre-checkpoint (v3): plain replay of v0..v3
    val (_, preOpened) = Mutations.ttLiveFilesCounted(spark, dir, 3)
    assert(preOpened == 4)
    // IDEMPOTENT RE-WRITE: bytes unchanged by a second call
    def bytes(n: String): Seq[Byte] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(log, n))
      val buf = new java.io.ByteArrayOutputStream()
      try {
        val b = new Array[Byte](8192)
        var r = in.read(b)
        while (r >= 0) { buf.write(b, 0, r); r = in.read(b) }
      } finally in.close()
      buf.toByteArray.toSeq
    }
    val before = bytes("ckpt-v8.parquet")
    Mutations.ttWriteCheckpoint(spark, dir, 8)
    assert(bytes("ckpt-v8.parquet") == before,
      "checkpoint re-write changed bytes")
    // CHECKPOINTED ≡ FULL REPLAY: drop the manifests, resolve again
    ckptNames.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(log, n), false))
    val (replayLive, replayOpened) = Mutations.ttLiveFilesCounted(spark, dir, 9)
    assert(replayOpened == 10, s"un-checkpointed replay opened $replayOpened")
    assert(replayLive == headLive,
      "checkpoint-seeded live set diverges from the full replay")
    // re-checkpointing reproduces the identical live set + stats (the
    // parquet bytes may differ across writes — footer metadata — so the
    // idempotence pin above covers the no-rewrite case, and this one
    // covers content equality after a genuine re-write)
    Mutations.ttWriteCheckpoint(spark, dir, 8)
    val (reLive, reStats, _) = Mutations.ttLiveEntriesCounted(spark, dir, 8)
    Mutations.ttWriteCheckpoint(spark, dir, 8) // and it stays put
    val (reLive2, reStats2, _) = Mutations.ttLiveEntriesCounted(spark, dir, 8)
    assert(reLive == reLive2 && reStats == reStats2)
  }

  test("up20 deletion vectors: no data file touched, CDF sees the delete, compaction is CDF-invisible") {
    val dir = Mutations.ttStore(spark, sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileIds(): Map[String, (Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toUri.getPath
        if (p.endsWith(".parquet") && !p.contains("/_log/"))
          out(p) = (f.getLen, f.getModificationTime)
      }
      out.toMap
    }
    val v3 = Mutations.ttAsOf(spark, dir, 3)
    val v3n = v3.count()
    val doomed = v3.filter(pmod(col("event_id"), lit(23)) === 0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(doomed.nonEmpty, "DV scenario degenerate: nothing to delete")
    val preFiles = fileIds()
    Mutations.ttDvDelete(spark, dir, 4,
      "dv4", pmod(col("event_id"), lit(23)) === 0)
    // MERGE-ON-READ: the delete commit touched NO data file — every
    // pre-existing parquet byte-identical (len, mtime); only _dv/ grew
    val postFiles = fileIds()
    preFiles.foreach { case (p, id) =>
      assert(postFiles.get(p).contains(id), s"DV delete rewrote $p")
    }
    assert((postFiles.keySet -- preFiles.keySet).forall(_.contains("/_dv/")),
      "DV delete added a non-sidecar file")
    // the DV-applied head drops exactly the doomed keys; v3 is untouched
    val v4 = Mutations.ttAsOf(spark, dir, 4)
    assert(v4.count() == v3n - doomed.size)
    assert(v4.filter(col("event_id").isin(doomed.toSeq: _*)).count() == 0)
    assert(Mutations.ttAsOf(spark, dir, 3).count() == v3n,
      "pre-DV snapshot changed")
    // CDF across the DV commit: deletes = exactly the doomed rows, no inserts
    val ch = Mutations.ttChanges(spark, dir, 3, 4)
    assert(ch.filter(col("_change_type") === "insert").count() == 0)
    val chDel = ch.filter(col("_change_type") === "delete")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(chDel == doomed, "CDF delete side is not exactly the DV rows")
    // compaction materializes: same logical state, DVs retired, and the
    // CDF between the two versions is EMPTY (logically a no-op)
    Mutations.ttDvCompact(spark, dir, 5, "b5c")
    val (dvLive, _) = Mutations.ttLiveFiles(spark, dir, 5)
      .partition(Mutations.ttIsDv)
    assert(dvLive.isEmpty, s"compaction left live DVs: $dvLive")
    assert(Mutations.ttAsOf(spark, dir, 5).count() == v3n - doomed.size)
    assert(Mutations.ttChanges(spark, dir, 4, 5).count() == 0,
      "compaction must be invisible to the change feed")
  }

  test("src32: tt snapshot scan prunes files via per-file key stats — numFiles == survivors") {
    def fileScans(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p.collect {
          case f: FileSourceScanExec => Seq(f)
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec => scans(q.plan)
        }.flatten
      scans(df.queryExecution.executedPlan)
    }
    val dir = Mutations.ttStore(spark, sf0001)
    val df = Mutations.ttSkippingRelation(spark, dir, 3)
      .filter(col("event_id") >= 1000000000L)
    assert(df.collect().nonEmpty) // execute THIS plan so its metrics fill
    // survivors = live files whose key max reaches the band
    val live = Mutations.ttLiveFiles(spark, dir, 3)
    val perFile = Mutations.ttReadFiles(spark, dir, live)
      .groupBy(input_file_name().as("f"))
      .agg(max("event_id").as("hi")).collect()
    val survivors = perFile.count(_.getLong(1) >= 1000000000L)
    val total = perFile.length
    assert(survivors < total, "skipping fixture degenerate: nothing prunable")
    val scanned = fileScans(df).head.metrics("numFiles").value
    assert(scanned == survivors,
      s"scan read $scanned files, manifest survivors $survivors (of $total)")
  }

  test("st31 sink plumbing: one commit per batch, txn markers probe-able, store time-travels") {
    // the declared query already asserts the double-delivery skip; this
    // pins the store SHAPE the sink leaves behind
    graft.streaming.EventStreams.streamingTtSink(spark, sf0001).collect()
    val dir = graft.Tables.scratchDir("graft_st31_store", sf0001)
    assert(Mutations.ttHeadVersion(spark, dir) == 2, "3 batches != 3 commits")
    (0 to 2).foreach { b =>
      assert(Mutations.ttTxnCommitted(spark, dir, s"st31#$b"))
    }
    assert(!Mutations.ttTxnCommitted(spark, dir, "st31#3"))
    // per-batch snapshots: each version adds exactly its slice
    val counts = (0 to 2).map(v => Mutations.ttAsOf(spark, dir, v).count())
    assert(counts(0) < counts(1) && counts(1) < counts(2))
    assert(counts(2) == graft.Tables.events(spark, sf0001).count())
  }

  test("up22 restore: pure metadata (no new file), head == target state, history preserved") {
    val dir = Mutations.ttStore(spark, sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toUri.getPath
        if (p.endsWith(".parquet") && !p.contains("/_log/")) out += p
      }
      out.toSet
    }
    val v1rows = Mutations.ttAsOf(spark, dir, 1)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val v3rows = Mutations.ttAsOf(spark, dir, 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val pre = dataFiles()
    Mutations.ttRestore(spark, dir, 4, target = 1)
    assert(dataFiles() == pre, "restore wrote or deleted data files")
    // the restored head is EXACTLY v1's state; v3 still readable
    val v4rows = Mutations.ttAsOf(spark, dir, 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(v4rows == v1rows, "restored head diverges from the target state")
    assert(Mutations.ttAsOf(spark, dir, 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == v3rows,
      "pre-restore head lost by the restore")
  }

  test("up23 shallow clone: zero data copied, source untouched by clone mutations") {
    val dir = Mutations.ttStore(spark, sf0001)
    val clone = graft.Tables.scratchDir("graft_up23_spec_clone", sf0001)
    val cfs = new org.apache.hadoop.fs.Path(clone)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.delete(new org.apache.hadoop.fs.Path(clone), true)
    // a non-empty clone target is refused (the verb is SQL-reachable
    // and must never wipe a user-declared path)
    val dirty = graft.Tables.scratchDir("graft_up23_spec_dirty", sf0001)
    cfs.delete(new org.apache.hadoop.fs.Path(dirty), true)
    cfs.mkdirs(new org.apache.hadoop.fs.Path(s"$dirty/squatter"))
    val occ = intercept[IllegalArgumentException] {
      Mutations.ttShallowClone(spark, dir, dirty, asOf = 3)
    }
    assert(occ.getMessage.contains("not empty"), occ.getMessage)
    Mutations.ttShallowClone(spark, dir, clone, asOf = 3)
    val fs = new org.apache.hadoop.fs.Path(clone)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cloneDataFiles(): Seq[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(clone), true)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) out += f.getPath.toUri.getPath
      }
      out.toSeq
    }
    // ZERO-COPY: the clone dir holds no data file, yet reads the snapshot
    assert(cloneDataFiles().isEmpty, "shallow clone copied data files")
    val viaClone = Mutations.ttAsOf(spark, clone, 0)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val viaSrc = Mutations.ttAsOf(spark, dir, 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaClone == viaSrc, "clone snapshot diverges from the source")
    // independence: a clone COW mutation leaves every source file intact
    def srcIds(): Map[String, (Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          out(f.getPath.toUri.getPath) = (f.getLen, f.getModificationTime)
      }
      out.toMap
    }
    val pre = srcIds()
    val mutated = Mutations.ttAsOf(spark, clone, 0)
      .filter(col("event_type") === "view")
      .withColumn("cents", col("cents") + lit(5L))
      .select("event_id", "event_type", "cents", "day")
    Mutations.ttMergeInto(spark, clone, mutated, 1, "c1")
    assert(srcIds() == pre, "clone mutation touched the source's files")
    // the clone carries the mutation; the source head does not
    val cloneViewSum = Mutations.ttAsOf(spark, clone, 1)
      .filter(col("event_type") === "view").agg(sum("cents")).head.getLong(0)
    val srcViewSum = Mutations.ttAsOf(spark, dir, 3)
      .filter(col("event_type") === "view").agg(sum("cents")).head.getLong(0)
    val nView = Mutations.ttAsOf(spark, dir, 3)
      .filter(col("event_type") === "view").count()
    assert(cloneViewSum == srcViewSum + 5L * nView)
  }

  test("up21 merge-on-read update: one commit, no data file touched, CDF is old-out/new-in") {
    val dir = Mutations.ttStore(spark, sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileIds(): Map[String, (Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          out(f.getPath.toUri.getPath) = (f.getLen, f.getModificationTime)
      }
      out.toMap
    }
    val v3 = Mutations.ttAsOf(spark, dir, 3)
    val v3n = v3.count()
    val nP = v3.filter(col("event_type") === "purchase").count()
    val sumP = v3.filter(col("event_type") === "purchase")
      .agg(sum("cents")).head.getLong(0)
    assert(nP > 0)
    val pre = fileIds()
    Mutations.ttDvUpdate(spark, dir, 4, "u4",
      col("event_type") === "purchase",
      Seq("cents" -> (col("cents") + lit(77L))))
    // merge-on-read: every pre-existing file byte-identical; the commit
    // added only the updated-image batch + the DV sidecar
    val post = fileIds()
    pre.foreach { case (p, id) =>
      assert(post.get(p).contains(id), s"MOR update rewrote $p")
    }
    // row count preserved; updated sum exact; pre-update snapshot intact
    val v4 = Mutations.ttAsOf(spark, dir, 4)
    assert(v4.count() == v3n)
    assert(v4.filter(col("event_type") === "purchase")
      .agg(sum("cents")).head.getLong(0) == sumP + 77L * nP)
    assert(Mutations.ttAsOf(spark, dir, 3)
      .filter(col("event_type") === "purchase")
      .agg(sum("cents")).head.getLong(0) == sumP, "v3 drifted")
    // CDF: exactly nP deletes (old images) + nP inserts (new images)
    val ch = Mutations.ttChanges(spark, dir, 3, 4)
    assert(ch.filter(col("_change_type") === "delete").count() == nP)
    val ins = ch.filter(col("_change_type") === "insert")
    assert(ins.count() == nP &&
      ins.filter(col("event_type") =!= "purchase").count() == 0)
  }

  test("up18 merge matches TABLE-GLOBALLY: a moved-day key updates, never duplicates; empty match is a pure insert") {
    val dir = Mutations.ttStore(spark, sf0001)
    val v3 = Mutations.ttAsOf(spark, dir, 3)
    // pick a real key living on the EARLIEST day, then merge a source row
    // carrying that key under a day 6 days LATER — outside any day the
    // source names for the old row's location
    val probe = v3.orderBy("day", "event_id")
      .select("event_id", "day", "cents").head()
    val (key, oldDay) = (probe.getLong(0), probe.getString(1))
    val newDay = java.time.LocalDate.parse(oldDay).plusDays(6).toString
    val source = Seq((key, "moved", 777L, newDay))
      .toDF("event_id", "event_type", "cents", "day")
    Mutations.ttMergeInto(spark, dir, source, 4, "b4mv")
    val head = Mutations.ttAsOf(spark, dir, 4)
    // UPDATE, not duplicate: the key appears exactly once, at the source
    // day with the source payload — a day-scoped matcher would have
    // inserted a second row and left the old one in place
    val rows = head.filter(col("event_id") === key)
      .select("day", "event_type", "cents").collect()
    assert(rows.length == 1, s"moved-day key duplicated: ${rows.toSeq}")
    assert(rows.head.getString(0) == newDay &&
      rows.head.getString(1) == "moved" && rows.head.getLong(2) == 777L)
    assert(head.count() == v3.count(), "merge changed the row count")
    // CDF shows the exact row-level effect: one delete (the old image,
    // on the OLD day) + one insert (the new image)
    val ch = Mutations.ttChanges(spark, dir, 3, 4)
      .select(col("_change_type"), col("event_id"), col("day")).collect()
    val del = ch.filter(_.getString(0) == "delete")
    val ins = ch.filter(_.getString(0) == "insert")
    assert(del.length == 1 && del.head.getLong(1) == key &&
      del.head.getString(2) == oldDay)
    assert(ins.length == 1 && ins.head.getLong(1) == key &&
      ins.head.getString(2) == newDay)
    // EMPTY MATCH (pure insert): a source of only-fresh keys must commit
    // without an anti-join over an empty path list
    val fresh = Seq((7000000001L, "fresh", 1L, newDay))
      .toDF("event_id", "event_type", "cents", "day")
    Mutations.ttMergeInto(spark, dir, fresh, 5, "b5ins")
    assert(Mutations.ttAsOf(spark, dir, 5).count() == v3.count() + 1)
  }

  test("up17 schema evolution: old files untouched, pre-evolution snapshot lacks the column, head reconciles") {
    val dir = Mutations.ttEvolvedStore(spark, sf0001)
    // a pre-evolution snapshot does not even surface the new column
    val v3cols = Mutations.ttAsOf(spark, dir, 3).columns.toSet
    assert(!v3cols.contains("ingest_gen"),
      s"AS OF 3 leaked the evolved column: $v3cols")
    val head = Mutations.ttAsOf(spark, dir, 4)
    assert(head.columns.contains("ingest_gen"))
    // schema evolution is metadata + new files: every pre-v4 file
    // byte-identical (the v4 commit adds b4-* files, removes nothing)
    val pre = Mutations.ttLiveFiles(spark, dir, 3).toSet
    val post = Mutations.ttLiveFiles(spark, dir, 4).toSet
    assert(pre.subsetOf(post) && (post -- pre).forall(_.contains("b4-")),
      "evolution commit rewrote pre-existing files")
    // head reconciles: old rows NULL, evolved rows carry gen 2 exactly
    val nulls = head.filter(col("ingest_gen").isNull).count()
    val evolved = head.filter(col("ingest_gen") === 2L).count()
    assert(nulls + evolved == head.count() && evolved > 0)
    val expectedEvolved = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 11 === 0).count()
    assert(evolved == expectedEvolved,
      s"evolved-row count $evolved != planted $expectedEvolved")
    // v3's own rollup is unchanged by the later commit
    val v3 = Mutations.ttAsOf(spark, dir, 3).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val logical = {
      val ev = graft.Tables.events(spark, sf0001)
      val base = ev.select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val d0 = ev.agg(date_format(
        date_add(min(to_date(col("ts"))), 3), "yyyy-MM-dd")).head.getString(0)
      val d1 = ev.agg(date_format(
        date_add(min(to_date(col("ts"))), 5), "yyyy-MM-dd")).head.getString(0)
      base.unionByName(base.filter(col("event_id") % 7 === 0))
        .withColumn("cents",
          when(col("day") === d0, col("cents") + 9L).otherwise(col("cents")))
        .filter(!(col("event_type") === "click" && col("day") === d1))
        .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    }
    assert(v3.toSeq == logical.toSeq,
      "pre-evolution snapshot drifted after the evolution commit")
  }

  test("up24 history: stats-sourced counts equal the recount; timestamps follow the injectable clock") {
    val dir = Mutations.ttMergedStore(spark, sf0001)
    val hist = Mutations.ttHistory(spark, dir)
    assert(hist.map(_.op) ==
      Seq("write", "append", "update", "delete", "merge"))
    hist.foreach { ci =>
      // the r14-retired recount survives HERE as the cross-check: the
      // metadata-served count must equal what a scan would say
      val viaStats = Mutations.ttStatsRowCount(spark, dir, ci.version)
      val recount = Mutations.ttAsOf(spark, dir, ci.version).count()
      assert(viaStats.contains(recount),
        s"v${ci.version}: stats-sourced $viaStats != recount $recount")
      assert(ci.tsMs == Mutations.ttClockMs(ci.version),
        s"v${ci.version} timestamp drifted from the injectable clock")
    }
    // DV-bearing snapshots refuse stats-sourcing (their subtraction is
    // entry-level) — callers must recount
    Mutations.ttDvDelete(spark, dir, 5, "dv5",
      pmod(col("event_id"), lit(29)) === 0)
    assert(Mutations.ttStatsRowCount(spark, dir, 5).isEmpty,
      "DV-bearing snapshot served a stats-sourced count")
  }

  test("up18 × up20: MERGE on a DV-bearing store — no crash, no resurrection, exact CDF") {
    val dir = Mutations.ttStore(spark, sf0001)
    // v4: DV-delete the % 23 keys (scattered across every day — the exact
    // store state that crashed r14's merge probe)
    Mutations.ttDvDelete(spark, dir, 4, "dv4",
      pmod(col("event_id"), lit(23)) === 0)
    val v4 = Mutations.ttAsOf(spark, dir, 4).localCheckpoint(true)
    val src = Mutations.ttMergeSource(spark, sf0001).localCheckpoint(true)
    Mutations.ttMergeInto(spark, dir, src, 5, "b5m")
    val head = Mutations.ttAsOf(spark, dir, 5)
    // no resurrection: every % 23 key at head came from the SOURCE (the
    // deleted images never re-materialize through the COW rewrite)
    val dead = head.filter(pmod(col("event_id"), lit(23)) === 0)
    assert(dead.join(src, Seq("event_id"), "left_anti").count() == 0,
      "DV-deleted rows resurrected by the merge rewrite")
    // head ≡ (v4 minus source keys) ∪ source — full-state bag equality
    val expected = v4.join(src.select("event_id"), Seq("event_id"), "left_anti")
      .unionByName(src)
    assert(head.exceptAll(expected).count() == 0 &&
      expected.exceptAll(head).count() == 0, "merged head state wrong")
    // exact CDF: inserts ≡ the source rows, deletes ≡ the v4 images of
    // matched keys (a DV-deleted key contributes an insert but NO delete)
    val cdf = Mutations.ttChanges(spark, dir, 4, 5).localCheckpoint(true)
    val ins = cdf.filter(col("_change_type") === "insert").drop("_change_type")
    val del = cdf.filter(col("_change_type") === "delete").drop("_change_type")
    assert(ins.exceptAll(src).count() == 0 && src.exceptAll(ins).count() == 0,
      "CDF inserts differ from the merge source")
    val expDel = v4.join(src.select("event_id"), Seq("event_id"), "left_semi")
    assert(del.exceptAll(expDel).count() == 0 &&
      expDel.exceptAll(del).count() == 0,
      "CDF deletes differ from the matched v4 images")
    // a key whose ONLY row was DV-deleted takes the INSERT arm: it must
    // appear in the CDF as insert-without-delete
    val insertArm = src.join(v4.select("event_id"), Seq("event_id"), "left_anti")
    assert(insertArm.count() > 0, "fixture lost its deleted-then-merged keys")
    assert(insertArm.join(del, Seq("event_id"), "left_semi").count() == 0,
      "insert-arm keys wrongly surfaced a CDF delete")
  }

  test("ttDvUpdate: every SET RHS reads the PRE-update row; evolved columns survive") {
    val dir = Mutations.ttEvolvedStore(spark, sf0001) // head v4, has ingest_gen
    val pred = col("event_type") === "view" && pmod(col("event_id"), lit(5)) === 0
    val v4 = Mutations.ttAsOf(spark, dir, 4).localCheckpoint(true)
    assert(v4.filter(pred && col("ingest_gen").isNotNull).count() > 0,
      "fixture must update some evolved rows")
    // the classic swap: sequential assignment would read the NEW cents
    Mutations.ttDvUpdate(spark, dir, 5, "u5", pred,
      Seq("cents" -> col("event_id"), "event_id" -> col("cents")))
    val head = Mutations.ttAsOf(spark, dir, 5)
    // build expected IN v4's column order (day, a partition column, comes
    // last) — exceptAll compares positionally
    val swap = Map(
      "event_id" -> when(pred, col("cents")).otherwise(col("event_id")),
      "cents" -> when(pred, col("event_id")).otherwise(col("cents")))
    val expected = v4.select(v4.columns.map(c =>
      swap.getOrElse(c, col(c)).as(c)): _*)
    assert(head.exceptAll(expected).count() == 0 &&
      expected.exceptAll(head).count() == 0,
      "SET semantics diverged from simultaneous-assignment (or dropped a column)")
    // evolved column intact: same non-null ingest_gen population
    assert(head.filter(col("ingest_gen").isNotNull).count() ==
      v4.filter(col("ingest_gen").isNotNull).count(),
      "update dropped the evolved column from rewritten rows")
  }

  test("up25 optimize: fragmented days pack to one file, untouched days byte-identical, CDF empty, re-run no-op") {
    val dir = graft.Tables.scratchDir("graft_up25spec", sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val base = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val dcut = graft.Tables.events(spark, sf0001).agg(date_format(
      date_add(min(to_date(col("ts"))), 2), "yyyy-MM-dd")).head.getString(0)
    // v0: every day one file; v1: an append touching only the first days
    // → those days fragment to 2 files, later days stay at 1
    assert(Mutations.ttIdempotentAppend(spark, dir, base, "o-spec-0"))
    assert(Mutations.ttIdempotentAppend(spark, dir,
      base.filter(col("day") <= dcut)
        .withColumn("event_id", col("event_id") + 9000000000L), "o-spec-1"))
    val pre = Mutations.ttLiveFiles(spark, dir, 1)
    val preDay = pre.groupBy(_.split('/').head)
    val fragged = preDay.filter(_._2.size >= 2).keySet
    val single = preDay.filter(_._2.size == 1).keySet
    assert(fragged.nonEmpty && single.nonEmpty, s"fixture: $preDay")
    val rollup = (v: Int) => Mutations.ttAsOf(spark, dir, v)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val preRoll = rollup(1)
    assert(Mutations.ttOptimize(spark, dir, 2, "o2"))
    val post = Mutations.ttLiveFiles(spark, dir, 2)
    val postDay = post.groupBy(_.split('/').head)
    // packed days now hold exactly one live file; single-file days keep
    // the SAME file (never rewritten — byte identity by immutability)
    fragged.foreach(dd => assert(postDay(dd).size == 1,
      s"day $dd not packed: ${postDay(dd)}"))
    single.foreach(dd => assert(postDay(dd) == preDay(dd),
      s"untouched day $dd rewritten"))
    // logically invisible: same rollup, empty row-level CDF
    assert(rollup(2).toSeq == preRoll.toSeq)
    assert(Mutations.ttChanges(spark, dir, 1, 2).count() == 0,
      "optimize leaked row changes into the CDF")
    // a second optimize finds nothing to pack
    assert(!Mutations.ttOptimize(spark, dir, 3, "o3"))
  }

  test("snapshot-derived verbs RE-DERIVE after a lost commit race — a stale rewrite never publishes") {
    val dir = Mutations.ttStore(spark, sf0001) // head v3
    // a "concurrent" writer lands v4 first: an append introducing key K
    val k = 7500000001L
    val dayX = graft.Tables.events(spark, sf0001).agg(date_format(
      min(to_date(col("ts"))), "yyyy-MM-dd")).head.getString(0)
    assert(Mutations.ttIdempotentAppend(spark, dir,
      Seq((k, "moved", 999L, dayX))
        .toDF("event_id", "event_type", "cents", "day"), "race-derive"))
    assert(Mutations.ttHeadVersion(spark, dir) == 4)
    // the merge STARTS from the stale head (target 4, derived at v3):
    // its claim of v4 must fail, and the retry must re-derive at v4 —
    // where K now exists — so K is an UPDATE. A re-commit WITHOUT
    // re-derivation would treat K as unmatched and duplicate it.
    val dayY = java.time.LocalDate.parse(dayX).plusDays(4).toString
    val src = Seq((k, "merged", 111L, dayY))
      .toDF("event_id", "event_type", "cents", "day")
    val landed = Mutations.ttRetryVerb(spark, dir, 4)(v =>
      Mutations.ttMergeInto(spark, dir, src, v, s"m$v"))
    assert(landed == 5, s"merge landed at v$landed")
    val rows = Mutations.ttAsOf(spark, dir, 5)
      .filter(col("event_id") === k)
      .select("event_type", "cents", "day").collect()
    assert(rows.length == 1,
      s"stale-derived merge duplicated the racing key: ${rows.toSeq}")
    assert(rows.head.getString(0) == "merged" &&
      rows.head.getLong(1) == 111L && rows.head.getString(2) == dayY)
  }

  test("up26 column mapping: rename/drop are pure metadata, snapshots keep their own names, mapped append writes physical") {
    val dir = graft.Tables.scratchDir("graft_up26spec", sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Mutations.ttBuildStore(spark, sf0001, dir)
    Mutations.ttBuildEvolvedSuffix(spark, sf0001, dir)
    val v4amount = Mutations.ttAsOf(spark, dir, 4)
      .agg(sum("cents")).head.getLong(0)
    val filesV4 = Mutations.ttLiveFiles(spark, dir, 4)
    // v5 RENAME: zero file change, old snapshots untouched
    Mutations.ttRenameColumn(spark, dir, 5, "cents", "amount")
    assert(Mutations.ttLiveFiles(spark, dir, 5) == filesV4,
      "rename touched the live set")
    val c4 = Mutations.ttAsOf(spark, dir, 4).columns.toSet
    val c5 = Mutations.ttAsOf(spark, dir, 5).columns.toSet
    assert(c4.contains("cents") && !c4.contains("amount"),
      s"pre-rename snapshot leaked the new name: $c4")
    assert(c5.contains("amount") && !c5.contains("cents"), c5.toString)
    // v6 mapped append: logical `amount` in, PHYSICAL `cents` on disk
    val mapped = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 21 === 0)
      .select((col("event_id") + 8000000000L).as("event_id"),
        col("event_type"),
        (expr("cast(round(value * 100) as bigint)") + 330L).as("amount"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    Mutations.ttMappedAppend(spark, dir, 6, "b6", mapped)
    val b6files = (Mutations.ttLiveFiles(spark, dir, 6).toSet --
      Mutations.ttLiveFiles(spark, dir, 5).toSet).toSeq
    assert(b6files.nonEmpty)
    val physCols = spark.read.parquet(s"$dir/${b6files.head}").columns.toSet
    assert(physCols.contains("cents") && !physCols.contains("amount"),
      s"mapped append wrote logical names to disk: $physCols")
    // v7 DROP: metadata only; the column survives in earlier snapshots
    Mutations.ttDropColumn(spark, dir, 7, "ingest_gen")
    assert(!Mutations.ttAsOf(spark, dir, 7).columns.contains("ingest_gen"))
    assert(Mutations.ttAsOf(spark, dir, 6).columns.contains("ingest_gen"),
      "drop leaked backwards in time")
    // algebra under the new name: head amount = v4 cents + mapped slice
    val mappedSum = mapped.agg(sum("amount")).head.getLong(0)
    assert(Mutations.ttAsOf(spark, dir, 7)
      .agg(sum("amount")).head.getLong(0) == v4amount + mappedSum)
    // ops fold through the checkpoint: a v7 checkpoint resolution must
    // carry the same schema ops and produce the identical logical read
    Mutations.ttWriteCheckpoint(spark, dir, 7)
    val res = Mutations.ttResolve(spark, dir, 7)
    assert(res.schemaOps ==
      Seq("rename=cents|amount", "dropcol=ingest_gen"), res.schemaOps)
    assert(res.opened <= 2, s"checkpointed resolution opened ${res.opened}")
    assert(Mutations.ttAsOf(spark, dir, 7)
      .agg(sum("amount")).head.getLong(0) == v4amount + mappedSum)
  }

  test("repeat DV verbs on an already-DV-bearing store: no crash, no resurrection, algebra holds") {
    // the bench's staged re-runs hit exactly this: the SECOND DELETE/
    // UPDATE sees a DV-bearing snapshot, whose read is a join —
    // input_file_name must be evaluated on the single-source side
    val dir = Mutations.ttStore(spark, sf0001)
    Mutations.ttDvDelete(spark, dir, 4, "dv4",
      pmod(col("event_id"), lit(23)) === 0)
    def roll(v: Int) = Mutations.ttAsOf(spark, dir, v)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val v4 = roll(4)
    // repeat delete: matches nothing (doomed computed from the
    // DV-applied head), commits an empty sidecar, state unchanged
    Mutations.ttDvDelete(spark, dir, 5, "dv5",
      pmod(col("event_id"), lit(23)) === 0)
    assert(roll(5) == v4, "repeat delete changed the state")
    // update over the DV-bearing store: purchases +1, deleted keys stay dead
    val nP = Mutations.ttAsOf(spark, dir, 5)
      .filter(col("event_type") === "purchase").count()
    Mutations.ttDvUpdate(spark, dir, 6, "u6",
      col("event_type") === "purchase",
      Seq("cents" -> (col("cents") + lit(1L))))
    val exp = v4.map { case (t, n, c) =>
      if (t == "purchase") (t, n, c + nP) else (t, n, c) }
    assert(roll(6) == exp, "update over DVs diverged")
    assert(Mutations.ttAsOf(spark, dir, 6)
      .filter(pmod(col("event_id"), lit(23)) === 0).count() == 0,
      "update resurrected DV-deleted rows")
  }

  test("idempotent append under a two-writer race: duplicate txn lands once, distinct txns both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Mutations.ttStore(spark, sf0001) // head v3
    val batch = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 41 === 0)
      .select((col("event_id") + 6000000000L).as("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .localCheckpoint(true)
    // SAME txn from two concurrent writers (the zombie-retry scenario):
    // exactly one commit may land, whatever the interleaving
    val sameTxn = Seq(
      Future(Mutations.ttIdempotentAppend(spark, dir, batch, "race-dup")),
      Future(Mutations.ttIdempotentAppend(spark, dir, batch, "race-dup")))
      .map(Await.result(_, 120.seconds))
    assert(sameTxn.count(identity) == 1,
      s"duplicate txn committed ${sameTxn.count(identity)} times")
    val headAfterDup = Mutations.ttHeadVersion(spark, dir)
    assert(headAfterDup == 4, s"head $headAfterDup after one logical append")
    // DISTINCT txns racing: both land, log stays linear (no gaps)
    val distinct = Seq("race-a", "race-b").map(t =>
      Future(Mutations.ttIdempotentAppend(spark, dir, batch, t)))
      .map(Await.result(_, 120.seconds))
    assert(distinct.forall(identity), "a distinct-txn writer was lost")
    assert(Mutations.ttHeadVersion(spark, dir) == 6)
    assert((0 to 6).forall(v =>
      Mutations.ttLiveFiles(spark, dir, v).nonEmpty), "log has a gap")
    // the duplicated batch's rows appear exactly TWICE more than once:
    // once for the dup pair, once per distinct txn = 3 copies total
    val n = batch.count()
    assert(Mutations.ttAsOf(spark, dir, 6)
      .filter(col("event_id") >= 6000000000L).count() == 3 * n)
  }

  test("drop-column guard: the physical partition column is refused, even through a rename chain") {
    val dir = Mutations.ttStore(spark, sf0001)
    val head = Mutations.ttHeadVersion(spark, dir)
    // the r15 judge's probe: dropping `day` used to commit durably and
    // wedge every subsequent INSERT — now refused loudly, nothing lands
    val err = intercept[IllegalArgumentException] {
      Mutations.ttDropColumn(spark, dir, head + 1, "day")
    }
    assert(err.getMessage.contains("partition"), err.getMessage)
    assert(Mutations.ttHeadVersion(spark, dir) == head,
      "refused drop still committed")
    // renaming the layout key is a legal metadata op — but dropping its
    // NEW logical name must still be refused (it unwinds to `day`)
    Mutations.ttRenameColumn(spark, dir, head + 1, "day", "event_day")
    val err2 = intercept[IllegalArgumentException] {
      Mutations.ttDropColumn(spark, dir, head + 2, "event_day")
    }
    assert(err2.getMessage.contains("partition"), err2.getMessage)
    // a data column still drops fine after the refusals
    Mutations.ttDropColumn(spark, dir, head + 2, "cents")
    assert(!Mutations.ttAsOf(spark, dir, head + 2).columns.contains("cents"))
  }

  test("up28 clustered optimize: logical no-op; the band scan reads a fraction of the files") {
    val dir = Mutations.ttStore(spark, sf0001)
    val pre = Mutations.ttAsOf(spark, dir, 3)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("event_type").collect().toSeq
    assert(Mutations.ttOptimizeClustered(spark, dir, 4, "z4", Seq("event_id"), 4))
    val post = Mutations.ttAsOf(spark, dir, 4)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("event_type").collect().toSeq
    assert(pre == post, "clustering changed the data")
    // physical win: a key-band filter through the stats-driven relation
    // must scan strictly fewer files than the layout holds — impossible
    // pre-clustering, where every base file spans the whole key range
    val cap = graft.Tables.events(spark, sf0001)
      .agg(max("event_id")).head.getLong(0) / 4
    val banded = Mutations.ttSkippingRelation(spark, dir, 4)
      .filter(col("event_id") <= cap)
    assert(banded.collect().nonEmpty)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p.collect {
          case f: FileSourceScanExec => Seq(f)
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec => scans(q.plan)
        }.flatten
      scans(df.queryExecution.executedPlan).head.metrics("numFiles").value
    }
    val total = Mutations.ttLiveFiles(spark, dir, 4).count(!_.startsWith("_"))
    val scanned = scannedFiles(banded)
    assert(scanned < total,
      s"clustered layout pruned nothing: $scanned of $total files scanned")
    // survivors by the commit stats themselves: exact agreement
    val (live, stats, _) = Mutations.ttLiveEntriesCounted(spark, dir, 4)
    val survivors = live.filterNot(Mutations.ttIsDv)
      .count(f => stats(f).lo <= cap)
    assert(scanned == survivors,
      s"scan read $scanned files, stats survivors $survivors")
  }

  test("checkpoint-relation resolution: survivors ≡ driver replay, band prunes in-plan, ≤ 1 ckpt + suffix opens, unservable snapshots fall back") {
    val dir = Mutations.ttStore(spark, sf0001)
    // v4 clustered rewrite lands the first checkpoint; v5 append gives
    // the relation path a suffix commit to overlay
    assert(Mutations.ttOptimizeClustered(spark, dir, 4, "z4",
      Seq("event_id"), 4))
    val extra = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 61 === 0)
      .select((col("event_id") + lit(4000000000L)).as("event_id"),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    Mutations.ttMappedAppend(spark, dir, 5, "b5", extra)
    // full (band-less) relation resolution ≡ the driver replay, at the
    // pinned metadata cost: ONE checkpoint + the one suffix commit
    val (full, opened) =
      Mutations.ttCheckpointSurvivors(spark, dir, 5, None).get
    val driver = Mutations.ttLiveFiles(spark, dir, 5)
      .filterNot(Mutations.ttIsDv).sorted
    assert(full.map(_._1) == driver,
      "relation-backed live set diverges from the driver replay")
    assert(opened == 2, s"opened $opened metadata files, expected 2")
    // the band prunes IN-PLAN: survivors are exactly the stats-filtered
    // subset, and strictly fewer than the live set
    val cap = graft.Tables.events(spark, sf0001)
      .agg(max("event_id")).head.getLong(0) / 4
    val (banded, _) =
      Mutations.ttCheckpointSurvivors(spark, dir, 5,
        Some((Long.MinValue, cap))).get
    assert(banded == full.filter(_._2.lo <= cap))
    assert(banded.size < full.size,
      s"band pruned nothing: ${banded.size} of ${full.size}")
    // the skipping relation through the checkpoint path answers the
    // band rollup identically to the plain snapshot read
    val viaRel = Mutations.ttSkippingRelation(spark, dir, 5,
        Some((Long.MinValue, cap)))
      .filter(col("event_id") <= cap)
      .agg(count(lit(1)), sum("cents")).collect().toSeq
    val viaAsOf = Mutations.ttAsOf(spark, dir, 5)
      .filter(col("event_id") <= cap)
      .agg(count(lit(1)), sum("cents")).collect().toSeq
    assert(viaRel == viaAsOf, "relation-backed band read diverges")
    // snapshots the raw-file relation cannot serve FALL BACK loudly to
    // the full resolution path: a DV-bearing head...
    Mutations.ttDvDelete(spark, dir, 6, "dv6",
      pmod(col("event_id"), lit(23)) === 0)
    assert(Mutations.ttCheckpointSurvivors(spark, dir, 6, None).isEmpty,
      "DV-bearing snapshot served through the raw-file relation")
    // ...and a pre-checkpoint version has no relation to serve
    assert(Mutations.ttCheckpointSurvivors(spark, dir, 3, None).isEmpty)
  }

  test("two-key ZORDER: the Morton layout prunes BOTH dimensions; a single-key layout cannot prune the second") {
    val dir = Mutations.ttStore(spark, sf0001)
    val pre = Mutations.ttAsOf(spark, dir, 3)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("event_type").collect().toSeq
    assert(Mutations.ttOptimizeClustered(spark, dir, 4, "z4",
      Seq("event_id", "cents"), 4))
    val post = Mutations.ttAsOf(spark, dir, 4)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("event_type").collect().toSeq
    assert(pre == post, "two-key clustering changed the data")
    // per-file rectangles of (cents, event_id) after each rewrite
    def ranges(d: String): Seq[(Long, Long, Long, Long)] =
      Mutations.ttAsOf(spark, d, 4)
        .withColumn("_f", input_file_name())
        .groupBy("_f")
        .agg(min("cents").as("clo"), max("cents").as("chi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val two = ranges(dir)
    // the single-key twin on its own dir, same data, same file budget
    val twin = graft.Tables.scratchDir("graft_r17_z2_twin", sf0001)
    val tp = new org.apache.hadoop.fs.Path(twin)
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
    Mutations.ttBuildStore(spark, sf0001, twin)
    assert(Mutations.ttOptimizeClustered(spark, twin, 4, "z4",
      Seq("event_id"), 4))
    val one = ranges(twin)
    // second-dimension slice: the bottom-quarter cents band. Under the
    // Morton layout every file covers a small RECTANGLE, so the band
    // intersects a strict subset; under the event-only range sort every
    // file spans the whole cents range and nothing can prune.
    val (cmin, cmax) = (two.map(_._1).min, two.map(_._2).max)
    val capC = cmin + (cmax - cmin) / 4
    val twoSurv = two.count(_._1 <= capC)
    val oneSurv = one.count(_._1 <= capC)
    assert(twoSurv < two.size,
      s"two-key layout pruned nothing on cents: $twoSurv of ${two.size}")
    assert(oneSurv == one.size,
      s"single-key layout claims cents pruning it cannot have: " +
        s"$oneSurv of ${one.size}")
    // the FIRST dimension still prunes under the interleave (rectangle,
    // not a stripe): the appended-id band touches a strict subset too
    val twoSurvE = two.count(_._4 >= 1000000000L)
    assert(twoSurvE < two.size,
      s"two-key layout pruned nothing on event_id: $twoSurvE of ${two.size}")
  }

  test("up29 time-based vacuum: retained snapshots intact, superseded files reaped, pre-horizon AS OF dies") {
    val dir = Mutations.ttStore(spark, sf0001)
    val preV2 = Mutations.ttAsOf(spark, dir, 2).count()
    val preV3 = Mutations.ttAsOf(spark, dir, 3).count()
    // RETAIN 1 HOUR at the v3 instant (commits land an hour apart on
    // the injected clock) → retained = {v2, v3}
    val (before, after, removed) =
      Mutations.ttVacuumRetainHours(spark, dir, 1, Mutations.ttClockMs(3))
    assert(removed > 0, "time horizon reaped nothing")
    assert(after == before - removed)
    assert(Mutations.ttAsOf(spark, dir, 2).count() == preV2)
    assert(Mutations.ttAsOf(spark, dir, 3).count() == preV3)
    // v0's superseded originals are gone: the pre-horizon read dies
    intercept[Throwable] { Mutations.ttAsOf(spark, dir, 0).count() }
    // idempotent: a second vacuum at the same horizon deletes nothing
    val (_, _, removedAgain) =
      Mutations.ttVacuumRetainHours(spark, dir, 1, Mutations.ttClockMs(3))
    assert(removedAgain == 0, "re-vacuum found new candidates")
  }

  test("txn probe is checkpoint-bounded: ≤ 1 checkpoint + interval commit opens, any log length") {
    val dir = graft.Tables.scratchDir("graft_txnprobe_spec", sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val batch = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 13 === 0)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .localCheckpoint(true)
    // 10 commits → checkpoints at v4 and v8 (interval 4)
    (0 to 9).foreach { i =>
      val b = batch.withColumn("event_id", col("event_id") + lit(i * 100000000L))
      assert(Mutations.ttIdempotentAppend(spark, dir, b, s"probe#$i"))
    }
    // a PRE-checkpoint txn must resolve from the checkpoint index, not
    // a full-log replay: v9's resolution opens ckpt-v8 + v9 only
    val (found, opened) = Mutations.ttTxnCommittedCounted(spark, dir, "probe#0")
    assert(found, "pre-checkpoint txn lost by the checkpoint index")
    assert(opened <= 1 + Mutations.ttCheckpointInterval,
      s"txn probe opened $opened files on a 10-commit log")
    val (missing, _) = Mutations.ttTxnCommittedCounted(spark, dir, "probe#99")
    assert(!missing)
    // and the replay-dedup contract holds through the bounded probe
    assert(!Mutations.ttIdempotentAppend(spark, dir, batch, "probe#3"))
  }

  test("st33 replication plumbing: one atomic cdc-apply commit per version, txn-absorbed replays, silver ≡ bronze row for row") {
    graft.streaming.EventStreams.streamingCdcReplication(spark, sf0001)
      .collect()
    val silver = graft.Tables.scratchDir("graft_st33_silver", sf0001)
    val bronze = Mutations.ttBaseScenario(spark, sf0001)
    // exactly one commit per bronze version, all cdc-apply, all txn'd
    assert(Mutations.ttHeadVersion(spark, silver) == 3)
    assert(Mutations.ttHistory(spark, silver).map(_.op).toSet ==
      Set("cdc-apply"))
    (0 to 3).foreach(v =>
      assert(Mutations.ttTxnCommitted(spark, silver, s"st33#$v")))
    assert(!Mutations.ttTxnCommitted(spark, silver, "st33#4"))
    // row-for-row identity with the bronze head (not just the rollup)
    val cols = Seq("event_id", "event_type", "cents", "day").map(col)
    val a = Mutations.ttAsOf(spark, silver, 3).select(cols: _*)
      .orderBy("event_id", "day", "cents").collect().toSeq
    val b = Mutations.ttAsOf(spark, bronze, 3).select(cols: _*)
      .orderBy("event_id", "day", "cents").collect().toSeq
    assert(a.size == b.size && a == b, "silver diverges from bronze head")
    // intermediate silver versions track bronze versions exactly
    (0 to 2).foreach { v =>
      assert(Mutations.ttAsOf(spark, silver, v).count() ==
        Mutations.ttAsOf(spark, bronze, v).count(),
        s"silver v$v count diverges from bronze v$v")
    }
  }

  test("up30 convert-in-place: zero-copy adoption, stats recorded, double-convert refused, verbs work after") {
    val dir = graft.Tables.scratchDir("graft_convert_spec", sf0001)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .repartition(col("day"))
      .write.partitionBy("day").parquet(dir)
    def fileIds(): Map[String, (Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toUri.getPath
        if (p.endsWith(".parquet") && !p.contains("/_log/"))
          out(p) = (f.getLen, f.getModificationTime)
      }
      out.toMap
    }
    val pre = fileIds()
    val n = Mutations.ttConvert(spark, dir)
    assert(n == pre.size, s"converted $n files, dir holds ${pre.size}")
    // zero-copy: every pre-existing file byte-identical in place
    val post = fileIds()
    pre.foreach { case (p, id) =>
      assert(post.get(p).contains(id), s"convert touched $p")
    }
    // stats landed at the convert commit (data skipping + history work)
    assert(Mutations.ttStatsRowCount(spark, dir, 0)
      .contains(graft.Tables.events(spark, sf0001).count()))
    // a converted dir is a live table: append + AS OF both work
    val late = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 29 === 0)
      .select((col("event_id") + 3000000000L).as("event_id"),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    Mutations.ttSqlInsert(spark, dir, late)
    assert(Mutations.ttAsOf(spark, dir, 1).count() >
      Mutations.ttAsOf(spark, dir, 0).count())
    // converting an already-converted dir is refused loudly
    val err = intercept[IllegalArgumentException] {
      Mutations.ttConvert(spark, dir)
    }
    assert(err.getMessage.contains("already a tt table"))
  }

  test("write candidates resolve through the checkpoint relation: scoped resolution lists ONLY the scoped day, ≡ driver replay, DV stores served, pre-checkpoint falls back") {
    val dir = Mutations.ttStore(spark, sf0001)
    // v4 clustered rewrite lands the first checkpoint (interval 4);
    // v5 append gives the relation path a suffix commit to overlay
    assert(Mutations.ttOptimizeClustered(spark, dir, 4, "z4",
      Seq("event_id"), 4))
    val extra = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % 61 === 0)
      .select((col("event_id") + lit(4000000000L)).as("event_id"),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    Mutations.ttMappedAppend(spark, dir, 5, "b5", extra)
    // unscoped: relation-backed, pinned open count (ckpt + one suffix
    // commit), ≡ the driver replay
    val cand = Mutations.ttWriteCandidates(spark, dir, 5)
    assert(cand.viaRelation, "checkpoint-covered store not relation-served")
    assert(cand.opened == 2, s"opened ${cand.opened} metadata files")
    val (dvRep, dataRep) =
      Mutations.ttLiveFiles(spark, dir, 5).partition(Mutations.ttIsDv)
    assert(cand.data == dataRep.sorted && cand.dv == dvRep.sorted,
      "relation-backed candidates diverge from the driver replay")
    // day-scoped: the returned list IS everything the driver sees — it
    // holds ONLY the scoped day's files (an UPDATE touching one day
    // never materializes the other days' file list on the driver)
    val day0 = graft.Tables.events(spark, sf0001)
      .agg(date_format(min(to_date(col("ts"))), "yyyy-MM-dd"))
      .head.getString(0)
    val scoped = Mutations.ttWriteCandidates(spark, dir, 5,
      dayScope = Some(Set(day0)))
    assert(scoped.viaRelation)
    assert(scoped.data.nonEmpty &&
      scoped.data.forall(_.startsWith(s"day=$day0/")),
      s"scoped candidates leak other days: ${scoped.data.take(3)}")
    assert(scoped.data == dataRep.filter(_.startsWith(s"day=$day0/")).sorted)
    // a day-scoped DV UPDATE through the relation path ≡ the unscoped
    // verb on a twin store (same predicate, same post-state)
    Mutations.ttDvUpdate(spark, dir, 6, "u6", col("day") === day0,
      Seq("cents" -> (col("cents") + lit(7L))), dayScope = Some(Set(day0)))
    val twin = graft.Tables.scratchDir("graft_r18_cand_twin", sf0001)
    val tp = new org.apache.hadoop.fs.Path(twin)
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
    Mutations.ttBuildStore(spark, sf0001, twin)
    assert(Mutations.ttOptimizeClustered(spark, twin, 4, "z4",
      Seq("event_id"), 4))
    Mutations.ttMappedAppend(spark, twin, 5, "b5", extra)
    Mutations.ttDvUpdate(spark, twin, 6, "u6", col("day") === day0,
      Seq("cents" -> (col("cents") + lit(7L))))
    def state(d: String) = Mutations.ttAsOf(spark, d, 6)
      .groupBy("day").agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("day").collect().toSeq
    assert(state(dir) == state(twin),
      "day-scoped DV update diverges from the unscoped verb")
    // DV-bearing head: still relation-served (DV adds are first-class
    // on the write path, unlike the read-side survivors guard)
    val dvCand = Mutations.ttWriteCandidates(spark, dir, 6)
    assert(dvCand.viaRelation && dvCand.dv.nonEmpty,
      "DV-bearing store fell back on the write path")
    val (dvRep6, dataRep6) =
      Mutations.ttLiveFiles(spark, dir, 6).partition(Mutations.ttIsDv)
    assert(dvCand.dv == dvRep6.sorted && dvCand.data == dataRep6.sorted)
    // dataFileFilter pushes liveness probes in-plan (DV compaction's
    // shape): Nil zeroes the data side, a named subset returns exactly
    // the live members of that subset
    assert(Mutations.ttWriteCandidates(spark, dir, 6,
      dataFileFilter = Some(Nil)).data.isEmpty)
    val probe = dataRep6.take(2) :+ "day=1970-01-01/nonexistent.parquet"
    assert(Mutations.ttWriteCandidates(spark, dir, 6,
      dataFileFilter = Some(probe)).data == dataRep6.take(2).sorted)
    // pre-checkpoint version: the bounded driver replay serves
    val pre = Mutations.ttWriteCandidates(spark, dir, 3)
    assert(!pre.viaRelation)
    assert(pre.data == Mutations.ttLiveFiles(spark, dir, 3).sorted)
  }

  test("N-key ZORDER: the 3-key Morton layout prunes ALL THREE dimensions; the 2-key layout cannot prune the third") {
    // a store with a third numeric key, hash-scrambled so it is
    // uncorrelated with the other two (no accidental pruning)
    def build(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      // ONE day: at this SF the fixture has ~1000 rows, and splitting
      // them across 30 day-partitions × 8 files gives ~4-row files
      // whose min/max stats prune ANY band by luck — the layout claim
      // needs the full curve budget on one partition (8 files × ~125
      // rows), which is also the shape a real hot-day compaction has.
      // The second/third keys are UNIFORM hash-scrambled values: the
      // claim under test is the interleave's geometry (boxes vs
      // stripes), which a skewed fixture column (cents) would blur —
      // a quarter of its RANGE holds nearly all its mass
      val base = graft.Tables.events(spark, sf0001).select(
        col("event_id"), col("event_type"),
        pmod(xxhash64(col("event_id") + lit(1L)), lit(1000L)).as("c2"),
        pmod(xxhash64(col("event_id") + lit(2L)), lit(1000L)).as("mills"),
        lit("2024-01-01").as("day"))
      base.repartition(col("day")).write.partitionBy("day")
        .mode("overwrite").parquet(d)
      Mutations.ttConvert(spark, d) // in-place adoption → v0 with stats
    }
    val dir3 = graft.Tables.scratchDir("graft_r18_z3", sf0001)
    build(dir3)
    val pre = Mutations.ttAsOf(spark, dir3, 0)
      .agg(count(lit(1)), sum("c2"), sum("mills")).collect().toSeq
    // 8 files per day: the curve's top three bits take one bit from
    // EACH key, so every file's box halves every dimension
    assert(Mutations.ttOptimizeClustered(spark, dir3, 1, "z1",
      Seq("event_id", "c2", "mills"), 8))
    val post = Mutations.ttAsOf(spark, dir3, 1)
      .agg(count(lit(1)), sum("c2"), sum("mills")).collect().toSeq
    assert(pre == post, "3-key clustering changed the data")
    // per-file key boxes + row counts: pruning claims are ROW-WEIGHTED
    // (at this SF many range-partitioned files hold a handful of rows,
    // and a 3-row file's min can clear any band by luck — rows, not
    // file counts, are what a scan actually pays for)
    def ranges(d: String): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
      Mutations.ttAsOf(spark, d, 1)
        .withColumn("_f", input_file_name())
        .groupBy("_f")
        .agg(min("event_id").as("elo"), max("event_id").as("ehi"),
          min("c2").as("clo"), max("c2").as("chi"),
          min("mills").as("mlo"), max("mills").as("mhi"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
        .toSeq
    val three = ranges(dir3)
    // the 2-key twin: same data, same file budget, mills NOT a key
    val dir2 = graft.Tables.scratchDir("graft_r18_z3_twin", sf0001)
    build(dir2)
    assert(Mutations.ttOptimizeClustered(spark, dir2, 1, "z1",
      Seq("event_id", "c2"), 8))
    val two = ranges(dir2)
    def scannedFrac(rs: Seq[(Long, Long, Long, Long, Long, Long, Long)],
        surv: ((Long, Long, Long, Long, Long, Long, Long)) => Boolean)
        : Double =
      rs.filter(surv).map(_._7).sum.toDouble / rs.map(_._7).sum
    // third-dimension slice (bottom-quarter mills band): the 3-key
    // layout's boxes halve the mills space, so the band scan pays a
    // FRACTION of the rows; under the 2-key layout mills is hash-
    // scrambled across every box and (row-weighted) nothing prunes
    val capM = 250L
    val threeM = scannedFrac(three, _._5 <= capM)
    val twoM = scannedFrac(two, _._5 <= capM)
    assert(threeM <= 0.75,
      s"3-key layout scans ${threeM} of rows on the mills band")
    assert(twoM >= 0.9,
      s"2-key layout claims mills pruning it cannot have: scans $twoM")
    assert(threeM < twoM - 0.2,
      s"3rd dimension not materially prunable: $threeM vs $twoM")
    // the first two dimensions still prune under the 3-key interleave
    // (boxes, not stripes)
    val (elo, ehi) = (three.map(_._1).min, three.map(_._2).max)
    val capE = elo + (ehi - elo) / 4
    assert(scannedFrac(three, _._1 <= capE) <= 0.8,
      "3-key layout pruned nothing on event_id")
    val capC = 250L
    assert(scannedFrac(three, _._3 <= capC) <= 0.8,
      "3-key layout pruned nothing on c2")
    // the SQL spelling accepts the 3-column list end to end; >8 keys
    // refused by the verb
    graft.sources.TtCatalog.install(spark)
    graft.sources.TtCatalog.register("r18_z3", dir3)
    val sqlOut = spark
      .sql("OPTIMIZE tt.r18_z3 ZORDER BY (event_id, c2, mills)").collect()
    assert(sqlOut.length == 1 && sqlOut(0).getBoolean(1),
      s"SQL 3-key ZORDER did not cluster: ${sqlOut.mkString}")
    val err = intercept[IllegalArgumentException] {
      Mutations.ttOptimizeClustered(spark, dir3, 2, "z2",
        (1 to 9).map(i => s"k$i"), 8)
    }
    assert(err.getMessage.contains("1-8"))
  }

  test("empty band survivors short-circuit to an EMPTY relation (no full re-resolution), schema intact") {
    val dir = Mutations.ttStore(spark, sf0001)
    assert(Mutations.ttOptimizeClustered(spark, dir, 4, "z4",
      Seq("event_id"), 4)) // lands the v4 checkpoint
    // a band beyond every file's hi: the relation path returns zero
    // survivors and the read serves an empty frame with the head schema
    val empty = Mutations.ttSkippingRelation(spark, dir, 4,
      Some((Long.MaxValue - 1, Long.MaxValue)))
    assert(empty.count() == 0L)
    val cols = empty.columns.toSet
    assert(Set("event_id", "event_type", "cents", "day").subsetOf(cols),
      s"empty relation lost the schema: $cols")
    // and the survivors themselves are Some(empty), not a fallback
    val (surv, _) = Mutations.ttCheckpointSurvivors(spark, dir, 4,
      Some((Long.MaxValue - 1, Long.MaxValue))).get
    assert(surv.isEmpty)
  }
}
