package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {

  test("cohort retention: age-0 cell is the full cohort; cells never exceed it") {
    val rows = Behavior.cohortRetention(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val age0 = rows.filter(_._2 == 0L)
    // every user is active in their own first week -> retention 1.0
    age0.foreach { case (cw, _, _, ret) =>
      assert(ret == 1.0, s"cohort $cw age-0 retention $ret")
    }
    val cohortN = age0.map(r => r._1 -> r._3).toMap
    rows.foreach { case (cw, age, n, ret) =>
      assert(n <= cohortN(cw), s"cohort $cw age $age active $n > cohort")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("binned interval join equals the naive quadratic overlap join") {
    val sess = Behavior.sessionIntervals(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val naive = (for {
      a <- sess; b <- sess
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield ((a._1, b._1))).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Behavior.intervalOverlapJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == naive, s"${got.size} pairs vs naive ${naive.size}")
    assert(got.nonEmpty)
  }

  test("session intervals within a user never overlap (gap rule)") {
    val sess = Behavior.sessionIntervals(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    sess.values.foreach { ss =>
      val sorted = ss.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 - a._3 >= 1800000L,
          s"sessions closer than the gap: $a $b")
        case _ =>
      }
    }
  }

  test("KM survival: at-risk accounting closes, curve is monotone in [0, 1]") {
    val rows = Behavior.survivalRetention(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val total = graft.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    // first bucket starts with every customer at risk
    assert(rows.head._2 == total)
    // n_{k+1} = n_k - d_k - c_k, every exit accounted
    rows.sliding(2).foreach {
      case Array((_, n1, d1, c1, _), (_, n2, _, _, _)) =>
        assert(n2 == n1 - d1 - c1, "at-risk accounting leaks")
      case _ =>
    }
    val (_, nL, dL, cL, _) = rows.last
    assert(nL - dL - cL == 0, "customers left unaccounted after last bucket")
    // survival is a monotone nonincreasing curve in [0, 1e6]
    assert(rows.head._5 <= 1000000L && rows.last._5 >= 0L)
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "survival increased")
      case _ =>
    }
  }

  test("session stats: native session_window sessions match e2's manual gap rule") {
    val stats = Behavior.sessionStats(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // per-user session count and event totals equal the lag/cumsum form
    val mine = stats.groupBy(_._1)
      .map { case (u, rs) => u -> (rs.length.toLong, rs.map(_._2).sum) }
    val manual = graft.ops.Relational.eventsSessionize(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mine == manual, "native session_window diverges from the gap rule")
  }

  test("e20 A/B readout: both arms populated, z recomputes from the exact counts") {
    val r = graft.ops.Behavior.abTestReadout(spark, sf0001).collect().head
    val (nA, xA, nB, xB) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    assert(nA > 0 && nB > 0, "an md5-parity split left an arm empty")
    assert(xA <= nA && xB <= nB)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    // conversion must not be degenerate or the z is meaningless
    assert(xA + xB > 0 && xA + xB < nA + nB, "degenerate conversion fixture")
    val pA = xA.toDouble / nA
    val pB = xB.toDouble / nB
    val pp = (xA + xB).toDouble / (nA + nB)
    val z = (pA - pB) / math.sqrt(pp * (1 - pp) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(r.getDouble(7) - math.rint(z * 1e4) / 1e4) < 1e-9,
      s"z ${r.getDouble(7)} != recomputed $z")
  }

  test("e21 CUPED: adjustment conserves total conversions, reduces variance, theta finite") {
    val r = graft.ops.Behavior.cupedReadout(spark, sf0001).collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val (theta, ra, rb, vr) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(6))
    assert(nA > 0 && nB > 0)
    assert(!theta.isNaN && !theta.isInfinite)
    // ρ² = corr(x,y)² — a genuine variance-reduction fraction
    assert(vr > 0.0 && vr <= 1.0, s"var_reduction $vr outside (0,1]")
    // Σ(y − θ(x − x̄)) = Σy exactly: the arm-weighted adjusted rates
    // must reproduce the raw total conversion count
    val e20 = graft.ops.Behavior.abTestReadout(spark, sf0001).collect().head
    val totalConv = e20.getLong(1) + e20.getLong(4)
    assert(math.abs(nA * ra + nB * rb - totalConv) < 1e-2,
      s"CUPED broke mean conservation: ${nA * ra + nB * rb} vs $totalConv")
  }

  test("a23 overlap: Venn regions obey set algebra, totals match direct distinct counts") {
    val r = graft.ops.Behavior.audienceOverlap(spark, sf0001).collect().head
    val (n, nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (nvc, nvp, ncp, nall) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    // every pairwise intersection bounded by its sides and below by the
    // triple; union never exceeds the user population
    assert(nvc <= math.min(nv, nc) && nvp <= math.min(nv, np) &&
      ncp <= math.min(nc, np))
    assert(nall <= math.min(nvc, math.min(nvp, ncp)))
    assert(nv + nc + np - nvc - nvp - ncp + nall <= n)
    // cross-check one leg against an independent direct computation
    val ev = graft.Tables.events(spark, sf0001)
    val direct = ev.filter(col("event_type") === "view")
      .select("user_id").distinct()
      .intersect(ev.filter(col("event_type") === "purchase")
        .select("user_id").distinct()).count()
    assert(nvp == direct, s"n_view_purchase $nvp != direct $direct")
  }

  test("e22 DiD: all four cells populated, estimate recomputes from the cube") {
    val r = graft.ops.Behavior.didReadout(spark, sf0001).collect().head
    val (nap, napo, nbp, nbpo) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nap > 0 && napo > 0 && nbp > 0 && nbpo > 0,
      s"an (arm, period) cell is empty: $r")
    val (rap, rapo, rbp, rbpo) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    Seq(rap, rapo, rbp, rbpo).foreach(x => assert(x >= 0.0 && x <= 1.0))
    // DiD must be the double difference of the reported rates (to the
    // rounding the report applies)
    val did = (rapo - rap) - (rbpo - rbp)
    assert(math.abs(r.getDouble(9) - did) < 5e-6,
      s"did ${r.getDouble(9)} vs recomputed $did")
    // the midpoint launch day splits the span: both periods non-trivial
    assert(math.min(nap + nbp, napo + nbpo).toDouble /
      (nap + nbp + napo + nbpo) > 0.2, s"degenerate period split: $r")
  }

  test("f14 CIDR rollup: blocks partition the traffic, min/max stay inside each prefix") {
    val rows = graft.ops.Relational.ipCidrRollup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val total = graft.Tables.events(spark, sf0001).count()
    // the three blocks tile 10/8 and every fixture ip is inside it, so
    // classification must conserve events exactly (no drop, no double)
    assert(rows.map(_._2).sum == total,
      s"block rollup lost or duplicated events: ${rows.map(_._2).sum} vs $total")
    rows.foreach { case (cidr, _, lo, hi) =>
      val Array(baseStr, plenStr) = cidr.split("/")
      val base = baseStr.split("\\.").map(_.toLong)
        .reduce((a, b) => a * 256 + b)
      val plen = plenStr.toInt
      assert((lo >> (32 - plen)) == (base >> (32 - plen)), s"$cidr min $lo outside")
      assert((hi >> (32 - plen)) == (base >> (32 - plen)), s"$cidr max $hi outside")
    }
  }


  test("e23 Markov attribution: iterated hitting probabilities match the exact linear solve") {
    import org.apache.spark.sql.functions._
    // rebuild the same absorbing chain in test code
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._3.getTime, e._4)).map(_._5)
      val cut = ordered.indexOf("purchase")
      val path = (if (cut >= 0) ordered.take(cut + 1) else ordered)
        .map(t => if (t == "purchase") "CONV" else t)
      val full = "START" +: path
      full.sliding(2).foreach { case Array(a, b) =>
        trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
      }
      if (path.last != "CONV")
        trans((path.last, "NULL")) = trans.getOrElse((path.last, "NULL"), 0L) + 1
    }
    val totals = trans.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum.toDouble).toMap
    val states = totals.keys.toSeq.sorted
    val idx = states.zipWithIndex.toMap
    // exact hitting probability: solve (I - Q) p = b by Gaussian elim,
    // where Q is the chain restricted to transient states (a removed
    // channel's row AND column zeroed) and b the one-step CONV mass
    def exact(removed: String): Double = {
      val n = states.length
      val a = Array.ofDim[Double](n, n + 1)
      for (i <- 0 until n) {
        a(i)(i) = 1.0
        if (states(i) != removed) {
          trans.foreach { case ((s, t), c) if s == states(i) =>
            val pr = c / totals(s)
            if (t == "CONV") a(i)(n) += pr
            else if (t != "NULL" && t != removed && idx.contains(t))
              a(i)(idx(t)) -= pr
          case _ =>
          }
        }
      }
      for (c <- 0 until n) {
        val piv = (c until n).maxBy(r => math.abs(a(r)(c)))
        val tmp = a(c); a(c) = a(piv); a(piv) = tmp
        for (r <- 0 until n if r != c && math.abs(a(c)(c)) > 0) {
          val f = a(r)(c) / a(c)(c)
          for (k <- c to n) a(r)(k) -= f * a(c)(k)
        }
      }
      a(idx("START"))(n) / a(idx("START"))(idx("START"))
    }
    val base = exact("")
    assert(base > 0 && base < 1, s"degenerate base conversion $base")
    val got = graft.ops.Behavior.markovAttribution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // every channel: iterated removal effect == exact within truncation
    got.foreach { case (c, re, _) =>
      val exactRe = 1.0 - exact(c) / base
      assert(math.abs(re - exactRe) < 1e-5,
        s"channel $c: iterated $re vs exact $exactRe")
      assert(re >= -1e-9, s"removal can never HELP conversion: $c $re")
    }
    // shares are a normalization of the removal effects
    val sum = got.map(_._2).sum
    got.foreach { case (c, re, at) =>
      assert(math.abs(at - re / sum) < 1e-5, s"share off for $c")
    }
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4, "shares must sum to 1")
  }
}
