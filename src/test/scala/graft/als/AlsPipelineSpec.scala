package graft.als

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Ratings

/** End-to-end ALS semantics (SURVEY.md §5 items 2/4): RMSE band, ALS beats
  * the item-average baseline, cold-start drop, manual-predict parity.
  * Fixture: seeded low-rank + noise ratings (FIXTURES.md A2).
  */
class AlsPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** ~60 users × ~80 items, rank-3 structure + noise, ratings clipped to
    * the MovieLens 0.5..5 domain (value 0 never occurs — observed-entries
    * semantics, ALS.java:160,177).
    */
  lazy val fixture: DataFrame = {
    val rnd = new Random(1)
    val k = 3
    val uf = Array.fill(60, k)(rnd.nextGaussian() * 0.6)
    val mf = Array.fill(80, k)(rnd.nextGaussian() * 0.6)
    val rows = for {
      u <- 0 until 60; i <- 0 until 80 if rnd.nextDouble() < 0.25
    } yield {
      val dot = (0 until k).map(j => uf(u)(j) * mf(i)(j)).sum
      val r = math.max(0.5, math.min(5.0, 3.0 + dot + rnd.nextGaussian() * 0.3))
      (u, i, r.toFloat)
    }
    rows.toDF("user", "item", "rating").cache()
  }

  test("ALS beats the item-average baseline and lands in a sane RMSE band") {
    val (train, probe) = Ratings.trainProbeSplit(fixture)
    val model = AlsPipeline.fit(train, AlsPipeline.Config(rank = 8, maxIter = 10, regParam = 0.065))
    val als = AlsPipeline.rmse(model, probe)
    val base = AlsPipeline.itemAvgBaselineRmse(train, probe)
    assert(als < base, s"ALS rmse $als not below baseline $base")
    assert(als > 0.1 && als < 1.2, s"rmse $als outside sanity band")
  }

  test("cold-start probe ids are dropped (containsKey guard, ALS.java:460)") {
    val train = fixture
    val model = AlsPipeline.fit(train, AlsPipeline.Config(rank = 4, maxIter = 2))
    val probeWithCold = Seq((0, 0, 3f), (9999, 0, 3f), (0, 8888, 3f)).toDF("user", "item", "rating")
    val pred = model.transform(probeWithCold)
    assert(pred.count() == 1) // only the fully-known pair survives
  }

  test("manual join+dot predict matches ALSModel.transform to fp tolerance") {
    val model = AlsPipeline.fit(fixture, AlsPipeline.Config(rank = 4, maxIter = 3))
    val viaModel = model.transform(fixture)
      .select($"user", $"item", $"prediction".as("p_model"))
    val manual = AlsPipeline.predictManual(model.userFactors, model.itemFactors, fixture)
      .select($"user", $"item", $"prediction".as("p_manual"))
    val maxDiff = viaModel.join(manual, Seq("user", "item"))
      .agg(max(abs($"p_model" - $"p_manual"))).head().getDouble(0)
    assert(maxDiff < 1e-4, s"manual predict diverges: $maxDiff")
  }

  test("factor matrices have reference shape: (id, features[k])") {
    val model = AlsPipeline.fit(fixture, AlsPipeline.Config(rank = 5, maxIter = 2))
    val uf = model.userFactors
    assert(uf.columns.toSeq == Seq("id", "features"))
    assert(uf.select(size($"features")).distinct().head().getInt(0) == 5)
    assert(uf.count() == fixture.select("user").distinct().count())
  }

  test("reference configuration end-to-end: rank=20, maxIter=10, λ=0.065 (ALS.java:52-57)") {
    val a = AlsPipeline.artifacts(spark, sf0001)
    assert((a.rank, a.maxIter, a.regParam) == ((20, 10, 0.065)),
      "artifacts must be trained at the reference's published hyperparameters")
    assert(a.alsRmse < a.baseRmse,
      s"reference-config ALS rmse ${a.alsRmse} not below item-avg baseline ${a.baseRmse}")
    assert(a.maxAbsDiff < 1e-4, s"predict parity diverges: ${a.maxAbsDiff}")
    // persisted artifacts: /U, /M factor parquet (ALS.java:312-327) + rmse.txt (:411-419)
    for (m <- Seq("U", "M")) {
      val f = spark.read.parquet(s"${a.dir}/$m")
      assert(f.columns.toSeq == Seq("id", "features"))
      assert(f.select(size($"features")).distinct().head().getInt(0) == 20)
    }
    val rmseTxt = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"${a.dir}/rmse.txt")).trim.toDouble
    assert(math.abs(rmseTxt - a.alsRmse) < 1e-12)
  }

  test("recommend top-k matches an exact local rescore of the persisted factors") {
    val a = AlsPipeline.artifacts(spark, sf0001)
    val got = AlsPipeline.alsRecommend(spark, sf0001, numUsers = 5, k = 5).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val uf = spark.read.parquet(s"${a.dir}/U").orderBy("id").limit(5).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val mf = spark.read.parquet(s"${a.dir}/M").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    def dot(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
    val want = uf.flatMap { case (u, f) =>
      mf.map { case (i, g) => (u, i, dot(f, g)) }
        .sortBy { case (_, i, s) => (-s, i) }
        .take(5).zipWithIndex
        // HALF_UP on the decimal repr — Spark's round(col, 6), NOT rint
        .map { case ((_, i, s), r) =>
          (u, r + 1, i,
            BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("duplicate (user,item) observations collapse before training (O2 semantics)") {
    val dup = Seq((1, 1, 2f), (1, 1, 4f), (2, 1, 3f)).toDF("user", "item", "rating")
    val collapsed = dup.groupBy("user", "item").agg(avg("rating").cast("float").as("rating"))
    assert(collapsed.count() == 2)
    val r11 = collapsed.filter($"user" === 1 && $"item" === 1).head().getFloat(2)
    assert(r11 == 3f)
  }

  test("implicit ALS: ranks the holdout better than popularity, factors well-formed, rerun-deterministic") {
    val a = AlsPipeline.computeImplicit(spark, sf0001)
    // the personalized model must clear the popularity bar on the
    // strength-weighted mean percentile rank (lower = better)
    assert(a.mprAls < a.mprPop,
      s"ALS MPR ${a.mprAls} does not beat popularity ${a.mprPop}")
    assert(a.mprAls < 0.5, s"ALS MPR ${a.mprAls} is not better than random")
    assert(a.factorsOk, "factor matrices malformed (shape or non-finite)")
    assert(a.uRows > 0 && a.mRows > 0)
    assert(a.nTrain > 0 && a.nHold > 0 && a.nUsersEval > 0)
    // fixed seed + md5-bucket split ⇒ a fresh fit reproduces everything
    val b = AlsPipeline.computeImplicit(spark, sf0001)
    assert(a == b, "implicit fit not rerun-deterministic under fixed seed")
  }

  test("item-item sims: ranking well-formed and equals an exact local rescore of M") {
    val out = AlsPipeline.alsItemSims(spark, sf0001, numItems = 5, k = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 5)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 3), s"item $q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      assert(sorted.forall(t => t._3 != q && math.abs(t._4) <= 1.0 + 1e-9))
    }
    // independent local rescore on the same persisted factors
    val m = spark.read.parquet(s"${AlsPipeline.artifacts(spark, sf0001).dir}/M")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val qIds = m.keySet.toSeq.sorted.take(5)
    qIds.foreach { q =>
      val expect = m.keySet.toSeq.filter(_ != q)
        .map(n => (n, cos(m(q), m(n))))
        .sortBy { case (n, c) => (-c, n) }.take(3)
      val got = byQ(q).sortBy(_._2)
      expect.zip(got).foreach { case ((en, ec), (_, _, gn, gc)) =>
        assert(en == gn, s"item $q neighbor order")
        assert(math.abs(ec - gc) < 1e-6, s"item $q score")
      }
    }
  }

  test("als_eval: ideal ranker scores exactly 1, rankers near-ideal and in range, rerun-stable") {
    import org.apache.spark.sql.functions._
    // metric certification: ranking by the TRUE rating is the ideal
    // permutation — NDCG must be exactly 1 for every user
    val scored = AlsPipeline.evalScored(spark, sf0001).cache()
    val idealRows = AlsPipeline.meanNdcg(scored, "rating", 10).collect()
    assert(idealRows.nonEmpty)
    idealRows.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12,
        s"ideal ranker NDCG ${r.getDouble(1)} != 1 for user ${r.get(0)}"))
    val r = AlsPipeline.alsEvalRanking(spark, sf0001).collect().head
    val (n, nm, np, lift) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(n > 0, "no evaluable users")
    assert(nm > 0.0 && nm <= 1.0, s"ndcg_model $nm out of range")
    assert(np > 0.0 && np <= 1.0, s"ndcg_pop $np out of range")
    // the PREFERENCE fixture plants a user-segment × item-cluster
    // affinity popularity cannot express: the personalized model must
    // BEAT the popularity baseline (round-12 verdict item 7 — the
    // additive fixture gave no headroom and lift hovered at −0.001)
    assert(lift > 0.0, s"no personalization lift on the planted fixture: " +
      s"model $nm vs popularity $np")
    assert(nm > 0.7, s"model far from ideal: $nm")
    assert(math.abs(lift - math.rint((nm - np) * 1e6) / 1e6) < 2e-6)
    val again = AlsPipeline.alsEvalRanking(spark, sf0001).collect().head
    assert(again.getDouble(1) == nm && again.getDouble(2) == np,
      "eval not rerun-stable")
  }

  test("als_sweep_refit closes the selection loop: grid winner, shipped NDCG never below the incumbent, memo-identical reruns") {
    import org.apache.spark.sql.functions._
    val r = AlsPipeline.alsSweepRefit(spark, sf0001).collect().head
    val (bestRank, bestReg) = (r.getInt(0), r.getDouble(1))
    val (sweepNdcg, refitNdcg) = (r.getDouble(2), r.getDouble(3))
    val (ndcgD, shipped) = (r.getDouble(4), r.getDouble(5))
    val keptDefault = r.getBoolean(6)
    // the winner cell is from the declared grid
    assert(Seq(2, 8).contains(bestRank) && Seq(0.01, 0.1).contains(bestReg),
      s"winner ($bestRank, $bestReg) outside the declared grid")
    Seq(sweepNdcg, refitNdcg, ndcgD, shipped).foreach(v =>
      assert(v > 0.0 && v <= 1.0, s"NDCG $v out of range"))
    // the selection loop's shipping contract: what ships is NEVER worse
    // than the incumbent default config — either the refit beat it, or
    // the loop kept the default (and says so)
    assert(shipped >= ndcgD,
      s"loop shipped worse than the incumbent: $shipped < $ndcgD")
    assert(shipped == math.max(refitNdcg, ndcgD))
    assert(keptDefault == (refitNdcg < ndcgD))
    // the winner itself must still be a competent ranker (the eval
    // spec's far-from-random floor) — measured on this fixture the
    // budget-selected cell refits to ~0.957 while the incumbent sits at
    // ~0.983, which is exactly WHY the incumbent guard exists: budget
    // fits are a noisy selector, and the loop must absorb that, not
    // ship it
    assert(refitNdcg > 0.7, s"winner far from competent: $refitNdcg")
    // memo identity: a rerun reads the staged row, never refits
    val again = AlsPipeline.alsSweepRefit(spark, sf0001).collect().head
    assert(again.toSeq == r.toSeq, "sweep_refit not memo-identical")
  }

  test("adaptive blocks clamp: ~50k ratings/block, never below 10 or above 256") {
    assert(AlsPipeline.adaptiveBlocks(0L) == 10)          // tiny SF: floor
    assert(AlsPipeline.adaptiveBlocks(500000L) == 10)     // bench scale: the measured optimum
    assert(AlsPipeline.adaptiveBlocks(5000000L) == 100)   // 10× SF: scales with data
    assert(AlsPipeline.adaptiveBlocks(100000000L) == 256) // ceiling: cluster re-tunes
  }
}
