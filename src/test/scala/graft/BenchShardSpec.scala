package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench sharding invariants — pure name arithmetic, no Spark session. */
class BenchShardSpec extends AnyFunSuite {

  test("every declared query lands in exactly one known shard") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.nonEmpty)
    names.foreach { n =>
      val sh = Bench.shardOf(n)
      assert(Bench.shardNames.contains(sh), s"$n mapped to unknown shard $sh")
    }
    // the heavy families are genuinely isolated from the rest
    assert(names.filter(_.startsWith("st")).forall(Bench.shardOf(_) == "st"))
    assert(names.filter(_.matches("^v\\d.*")).forall(Bench.shardOf(_) == "v"))
    assert(names.filter(_.matches("^g\\d.*")).forall(Bench.shardOf(_) == "g"))
    assert(names.filter(_.matches("^(d|dq)\\d.*")).forall(Bench.shardOf(_) == "d"))
    assert(names.filter(_.startsWith("als")).forall(Bench.shardOf(_) == "als"))
    assert(names.filter(_.matches("^t\\d.*")).forall(Bench.shardOf(_) == "t"))
    assert(names.filter(_.matches("^(up|cat|src)\\d.*"))
      .forall(Bench.shardOf(_) == "lake"))
    // membership is a partition: shard sizes sum to the full surface
    val bySh = names.groupBy(Bench.shardOf)
    assert(bySh.values.map(_.size).sum == names.size)
    // no shard is empty and no shard holds the whole surface
    Bench.shardNames.foreach { sh =>
      assert(bySh.getOrElse(sh, Nil).nonEmpty, s"shard $sh is empty")
      assert(bySh(sh).size < names.size, s"shard $sh holds everything")
    }
  }
}
