package graft

import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitter sketch (ops/SpaceSavingAggregator): the three
  * guarantees the heavy_hitters envelope relies on, checked against exact
  * brute-force counts under forced multi-partition merges — plus the
  * exact-regime degenerate case (capacity ≥ cardinality ⇒ the sketch IS
  * the exact count table).
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** Summary for `items` under `capacity`, forced through `parts`
    * partitions so the mergeable-summaries path actually runs. */
  private def summarize(items: Seq[String], capacity: Int, parts: Int) =
    items.toDF("x").repartition(parts)
      .agg(ops.SpaceSavingAggregator.column($"x", capacity).as("sk"))
      .collect()(0).getMap[String, org.apache.spark.sql.Row](0)

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("capacity >= cardinality: the sketch is exact with zero error") {
    val items = Seq.tabulate(300)(i => s"w${i % 7}")
    val sk = summarize(items, 16, 8)
    val ex = exact(items)
    assert(sk.keys.toSet == ex.keySet)
    sk.foreach { case (k, r) =>
      assert(r.getLong(0) == ex(k) && r.getLong(1) == 0L, s"$k: $r")
    }
  }

  test("guarantees hold under eviction pressure and skewed partitions") {
    // 3 genuine heavy hitters drowned in a long tail of singletons, dealt
    // round-robin across 8 partitions; capacity 8 << 203 distinct items.
    val items = Seq.fill(400)("hh1") ++ Seq.fill(250)("hh2") ++
      Seq.fill(120)("hh3") ++ (1 to 200).map(i => s"tail$i")
    val n = items.length.toLong
    val capacity = 8
    val sk = summarize(items, capacity, 8)
    val ex = exact(items)
    // (1)+(2): every summarized item brackets its true count
    sk.foreach { case (k, r) =>
      val (est, err) = (r.getLong(0), r.getLong(1))
      val t = ex.getOrElse(k, 0L)
      assert(est >= t, s"$k under-estimated: est=$est true=$t")
      assert(est - err <= t, s"$k bound broken: est=$est err=$err true=$t")
    }
    // (3): every true heavy hitter (> N/capacity) is present
    ex.filter { case (_, c) => c * capacity > n }.keys.foreach { k =>
      assert(sk.contains(k), s"true heavy hitter $k evicted")
    }
    assert(sk.size <= capacity)
  }

  test("summary is deterministic across runs (total-ordered tie-breaks)") {
    val items = (1 to 64).flatMap(i => Seq.fill(3)(s"t$i")) // all tied
    val a = summarize(items, 8, 8).mapValues(r => (r.getLong(0), r.getLong(1))).toMap
    val b = summarize(items, 8, 8).mapValues(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
