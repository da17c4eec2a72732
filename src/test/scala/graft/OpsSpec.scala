package graft

import org.apache.spark.sql.functions._

import graft.ops.Ops._

/** Semantics-ledger goldens (SURVEY §7.4): the cross-engine traps are pinned
  * here so a refactor can't silently reintroduce them. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("isWeekend translates Postgres DOW (Sun=0/Sat=6) to Spark dayofweek (§7.4.2)") {
    // 2024-01-06 = Saturday, 2024-01-07 = Sunday, 2024-01-08 = Monday
    val df = Seq("2024-01-06", "2024-01-07", "2024-01-08").toDF("d")
      .select(isWeekend(to_timestamp($"d")).as("w"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, true, false))
  }

  test("isNight: compat mode replicates the reference's vacuous BETWEEN 22 AND 6 (§7.4.1)") {
    val hours = Seq("2024-01-01 23:30:00", "2024-01-01 03:00:00",
      "2024-01-01 12:00:00", "2024-01-01 22:00:00")
    val ts = hours.toDF("t").select(to_timestamp($"t").as("t"))
    val intent = ts.select(isNight($"t").as("n")).collect().map(_.getBoolean(0)).toSeq
    val compat = ts.select(isNight($"t", compat = true).as("n")).collect().map(_.getBoolean(0)).toSeq
    assert(intent == Seq(true, true, false, true))
    assert(compat == Seq(false, false, false, false)) // h>=22 AND h<=6: always false
  }

  test("unionDistinct deduplicates (Spark union is UNION ALL — §7.4.9)") {
    val a = Seq(1L, 2L).toDF("user_id")
    val b = Seq(2L, 3L).toDF("user_id")
    assert(unionDistinct(a, b).count() == 3)
  }

  test("deterministicMode breaks ties by smallest value") {
    val df = Seq((1L, "b"), (1L, "a"), (1L, "a"), (1L, "b"), (2L, "z")).toDF("k", "v")
    val m = deterministicMode(df, "k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "z")) // count tie a/b → 'a' (smallest)
  }

  test("topOnePerKey picks by total order") {
    val df = Seq((1L, 10, "old"), (1L, 20, "new"), (2L, 5, "only")).toDF("k", "t", "v")
    val top = topOnePerKey(df, Seq($"k"), Seq($"t".desc))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top == Map(1L -> "new", 2L -> "only"))
  }

  test("sumMoney is exact decimal (order-independent) while double sum is not guaranteed") {
    val vals = Seq.fill(1000)(0.1) ++ Seq.fill(1000)(123456.78)
    val df = vals.toDF("amount")
    val got = df.agg(sumMoney(lit(true), $"amount")).collect()(0).getDouble(0)
    assert(got == 123456880.0) // 1000*0.1 + 1000*123456.78, exact in decimal
  }

  test("ratio guards zero denominators with NULLIF (F3)") {
    val df = Seq((0L, 0L), (1L, 4L)).toDF("n", "d")
    val r = df.select(ratio($"n", $"d").as("r")).collect().map(x => Option(x.get(0)))
    assert(r(0).isEmpty && r(1).contains(0.25))
  }
}
