package graft

import org.apache.spark.sql.functions._

/** Dev measurement main: the PitJoin hot-key salting crossover (VERDICT
  * r10 item 3). The wide-matrix window hashes on the key alone, so a
  * pathologically hot key's whole timeline sorts on ONE task (AQE skew
  * handling never applies to windows); `salts` splits that timeline across
  * tasks at the cost of replicating fact rows per salt. This measures
  * both sides of that trade on a 95%-hot frame and a uniform control, and
  * cross-checks output equality via a column checksum so a speedup can
  * never come from a diverged result. Usage:
  *
  *   sbt "runMain graft.PitSaltBench 2000000 500000 8"
  */
object PitSaltBench {
  def main(args: Array[String]): Unit = {
    val nFacts = if (args.nonEmpty) args(0).toLong else 2000000L
    val nProbes = if (args.length > 1) args(1).toLong else 500000L
    val salts = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)

    // md5-keyed uniform in [0,1) — deterministic, no rand()
    def u(tag: String) = conv(substring(md5(concat(lit(tag + "|"),
      col("id").cast("string"))), 1, 8), 16, 10).cast("double") / 4.294967296e9

    def key(hot: Boolean) =
      if (hot) when(u("k") < 0.95, 0L).otherwise(pmod(col("id"), lit(1000L)))
      else pmod(col("id"), lit(1000L))
    def frame(n: Long, hot: Boolean, tsTag: String) = spark.range(n).select(
      key(hot).as("user_id"),
      timestamp_seconds(lit(1704067200L) + (u(tsTag) * 2592000.0).cast("long")).as("ts"),
      col("id"))

    def facts(hot: Boolean) = frame(nFacts, hot, "ft").select(
      col("user_id"), col("ts").as("fact_ts"), col("id").as("fact_id"),
      (u("v") * 100.0).as("score"), concat(lit("g"), pmod(col("id"), lit(7))).as("grade"))
    def probes(hot: Boolean) = frame(nProbes, hot, "pt").select(
      col("user_id"), col("ts").as("probe_ts"), col("id").as("probe_id"))

    def matrix(hot: Boolean, s: Int, rangeSecs: Long = 0) =
      graft.ops.PitJoin.trainingMatrixWide(probes(hot), "user_id", "probe_ts",
        "probe_id", Seq(graft.ops.PitJoin.WideFact(facts(hot), "user_id",
          "fact_ts", "fact_id", Seq("score", "grade"),
          expr("INTERVAL 10 DAYS"))), s, rangeSecs)

    // order-independent checksum over every output cell: equal outputs ⇒
    // equal sums (xxhash64 per row, summed)
    def checksum(hot: Boolean, s: Int, rangeSecs: Long = 0): java.math.BigDecimal =
      matrix(hot, s, rangeSecs).select(sum(xxhash64(col("probe_id"), col("user_id"),
        col("probe_ts"), col("score"), col("grade")).cast("decimal(38,0)")).as("c"))
        .head.getDecimal(0)

    // the TIMED action is the checksum itself, for two reasons: (a) it
    // references every output column, so no part of the fill can be
    // pruned out from under the measurement (count()-timed runs of this
    // bench measured implausibly flat across a 10x size sweep; the exact
    // short-circuit was never pinned down — plan dumps DO show the
    // Window surviving count() — so the bench times an action whose
    // result PROVES the work happened instead), and (b) the checksum is
    // the output-equality witness, so one action serves both purposes
    def timed(body: => java.math.BigDecimal): (java.math.BigDecimal, Double) = {
      val t0 = System.nanoTime(); val c = body
      (c, (System.nanoTime() - t0) / 1e9)
    }
    // 1-day ranges over the generator's 30-day ts window: the hot key's
    // timeline splits over ~30 tasks with no replication
    val rangeSecs = 86400L
    // warm EVERY flavor (hot AND uniform) — timing the first uniform run
    // cold would inflate the uniform baseline with plan/codegen cost, the
    // same protocol error round 11 retracted in the monitor-tax ledger
    checksum(hot = true, 1): Unit
    checksum(hot = true, salts): Unit
    checksum(hot = true, 1, rangeSecs): Unit
    checksum(hot = false, 1): Unit
    checksum(hot = false, salts): Unit
    checksum(hot = false, 1, rangeSecs): Unit
    val (c1, hot1) = timed(checksum(hot = true, 1))
    val (cS, hotS) = timed(checksum(hot = true, salts))
    val (cR, hotR) = timed(checksum(hot = true, 1, rangeSecs))
    val (_, uni1) = timed(checksum(hot = false, 1))
    val (_, uniS) = timed(checksum(hot = false, salts))
    val (_, uniR) = timed(checksum(hot = false, 1, rangeSecs))
    require(c1 == cS, "salted output diverged — perf numbers void")
    require(c1 == cR, "ranged output diverged — perf numbers void")
    println(f"""{"metric":"pit_salt","facts":$nFacts,"probes":$nProbes,"salts":$salts,""" +
      f""""hot95_salt1":$hot1%.2f,"hot95_salt$salts":$hotS%.2f,""" +
      f""""hot95_ranged1d":$hotR%.2f,""" +
      f""""uniform_salt1":$uni1%.2f,"uniform_salt$salts":$uniS%.2f,""" +
      f""""uniform_ranged1d":$uniR%.2f}""")
    spark.stop()
  }
}
