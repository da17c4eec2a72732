package graft

import graft.core.{StageMetrics, Tables}

/** Shuffle-economy audit main: for every SparkEntry query, measure the
  * task-metric bytes it actually moves — shuffle write/read, spill — at TWO
  * scale factors, and report each query's shuffle GROWTH against the data's
  * row growth, one JSON line per query plus a summary line.
  *
  * Why growth and not a bytes ratio: wall-clock timings (Bench) say how
  * fast a query IS at sf0.1; byte accounting says how fast it STAYS as
  * data grows. The natural ratio — shuffle bytes per input byte — is
  * unmeasurable here because the local vectorized parquet reader bypasses
  * the Hadoop statistics that feed `inputMetrics.bytesRead` (a full
  * 150k-row scan reports ~3.5 KB; see StageMetrics' trust-boundary note).
  * Comparing shuffle bytes at sf0.01 vs sf0.1 against the measured row
  * growth needs no input-byte accounting and answers the 100 TB question
  * directly: sub-linear growth = the shuffle carries aggregates/candidates
  * (output-bound — safe); ~linear = the shuffle carries the data once
  * (safe if the shape needs it); super-linear = a pair generator or
  * fan-out outrunning the data — the thing that kills a 100× scale-up.
  * Spill must be 0 at BOTH sfs; any non-zero value means a partition
  * outgrew its memory budget at 1/1000th of target scale.
  *
  * Both cache tiers are warmed first (same steady state as Bench), so
  * queries that read session artifacts charge only their own probe work.
  *
  * Usage:
  *   sbt "runMain graft.ShuffleAudit"            # sf0.01 → sf0.1
  *   SPARK_GRAFT_SF_DIR=...      target sf dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_SF_BASE=...     base sf dir   (default /root/testdata/sf0.01)
  * Optional arg: query-name substring filter.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    // comma-list of name substrings (empty = the whole board): big rungs
    // audit a targeted subset, and one substring cannot name one
    val filters = args.headOption.getOrElse("").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    Bench.warmAll(spark, base)
    Bench.warmAll(spark, target)

    // The yardstick: fact-table row growth between the two dirs (every
    // table the generator scales; dims like region/nation stay fixed).
    val rowsGrowth = {
      val facts = Seq("orders", "lineitem", "events", "documents", "embeddings")
      val b = facts.map(t => Tables.load(spark, base, t).count()).sum
      val t = facts.map(t => Tables.load(spark, target, t).count()).sum
      t.toDouble / b
    }

    val sm = StageMetrics.attach(spark)
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): StageMetrics.Delta = {
      // First run pays planning/codegen and any residual cache fill; the
      // measured second run is the steady-state shuffle profile.
      fn(spark, dir).count(): Unit
      sm.measure { fn(spark, dir).count(): Unit }
    }

    // Below this, growth is dominated by fixed per-stage framing bytes
    // (empty-partition map outputs), not data.
    val NoiseFloor = 64L << 10
    var failed = List.empty[String]
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (filters.nonEmpty && !filters.exists(name.contains)) None
      else try {
        val b = once(fn, base)
        val t = once(fn, target)
        val growth =
          if (t.shuffleWriteBytes < NoiseFloor) "\"flat\""
          else fmt(t.shuffleWriteBytes.toDouble / math.max(1L, b.shuffleWriteBytes))
        // records ride beside bytes: byte growth conflates row growth with
        // shuffle-block compressibility (a 10x term dictionary compresses
        // worse under LZ4), so a super-linear BYTES suspect is adjudicated
        // on RECORDS — rows moved is the plan's quantity, bytes the data's
        println(s"""{"query":"$name","base":{"shuffle_write":${b.shuffleWriteBytes},""" +
          s""""shuffle_write_records":${b.shuffleWriteRecords},""" +
          s""""shuffle_read":${b.shuffleReadBytes},"spill":${b.spillBytes},""" +
          s""""input_records":${b.inputRecords}},""" +
          s""""target":{"shuffle_write":${t.shuffleWriteBytes},""" +
          s""""shuffle_write_records":${t.shuffleWriteRecords},""" +
          s""""shuffle_read":${t.shuffleReadBytes},"spill":${t.spillBytes},""" +
          s""""input_records":${t.inputRecords}},""" +
          s""""shuffle_growth":$growth,"shuffle_records_growth":${
            fmt(t.shuffleWriteRecords.toDouble / math.max(1L, b.shuffleWriteRecords))}}""")
        Some(name -> ((b, t)))
      } catch {
        case e: Throwable =>
          System.err.println(s"[shuffle-audit] $name FAILED: ${e.getMessage}")
          failed ::= name
          None
      }
    }
    sm.close()

    val spillers = rows.collect {
      case (n, (b, t)) if b.spillBytes > 0 || t.spillBytes > 0 => n
    }
    val superlinear = rows.collect {
      case (n, (b, t))
        if t.shuffleWriteBytes >= NoiseFloor &&
          t.shuffleWriteBytes.toDouble / math.max(1L, b.shuffleWriteBytes) >
            rowsGrowth * 1.3 => n
    }
    def names(ns: Seq[String]) = ns.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"shuffle_audit","queries":${rows.size},""" +
      s""""rows_growth":${fmt(rowsGrowth)},""" +
      s""""total_shuffle_write_base":${rows.map(_._2._1.shuffleWriteBytes).sum},""" +
      s""""total_shuffle_write_target":${rows.map(_._2._2.shuffleWriteBytes).sum},""" +
      s""""total_spill":${rows.map(r => r._2._1.spillBytes + r._2._2.spillBytes).sum},""" +
      s""""spilling_queries":${names(spillers)},""" +
      s""""superlinear_suspects":${names(superlinear)},""" +
      s""""failed":${names(failed.reverse)},"base":"$base","target":"$target"}""")
    spark.stop()
  }
}
