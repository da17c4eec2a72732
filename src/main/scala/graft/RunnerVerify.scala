package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.core.Roles
import graft.jobs.{DailyBatchRunner, MigrationRunner,
  IncrementalNightlyRunner => Nightly}
import graft.oracle.OracleSql

/** Big-rung adjudication of the PERSISTED nightly runner (VERDICT r13 next
  * #2): the ladder QUERIES pass the DuckDB oracle at ×10/×30, but the
  * product path — date-partitioned landings → bootstrap → nights with
  * parquet state round-trips and pointer-swapped user folds → publish —
  * was only cell-compared against full recompute at sf0.001/sf0.01.
  *
  * This main runs that whole path end-to-end at a rung and dumps the four
  * PUBLISHED surfaces (the three migrated store CURRENTs + the exported
  * feature_view) in Verify's outDir format, with oracle_sql.json carrying
  * the SAME full-recompute SQL the board queries use — so tools/check.py
  * adjudicates the runner's published features exactly the way it
  * adjudicates the board:
  *
  *   sbt "runMain graft.RunnerVerify /tmp/graft-x10 /tmp/runner_work /tmp/runner_out"
  *   python3 tools/check.py /tmp/graft-x10 /tmp/runner_out
  */
object RunnerVerify {

  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      s"usage: RunnerVerify <sfDir> <workDir> <outDir>; got ${args.toSeq}")
    val (sfDir, work, outDir) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // clean slate: a leftover state root would skip folds via the
    // exactly-once markers and adjudicate a stale night
    val workPath = new org.apache.hadoop.fs.Path(work)
    val workFs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (workFs.exists(workPath)) workFs.delete(workPath, true)

    // the production landing layout, via the runner's own shared builder
    def land(name: String, df: DataFrame, tsCol: String): DataFrame =
      Nightly.landEventDay(df, tsCol, s"$work/landing/$name")
    val src = Nightly.Sources(
      transactions = land("transactions", Roles.transactions(spark, sfDir), "created_at"),
      payments = land("payments", Roles.payments(spark, sfDir), "created_at"),
      logins = land("logins", Roles.userLogins(spark, sfDir), "created_at"),
      alerts = land("alerts", Roles.velocityAlerts(spark, sfDir), "created_at"),
      credit = land("credit", Roles.creditReports(spark, sfDir), "report_date"),
      scores = land("scores", Roles.riskScores(spark, sfDir), "computed_at"),
      users = Roles.users(spark, sfDir))

    val out = s"$work/published"
    val res = Nightly.runIncremental(spark, src, s"$work/state", out,
      DailyBatchRunner.Thresholds(1, 1, 1))
    System.err.println(s"[runner-verify] published $res")

    // dump the PUBLISHED surfaces — what a downstream consumer reads —
    // not the in-session frames the spec already covers
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: DataFrame): Unit =
      SparkEntry.canon(df).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    dump("runner_user_features",
      MigrationRunner.current(spark, s"$out/user_features"))
    dump("runner_transaction_features",
      MigrationRunner.current(spark, s"$out/transaction_features"))
    dump("runner_risk_features",
      MigrationRunner.current(spark, s"$out/risk_features"))
    // partition_date is the injected run stamp, not part of the view SQL
    dump("runner_feature_view",
      spark.read.parquet(s"$out/feature_view").drop("partition_date"))

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = Map(
      "runner_user_features" -> OracleSql.userFeatures(),
      "runner_transaction_features" -> OracleSql.transactionFeatures(),
      "runner_risk_features" -> OracleSql.riskFeatures(),
      "runner_feature_view" -> OracleSql.featureView())
    val json = oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
