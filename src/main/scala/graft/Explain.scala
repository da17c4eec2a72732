package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected queries
  * so scan pushdown, join strategies, and codegen spans can be reviewed
  * (the "is this the plan you'd want at 100 TB" loop).
  *
  *   sbt "runMain graft.Explain sf0.01 transaction_features point_lookup"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = s"/root/testdata/${if (args.nonEmpty) args(0) else "sf0.01"}"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val spark = graft.core.Sessions.local("4", logLevel = "ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
