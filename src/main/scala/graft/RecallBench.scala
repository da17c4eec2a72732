package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.Similarity

/** ANN quality harness: measures recall@k of every approximate
  * similarity path against the exact brute-force baseline on the real
  * embeddings table — the number that decides whether an ANN index is
  * usable, published in PERF.md. Prints ONE JSON line:
  * {"metric":"recall_at_k","k":10,"queries":100,"paths":{...}}.
  *
  * Recall@k = |ANN top-k ∩ exact top-k| / (queries × k), the standard
  * definition (ties broken identically in both paths by rankTopK's
  * (cosine desc, neighbor_id asc) total order, so the intersection is
  * well-defined).
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)

    val numQueries = 100
    val k = 10

    /** recall@k of every ANN path on one embedding table. */
    def measure(emb: DataFrame): Seq[(String, Double)] = {
      val exact = Similarity.bruteTopK(emb, numQueries, k)
        .select("query_id", "neighbor_id").cache()
      val denom = exact.count().toDouble
      def recall(ann: DataFrame): Double = {
        val hit = ann.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        math.round(hit / denom * 10000.0) / 10000.0
      }
      val out = Seq(
        "ivf_nprobe1" -> Similarity.ivfTopK(emb, numQueries, k, nLists = 16, nprobe = 1),
        "ivf_nprobe2" -> Similarity.ivfTopK(emb, numQueries, k, nLists = 16, nprobe = 2),
        "ivf_nprobe4" -> Similarity.ivfTopK(emb, numQueries, k, nLists = 16, nprobe = 4),
        "sq8"         -> Similarity.quantizedTopK(emb, numQueries, k)
      ).map { case (name, df) => name -> recall(df) }
      exact.unpersist()
      out
    }

    // The corpus embeddings are md5-derived near-uniform vectors — the
    // adversarial no-structure case where recall ≈ nprobe/nLists by
    // construction. The planted-cluster table (DataGen.clusteredVectors,
    // cluster size 20 > k, members at cosine ≥ 0.99) is the distribution
    // IVF's premise assumes: true neighbors co-locate, so probing the
    // right cell recovers most of the top-k. Publishing both shows what
    // the index earns where its premise holds and what it costs where it
    // doesn't.
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    val uniform = measure(emb)
    val clustered = measure(
      graft.core.DataGen.clusteredVectors(spark, nVec, clusterSize = 20, dim = 64))

    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (n, r) => "\"" + n + "\":" + r }.mkString("{", ",", "}")
    println(s"""{"metric":"recall_at_k","k":$k,"queries":$numQueries,""" +
      s""""paths":${fmt(uniform)},"clustered_paths":${fmt(clustered)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
