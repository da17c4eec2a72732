package graft

/** Dev measurement main: the BPE training-loop ladder (VERDICT r10 item 6).
  * bpeLearn's cost is dominated by the per-merge Spark round-trip (one
  * distributed aggregate + one collect per merge), so wall-time vs merges
  * is the metric — and bpeLearnBatched's whole point is cutting rounds
  * while learning the EXACT same list (VocabSpec pins equality; this main
  * re-asserts it on the measured corpus so a perf number can never come
  * from a diverged vocabulary). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt "runMain graft.BpeBench 256 16"
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val merges = if (args.nonEmpty) args(0).toInt else 256
    val batch = if (args.length > 1) args(1).toInt else 16
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.count(): Unit // warm the scan

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def row(label: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      // batched runs FIRST so JIT warm-up bias, if any, favors the
      // sequential baseline — conservative for the speedup claim
      val ((batList, rounds), batSec) =
        time(ext.Vocab.bpeLearnBatchedCounted(corpus, merges, batch))
      val (seqList, seqSec) = time(ext.Vocab.bpeLearn(corpus, merges))
      require(seqList == batList,
        s"batched list diverged — perf number void (seq=${seqList.take(5)}… bat=${batList.take(5)}…)")
      println(f"[bpe-bench] $label merges=${seqList.length} batch=$batch " +
        f"sequential=$seqSec%.1f s (${seqList.length} rounds) " +
        f"batched=$batSec%.1f s ($rounds rounds) " +
        f"speedup=${seqSec / batSec}%.1f x per-merge-floor=${seqSec / seqList.length * 1000}%.0f ms")
    }
    // the testdata corpus: a 31-word near-UNIFORM vocabulary — the
    // tie-trim's worst case (pair counts collide constantly, batches trim
    // to ~1 merge/round; this floor-tests graceful decay to sequential)
    row(s"uniform($sfDir)", docs)
    // natural-text shape: a deterministic 2000-word vocabulary (base-26
    // hash strings, 5-9 chars) under Zipf frequencies — top pair counts
    // are DISTINCT, so the strict-drop boundary almost always holds and
    // batches accept near-fully. This is the corpus class BPE actually
    // trains on; the uniform row above is the adversarial floor.
    val zipfVocab = (0 until 2000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val len = 5 + (h % 5).toInt
      val sb = new StringBuilder
      var x = h
      (0 until len).foreach { _ => sb.append(('a' + (x % 26)).toChar); x = x / 26 + i }
      sb.toString
    }.distinct
    val zipfText = zipfVocab.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(math.max(1, 20000 / (i + 1)))(w)
    }.mkString(" ")
    row(s"zipf(${zipfVocab.length} words)", Seq(zipfText).toDF("text"))
    spark.stop()
  }
}
