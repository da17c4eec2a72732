package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Corpus, Similarity, TextAnalysis}

/** Empirical scaling harness: measures the five heaviest corpus queries at
  * ×1 / ×2 / ×5 data and reports measured growth against the near-linear
  * prediction — the evidence (vs. assertion) that the plan shapes pinned in
  * ScaleShapeSpec actually hold as data grows. Published in PERF.md.
  *
  * The corpora are SELF-SIMILAR synthetic tables (deterministic md5-derived
  * text with shared vocabulary across docs, DataGen.clusteredVectors
  * embeddings with fixed cluster size), so every scale point draws from the
  * identical distribution and the ratio t(×s)/t(×1) isolates data growth
  * from distribution shift. Sub-linear measured growth is expected where a
  * fixed-size side exists (contamination's probe set, capped LSH buckets);
  * super-linear growth beyond ~1.3× the scale factor would flag a
  * quadratic/buffer hazard.
  *
  * Prints ONE JSON line:
  * {"metric":"scaling","base_docs":N,"scales":{"x1":{q:sec..},..},
  *  "growth_x5":{q:ratio..}}
  */
object ScalingBench {

  /** Deterministic documents table: ~20-100 tokens per doc, every 5th token
    * a stopword, word identity keyed on (doc_id % 1000, position) so
    * documents share n-grams across the corpus (contamination and quality
    * signals have realistic structure at every scale). */
  private def genDocs(spark: SparkSession, n: Long): DataFrame = {
    val len = (lit(20) + pmod(col("id"), lit(80))).cast("int")
    val words = transform(sequence(lit(0), len - 1), k =>
      when(pmod(k, lit(5)) === 0, lit("the"))
        .otherwise(substring(md5(concat(
          pmod(col("id"), lit(1000)).cast("string"), lit("|"),
          k.cast("string"))), 1, 6)))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", words).as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(5)).cast("string")).as("source"),
      length(concat_ws(" ", words)).cast("long").as("n_chars"))
  }

  private def genEmb(spark: SparkSession, n: Long): DataFrame =
    core.DataGen.clusteredVectors(spark, n, clusterSize = 5, dim = 64)
      .withColumn("label", pmod(col("vec_id"), lit(8)).cast("int"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "20000").toLong
    val baseVecs = sys.env.getOrElse("SPARK_GRAFT_SCALE_VECS", "8000").toLong
    val root = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft-scaling")
    val spark = core.Sessions.local(cpus)

    // scale points are a knob (e.g. "1,10" extends the ladder a rung
    // without re-timing the middle); growth is reported for the largest
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALE_POINTS", "1,2,5")
      .split(",").map(_.trim.toInt).toSeq.sorted
    require(scales.headOption.contains(1), "the ×1 base point is required")
    // dir name encodes the size params (a rerun with different env vars
    // regenerates instead of silently benchmarking stale tables), and
    // documents — the existence marker — is written LAST, so a run killed
    // mid-generation leaves no dir that passes the check
    def scaleDir(s: Int) = s"$root/d$baseDocs-v$baseVecs/x$s"
    scales.foreach { s =>
      val dir = scaleDir(s)
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        genEmb(spark, baseVecs * s).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
        genDocs(spark, baseDocs * s).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
    }

    lazy val learnedMerges = ext.Vocab.bpeLearn(
      Tables.documents(spark, scaleDir(1)), 10)
    val allQueries: Seq[(String, String => DataFrame)] = Seq(
      "quality_filter" -> (d => TextAnalysis.qualityFilter(Tables.documents(spark, d))),
      "quality_tiers" -> (d => TextAnalysis.qualityTiers(Tables.documents(spark, d), 10)),
      "contamination" -> { d =>
        val docs = Tables.documents(spark, d)
        Corpus.contamination(docs, docs.filter(col("doc_id") < 100), 3, 0.1)
      },
      "embedding_outliers" -> (d => Similarity.embeddingOutliers(Tables.embeddings(spark, d), 5)),
      "dedup_embedding" -> (d => Similarity.cosineNearDups(Tables.embeddings(spark, d), 20)),
      // round-8 additions: the quota rank touches every row of the hot
      // source (caps sized so all five synthetic sources overflow at ×1),
      // and the pair counts run over the vocab-sized distinct-word frame
      "source_quota" -> (d => Corpus.sourceQuota(
        Tables.documents(spark, d), Map("src0" -> 500L), 1000L)),
      "bpe_merge_pairs" -> (d => ext.Vocab.charPairStats(Tables.documents(spark, d), 30)),
      // the encode hot path: merges learned ONCE on the ×1 corpus (the
      // realistic pipeline — train small, encode everything), applied via
      // the native bpe_encode expression at every scale point
      "bpe_fertility" -> { d =>
        ext.Vocab.fertility(Tables.documents(spark, d), learnedMerges)
      },
      // round-9 additions: the three data-bound new operators — the
      // systematic sampler and histogram ride prefix-sum/count-by-value
      // exchanges (≈linear expected), vocab_growth one token explode +
      // min-aggregate over the shared-vocabulary frame (sub-linear: the
      // distinct-token table grows slower than the corpus)
      "weighted_sample" -> (d => Corpus.weightedSample(Tables.documents(spark, d), 100)),
      "vocab_growth" -> (d => Corpus.vocabGrowth(Tables.documents(spark, d))),
      "equi_depth_histogram" -> (d => graft.jobs.DataQualityJob.equiDepthOf(
        Tables.documents(spark, d), "n_chars", 10)))
    // query filter knob: refresh one query's ladder after a plan change
    // without re-timing the expensive rungs of the other four
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES") match {
      case Some(names) =>
        val want = names.split(",").map(_.trim).toSet
        val unknown = want -- allQueries.map(_._1).toSet
        require(unknown.isEmpty, s"unknown scale queries: ${unknown.mkString(", ")}")
        allQueries.filter(q => want(q._1))
      case None => allQueries
    }

    // warm: footers + codegen once per scale dir
    scales.foreach { s =>
      Tables.documents(spark, scaleDir(s)).count()
      Tables.embeddings(spark, scaleDir(s)).count()
    }
    queries.foreach { case (_, fn) => fn(scaleDir(1)).count() }

    val Runs = 3
    val timed: Map[Int, Seq[(String, Double)]] = scales.map { s =>
      s -> queries.map { case (name, fn) =>
        val times = (1 to Runs).map { _ =>
          val t0 = System.nanoTime()
          fn(scaleDir(s)).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.sorted.apply(Runs / 2)
      }
    }.toMap

    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + math.round(v * 1000) / 1000.0 }
        .mkString("{", ",", "}")
    val x1 = timed(1).toMap
    val top = scales.max
    val growth = timed(top).map { case (k, v) =>
      k -> math.round(v / x1(k) * 100) / 100.0 }
    val sc = scales.map(s => "\"x" + s + "\":" + fmt(timed(s))).mkString("{", ",", "}")
    println(s"""{"metric":"scaling","base_docs":$baseDocs,"base_vecs":$baseVecs,""" +
      s""""scales":$sc,"growth_x$top":${fmt(growth)}}""")
    spark.stop()
  }
}
