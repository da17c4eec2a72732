package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Two paths, per the standard ANN architecture:
  *   - `bruteTopK`: exact cosine top-k — the correctness baseline. A
  *     broadcast join of the (small) query set against the corpus, one pass,
  *     no shuffle of the corpus itself: this is the shape that scales to
  *     100 TB when the query set is bounded (the corpus side streams).
  *   - `lshBuckets` / `lshCandidates`: random-hyperplane LSH — the scale
  *     path. Hyperplane signs are derived from md5 so every engine (and
  *     every executor, with no broadcast of a plane matrix) computes the
  *     identical bucket; candidates come from an equi-join on the bucket id.
  *
  * All vector math is done in double precision with a sequential fold (Spark
  * `aggregate`/`zip_with` over the cast array), matching DuckDB's list
  * functions element order, so cosines agree across engines to the ulp.
  */
object Similarity {

  private def toDouble(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), _ + _)

  /** Same sum via the native codegen'd expression (graft.plans.FloatVectorDot,
    * registered by GraftExtensions) — identical numerics (sequential double
    * accumulation), zero intermediate allocation; the hot-path form. */
  def dotNative(a: Column, b: Column): Column =
    call_function("float_vector_dot", a, b)

  /** cosine(a,b) = dot / sqrt(dot(a,a) * dot(b,b)) — single formula shared
    * with the oracle (sqrt(x*y), NOT sqrt(x)*sqrt(y), which differs in ulps). */
  def cosine(a: Column, b: Column): Column =
    dotNative(a, b) / sqrt(dotNative(a, a) * dotNative(b, b))

  /** The shared ranking contract of every top-k path: rounded cosine
    * (stable under accumulation noise) with neighbor-id tiebreak. One
    * definition so exact and ANN paths can never drift apart. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")

  /** Exact top-k neighbors for a bounded query set (vec_id < numQueries). */
  def bruteTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val cand = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("e"))
    val scored = cand.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.ops.Ops.rnd(cosine(col("q"), col("e")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  private val NumPlanes = 8
  private val Dim = 64

  /** ±1 sign of hyperplane `p` at dimension `d` (1-based), from md5 — the
    * deterministic stand-in for a seeded gaussian plane matrix. */
  private def planeSign(p: Int, d: Column): Column = {
    val highNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    when(substring(md5(concat(lit(s"$p|"), d.cast("string"))), 1, 1)
      .isin(highNibble: _*), 1.0).otherwise(-1.0)
  }

  /** 8-bit LSH bucket id per vector (bit p = sign of the projection onto
    * pseudo-plane p), as a bit string. */
  def withBucket(embeddings: DataFrame): DataFrame = {
    val e = toDouble(col("embedding"))
    val bits = (0 until NumPlanes).map { p =>
      val proj = aggregate(
        zip_with(e, sequence(lit(1), lit(Dim)), (x, d) => x * planeSign(p, d)),
        lit(0.0), _ + _)
      when(proj > 0, "1").otherwise("0")
    }
    embeddings.withColumn("bucket", concat(bits: _*))
  }

  /** Bucket occupancy — the IVF-style partition map of the corpus. */
  def lshBuckets(embeddings: DataFrame): DataFrame =
    withBucket(embeddings).groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec_id"))

  /** Embedding-cosine near-dup detection: LSH-bucket candidates scored by
    * cosine, globally ranked — the embedding-space member of the dedup
    * family (complementing text MinHash/SimHash). `topN` keeps the output
    * deterministic and bounded whether or not the corpus plants duplicates;
    * a production run would threshold (cosine >= 0.95) instead. */
  def cosineNearDups(embeddings: DataFrame, topN: Int): DataFrame = {
    val b = withBucket(embeddings).select(col("vec_id"), col("embedding"), col("bucket"))
    val scored = b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        graft.ops.Ops.rnd(cosine(col("x.embedding"), col("y.embedding")), 6).as("cosine"))
    // top-N FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    // partial top-N, merged once) — never a global window over every
    // candidate pair. The global rank window after it sees <= topN rows
    // (WindowExec's single-partition warning is about THIS bounded tail,
    // not the corpus; a constant partitionBy key would be folded away by
    // EliminateWindowPartitions anyway).
    scored
      .orderBy(col("cosine").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("cosine").desc, col("vec_a").asc, col("vec_b").asc)))
  }

  /** IVF-style ANN: a seeded KMeans coarse quantizer partitions the corpus
    * into inverted lists; queries probe only the `nprobe` nearest centroids
    * and rank within those lists. The other half of the ANN scale story next
    * to LSH: centroids adapt to the data distribution (LSH planes don't), at
    * the cost of a training pass. At 100 TB the corpus is written
    * partitioned by centroid id so a probe reads `nprobe/k` of the data.
    * Model-dependent output → exercised by recall tests, not the oracle. */
  def ivfTopK(embeddings: DataFrame, numQueries: Int, k: Int,
              nLists: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = embeddings.withColumn("v", array_to_vector(toDouble(col("embedding"))))
    val model = new KMeans().setK(nLists).setSeed(42L)
      .setFeaturesCol("v").setPredictionCol("list_id").fit(withVec)
    val assigned = model.transform(withVec).select("vec_id", "embedding", "list_id")

    // centroid table is tiny: broadcast to score query→centroid distances
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
    val centDf = spark.createDataFrame(centroids).toDF("list_id", "centroid")
    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val probed = q.crossJoin(broadcast(centDf))
      .withColumn("cdist", -cosine(col("qe"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").asc, col("list_id").asc)))
      .filter(col("crank") <= nprobe)
      .select("query_id", "qe", "list_id")

    // search only the probed inverted lists (equi-join on list_id)
    val scored = probed.join(assigned, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.ops.Ops.rnd(cosine(col("qe"), col("embedding")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Candidate pairs from shared buckets (equi-join, never all-pairs). */
  def lshCandidates(embeddings: DataFrame): DataFrame = {
    val b = withBucket(embeddings).select("vec_id", "bucket")
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("x.bucket"))
  }
}
