package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{FeatureCache, Tables}

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Two paths, per the standard ANN architecture:
  *   - `bruteTopK`: exact cosine top-k — the correctness baseline. A
  *     broadcast join of the (small) query set against the corpus, one pass,
  *     no shuffle of the corpus itself: this is the shape that scales to
  *     100 TB when the query set is bounded (the corpus side streams).
  *   - `lshBuckets` / `lshCandidates`: banded random-hyperplane LSH (4
  *     tables × 16 planes) — the scale path. Hyperplane signs are derived
  *     from md5 so every engine computes the identical bucket; candidates
  *     come from an equi-join on (table_id, bucket) with a bucket-size cap.
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

  /** Banded multi-table LSH topology: `NumTables` independent hash tables of
    * `PlanesPerTable` hyperplanes each (2^16 buckets per table). One wide
    * 8-plane table (the naive form) has only 256 buckets total — a self-join
    * on bucket equality is O(n²/256) pairs, quadratic at corpus scale. With
    * banding, a random pair at cosine θ collides with probability
    * (1−θ/π)^16 per table (≈0.0015 at cosine 0.5) while a true near-dup
    * (cosine ≥0.99) still lands in ≥1 of the 4 tables w.p. ≈0.93 — the same
    * bands×rows trade MinHash LSH makes (Dedup.minhashPairsPre). */
  private[graft] val NumTables = 4
  private[graft] val PlanesPerTable = 16
  private val Dim = 64

  /** Buckets larger than this are excluded from candidate generation: a
    * degenerate bucket (boilerplate / zero vectors) contributes O(n²) pairs
    * on its own. Dropped buckets stay observable via `overflowBuckets`.
    *
    * The fixed default holds measured-linear through ×10 corpus growth
    * (PERF.md: 10.26× time on 10× vectors at 200k); if `overflowBuckets`
    * ever shows buckets saturating as the corpus grows — recall eroding
    * because real near-dup clusters exceed the cap — scale the cap with
    * corpus size instead (cap ≈ n / (NumTables·2^PlanesPerTable) times a
    * small factor), which keeps expected per-bucket occupancy constant
    * while the O(cap·n) pair bound grows only linearly. */
  val MaxBucketSize = 64

  /** ±1 signs of global hyperplane `p` across the 64 dims, derived from the
    * md5 high bit of "p|d" — a deterministic stand-in for a seeded gaussian
    * plane matrix, computed once on the driver and shipped as a literal (no
    * per-row hashing, no broadcast variable; every engine derives the
    * identical matrix). Shared with the DuckDB oracle via OracleSql. */
  private[graft] def planeSigns(p: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Dim) { i =>
      val h = md.digest(s"$p|${i + 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((h(0) & 0x80) != 0) 1.0f else -1.0f
    }
  }

  /** Long-form bucket assignment: one row per (vector, table) with the
    * table's 16-bit bucket id as a bit string. Slim on purpose (no
    * embedding column) — candidate generation joins on (table_id, bucket)
    * and fetches vectors back only for scoring. */
  def withBuckets(embeddings: DataFrame): DataFrame = {
    val tables = (0 until NumTables).map { t =>
      val bits = (0 until PlanesPerTable).map { j =>
        val p = t * PlanesPerTable + j
        when(dotNative(col("embedding"), typedLit(planeSigns(p))) > 0, "1").otherwise("0")
      }
      struct(lit(t).as("table_id"), concat(bits: _*).as("bucket"))
    }
    embeddings
      .select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
  }

  /** Bucket occupancy per hash table — the corpus partition map. */
  def lshBuckets(embeddings: DataFrame): DataFrame =
    occupancyOf(withBuckets(embeddings))

  /** lshBuckets over the session-cached bucket table. */
  def lshBucketsCached(spark: SparkSession, dir: String): DataFrame =
    occupancyOf(bucketsCached(spark, dir))

  private def occupancyOf(buckets: DataFrame): DataFrame =
    buckets.groupBy("table_id", "bucket")
      .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec_id"))

  /** Session-cached long-form bucket table — the one artifact every
    * embedding-similarity query derives from (occupancy report, candidate
    * join, overflow accounting). Slim (id + table + 16-char bucket), so
    * caching it trades a few MB per million vectors for recomputing 64
    * native dot products per vector per consumer. */
  def bucketsCached(spark: SparkSession, dir: String): DataFrame =
    FeatureCache.cached(spark, dir, "emb_lsh_buckets")(
      withBuckets(Tables.embeddings(spark, dir)))

  /** Bucket rows surviving the size cap (window count reuses the exchange
    * the downstream (table_id, bucket) equi-join needs anyway). */
  private def cappedFrom(buckets: DataFrame, maxBucket: Int): DataFrame =
    buckets
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("table_id", "bucket")))
      .filter(col("__n") <= maxBucket)
      .drop("__n")

  private def cappedBuckets(embeddings: DataFrame, maxBucket: Int): DataFrame =
    cappedFrom(withBuckets(embeddings), maxBucket)

  /** The buckets the cap drops — the overflow accounting a production run
    * monitors (a sudden spike means degenerate content flooding one bucket). */
  def overflowBuckets(embeddings: DataFrame, maxBucket: Int = MaxBucketSize): DataFrame =
    lshBuckets(embeddings).filter(col("n_vectors") > maxBucket)

  /** Candidate pairs from shared buckets in ANY table: equi-join on
    * (table_id, bucket), never all-pairs; collisions, not n², drive the
    * shuffle volume, and the size cap bounds the worst bucket. */
  def lshCandidates(embeddings: DataFrame, maxBucket: Int = MaxBucketSize): DataFrame =
    candidatesFrom(cappedBuckets(embeddings, maxBucket))

  private def candidatesFrom(b: DataFrame): DataFrame =
    b.as("x").join(b.as("y"),
        col("x.table_id") === col("y.table_id") && col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()

  /** Cosine-score an id-pair list: vectors are fetched back by two key
    * joins just for scoring — candidates never carry embedding payloads
    * through the bucket shuffle. */
  private def scoreCandidates(cand: DataFrame, embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        graft.ops.Ops.rnd(cosine(col("ea"), col("eb")), 6).as("cosine"))
  }

  /** Session-cached cosine-scored LSH candidate pairs — the shared
    * upstream of near-dup ranking, thresholded edges, and semantic
    * clustering (the same build-once artifact the MinHash/SimHash pair
    * tables are on the text side, Dedup.scala). Built from the cached
    * bucket table, so a session pays the plane dots and the bucket
    * self-join once across all three consumers. */
  def scoredPairsCached(spark: SparkSession, dir: String,
                        maxBucket: Int = MaxBucketSize): DataFrame =
    FeatureCache.cached(spark, dir, s"emb_scored_pairs_$maxBucket")(
      scoreCandidates(candidatesFrom(cappedFrom(bucketsCached(spark, dir), maxBucket)),
        Tables.embeddings(spark, dir)))

  /** Embedding-cosine near-dup detection: banded-LSH candidates scored by
    * cosine, globally ranked — the embedding-space member of the dedup
    * family (complementing text MinHash/SimHash). Candidates carry only id
    * pairs; vectors are fetched back by two key joins just for scoring.
    * `topN` keeps the output deterministic and bounded whether or not the
    * corpus plants duplicates; a production run would threshold
    * (cosine >= 0.95) instead. */
  def cosineNearDups(embeddings: DataFrame, topN: Int,
                     maxBucket: Int = MaxBucketSize): DataFrame =
    rankNearDups(scoreCandidates(lshCandidates(embeddings, maxBucket), embeddings), topN)

  /** cosineNearDups over the session-cached scored-pair table. */
  def cosineNearDupsCached(spark: SparkSession, dir: String, topN: Int,
                           maxBucket: Int = MaxBucketSize): DataFrame =
    rankNearDups(scoredPairsCached(spark, dir, maxBucket), topN)

  // top-N FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
  // partial top-N, merged once) — never a global window over every
  // candidate pair. The global rank window after it sees <= topN rows
  // (WindowExec's single-partition warning is about THIS bounded tail,
  // not the corpus; a constant partitionBy key would be folded away by
  // EliminateWindowPartitions anyway).
  private def rankNearDups(scored: DataFrame, topN: Int): DataFrame =
    scored
      .orderBy(col("cosine").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("cosine").desc, col("vec_a").asc, col("vec_b").asc)))

  /** Thresholded cosine pair set over the LSH candidates — the edge list
    * semantic clustering/dedup consumes (vs. cosineNearDups' bounded top-N
    * report). Same capped bucket equi-join; only collisions are scored. */
  def cosinePairs(embeddings: DataFrame, minCosine: Double,
                  maxBucket: Int = MaxBucketSize): DataFrame =
    scoreCandidates(lshCandidates(embeddings, maxBucket), embeddings)
      .filter(col("cosine") >= minCosine)

  /** SemDeDup-shape semantic grouping: connected components over the
    * thresholded cosine pairs, smallest vec_id as the cluster keeper — the
    * embedding-space member of the cluster-collapse family (Dedup.clusters
    * provides the pointer-jumping CC; this is the same pipeline with cosine
    * edges instead of Jaccard edges). At a dedup threshold (≥0.95) the
    * output is the semantic-dedup keeper map; at a looser one (the test
    * corpus plants no near-dups, so the gate runs 0.2) it is the topic
    * grouping a curation pass balances over. */
  def semanticClusters(embeddings: DataFrame, minCosine: Double,
                       maxBucket: Int = MaxBucketSize): DataFrame =
    clustersOf(cosinePairs(embeddings, minCosine, maxBucket))

  /** semanticClusters over the session-cached scored-pair table. */
  def semanticClustersCached(spark: SparkSession, dir: String, minCosine: Double,
                             maxBucket: Int = MaxBucketSize): DataFrame =
    clustersOf(scoredPairsCached(spark, dir, maxBucket)
      .filter(col("cosine") >= minCosine))

  /** Session-cached semantic-cluster keeper map — same rationale as
    * Dedup.clusterTable: the CC fixpoint runs once per corpus snapshot and
    * the grouping is served as a materialized artifact, not recomputed per
    * consumer. */
  def semanticClusterTable(spark: SparkSession, dir: String, minCosine: Double,
                           maxBucket: Int = MaxBucketSize): DataFrame =
    FeatureCache.cached(spark, dir, s"semantic_clusters_${minCosine}_$maxBucket")(
      semanticClustersCached(spark, dir, minCosine, maxBucket))

  /** Embedding-space split leakage — Corpus.splitLeakage's semantic
    * sibling: text near-dup leakage misses PARAPHRASES (same content,
    * different tokens), which cosine edges catch, so an eval-hygiene audit
    * runs BOTH before trusting a holdout. Endpoints of each thresholded
    * cosine pair get the same deterministic unit-hash split assignment a
    * vec-keyed corpus would ship (identical Knuth hash ⇒ identical split
    * for a doc and its embedding row when ids align); cross-split mass is
    * flagged `leaky`.
    *
    * Scale shape: the thresholded pair table is collision-bounded and
    * broadcasts through both endpoint joins; the split projection is a
    * narrow map over embeddings ids. Output ≤ split² rows. */
  def semanticSplitLeakage(spark: SparkSession, dir: String,
                           minCosine: Double,
                           trainFrac: Double = 0.8,
                           valFrac: Double = 0.1,
                           maxBucket: Int = MaxBucketSize): DataFrame = {
    val pairs = scoredPairsCached(spark, dir, maxBucket)
      .filter(col("cosine") >= minCosine).select("vec_a", "vec_b")
    val u = Corpus.unitHash(col("vec_id"))
    val splits = Tables.embeddings(spark, dir).select(col("vec_id"),
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test").as("split"))
    val a = splits.select(col("vec_id").as("vec_a"), col("split").as("split_a"))
    val b = splits.select(col("vec_id").as("vec_b"), col("split").as("split_b"))
    broadcast(broadcast(pairs).join(a, Seq("vec_a")))
      .join(b, Seq("vec_b"))
      .select(least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("pair_count"))
      .withColumn("leaky", col("split_lo") =!= col("split_hi"))
  }

  private def clustersOf(pairs: DataFrame): DataFrame =
    Dedup.clusters(pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"),
        col("keeper_doc_id").as("keeper_vec_id"), col("cluster_size"))

  /** Per-label centroid + bottom-k cosine outliers — embedding-space
    * outlier pruning (docs far from their group's centroid are mislabeled
    * or garbled; a curation pass drops or reviews them).
    *
    * Determinism: the cross-row element means run as DECIMAL sums
    * (order-independent exact arithmetic — a double sum's value depends on
    * partition merge order) and the per-vec dot/norm reductions as DECIMAL
    * folds (row-local, but pinned to the same decimal(30,15) element terms
    * the oracle sums), cast to double only at the end; ties in the outlier
    * rank break on vec_id. Scale shape: ONE pass over the corpus computes
    * all `dim` centroid sums as combinable column aggregates (no positional
    * explode — the 64x row fan-out and its re-join are gone), the labels x
    * dim centroid frame folds to one array row per label and BROADCASTs
    * back, and scoring is row-local arithmetic — nothing shuffles the
    * corpus at all; only the labels-row centroid frame and the final
    * per-label top-k rank move. The rank itself is a two-phase salted
    * bottom-k (per-(label, salt) partial ranks, then a final rank over the
    * ≤ k·32 survivors per label) so election parallelism never collapses
    * to the label count. Assumes fixed-width `dim` vectors (the
    * table contract; ragged or null embeddings would change the per-pos
    * counts vs the exploded form). */
  def embeddingOutliers(embeddings: DataFrame, k: Int = 5, dim: Int = 64): DataFrame = {
    val x = col("embedding")
    // decimal(30,15) element terms, exact decimal accumulation — the
    // codegen'd loop form of the oracle's SUM(CAST(xᵢ·cᵢ AS DECIMAL(30,15)))
    // (plans/DecimalVectorDot; widens floats per element, so no per-row
    // array<double> cast copy).
    def decDot(a: Column, b: Column): Column =
      call_function("decimal_vector_dot", a, b)
    val cent = embeddings.groupBy("label").agg(
      count(lit(1)).as("__n"),
      (0 until dim).map(i =>
        // scalar element cast — NOT x.cast(array<double>)(i), which would
        // re-materialize the cast array once per dimension per row
        sum(x.getItem(i).cast("double").cast("decimal(27,10)")).as(s"__s$i")): _*)
    val centArr = cent.select(col("label"),
        array((0 until dim).map(i =>
          col(s"__s$i").cast("double") / col("__n")): _*).as("__c"))
      // the centroid's self-norm is constant per label — fold it once in
      // the labels-row frame, not once per corpus row
      .withColumn("__nc", decDot(col("__c"), col("__c")))
    val scored = embeddings.join(broadcast(centArr), Seq("label"))
      .select(col("vec_id"), col("label"),
        graft.ops.Ops.rnd(
          decDot(x, col("__c")) /
            sqrt(decDot(x, x) * col("__nc")), 6)
          .as("cos_to_centroid"))
    // Bottom-k election as ONE window (r16): Spark's rank-limit pushdown
    // (WindowGroupLimit, 3.5+) inserts a PARTIAL group limit below the
    // exchange — each map task keeps only its local bottom-k per label, so
    // the shuffle carries ≤ k·maps rows per label instead of the corpus.
    // That is exactly the property the r12 salted two-phase manufactured
    // by hand (its phase 1 bounded what reached the per-label rank), but
    // WITHOUT the corpus-sized (label, salt) exchange phase 1 paid: the
    // only exchange left moves survivors. Reduce-side parallelism is still
    // the label count, but over ≤ k·maps rows per label — never
    // corpus/labels. (cos, vec_id) is a total order, so the output is
    // byte-identical to the two-phase form (AnalyticsOpsSpec recomputes
    // the salted election and pins equality; ScaleShapeSpec pins the
    // Partial WindowGroupLimit below the exchange).
    scored
      .withColumn("outlier_rank", row_number().over(
        Window.partitionBy("label")
          .orderBy(col("cos_to_centroid").asc, col("vec_id").asc)))
      .filter(col("outlier_rank") <= k)
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
    val (assigned, centDf) = assignLists(embeddings, nLists)
    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val probed = probeLists(q, centDf, nprobe)

    // search only the probed inverted lists (equi-join on list_id)
    val scored = probed.join(assigned, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.ops.Ops.rnd(cosine(col("qe"), col("embedding")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Seeded coarse quantizer: (corpus with list_id, centroid table). */
  private def assignLists(embeddings: DataFrame, nLists: Int): (DataFrame, DataFrame) = {
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
    (assigned, spark.createDataFrame(centroids).toDF("list_id", "centroid"))
  }

  /** Queries → their `nprobe` nearest inverted lists (broadcast centroids). */
  private def probeLists(q: DataFrame, centDf: DataFrame, nprobe: Int): DataFrame =
    q.crossJoin(broadcast(centDf))
      .withColumn("cdist", -cosine(col("qe"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").asc, col("list_id").asc)))
      .filter(col("crank") <= nprobe)
      .select("query_id", "qe", "list_id")

  /** Materialize the IVF index: the corpus written PARTITIONED BY list_id
    * (one directory per inverted list) plus the centroid table. This is the
    * 100 TB posture the probe path depends on — a probe then reads only
    * nprobe/nLists of the data from disk, pruned at the file index, instead
    * of scanning the corpus and filtering. */
  def buildIvfIndex(embeddings: DataFrame, path: String, nLists: Int = 16): Unit = {
    val (assigned, centDf) = assignLists(embeddings, nLists)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    centDf.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a materialized IVF index: rank centroids per query, then scan
    * ONLY the probed list partitions. The probed list ids are collected
    * driver-side — bounded by queries × nprobe (the serving API boundary),
    * never corpus-sized — so the scan carries a static `list_id IN (...)`
    * partition filter (visible as PartitionFilters in the plan). */
  /** Symmetric per-vector int8 scalar quantization (SQ8): q = round(x/s)
    * with s = max|x|/127, stored with the scale. 4× smaller than float32 —
    * at corpus scale that is 4× less scan bandwidth, broadcast size, and
    * cache footprint for the ANN candidate stage; the float corpus is only
    * touched to re-rank survivors. Deterministic (no codebook training). */
  def quantize(embeddings: DataFrame): DataFrame = {
    val e = toDouble(col("embedding"))
    val s = greatest(aggregate(e, lit(0.0), (acc, x) => greatest(acc, abs(x))),
      lit(1e-30)) / lit(127.0)
    embeddings.select(col("vec_id"),
      transform(e, x => round(x / s).cast("int")).as("q"),
      s.as("scale"))
  }

  /** Approximate top-k over the quantized corpus: cosine of the int8
    * vectors (scales cancel in the cosine, so only the integer dot products
    * matter). Same broadcast-query/streamed-corpus shape as bruteTopK;
    * recall vs the exact path is pinned in SinksAndExtSpec rather than an
    * oracle (quantization error is approximation by construction). */
  def quantizedTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val qt = quantize(embeddings)
    // the native dot takes array<float>; int8 components (|q| <= 127) are
    // exactly representable, so the cast is lossless
    val q = qt.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").cast("array<float>").as("qa"))
    val cand = qt.select(col("vec_id").as("neighbor_id"), col("q").cast("array<float>").as("qb"))
    val scored = cand.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.ops.Ops.rnd(cosine(col("qa"), col("qb")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  def ivfProbe(spark: org.apache.spark.sql.SparkSession, path: String,
               queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val centDf = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val probed = probeLists(q, centDf, nprobe)
    val listIds = probed.select("list_id").distinct().collect().map(_.getInt(0)).toSeq
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(listIds: _*))
    val scored = probed.join(lists, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.ops.Ops.rnd(cosine(col("qe"), col("embedding")), 6).as("cosine"))
    rankTopK(scored, k)
  }

}
