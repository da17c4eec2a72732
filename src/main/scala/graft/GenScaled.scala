package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-similar full-board scale-up generator (VERDICT r10 item 2: the
  * whole query board had never run above sf0.1). Replicates EVERY testdata
  * table N× with disjoint key spaces, so the generated dir serves the
  * complete SparkEntry board through graft.Bench at an sf1-equivalent
  * size, drawn from the REAL sf0.1 distributions (replication preserves
  * them exactly — no synthetic-generator drift):
  *
  *   - key domains (custkey, orderkey, suppkey, partkey, event_id,
  *     doc_id, vec_id) get a per-replica stride = max(key)+1, applied
  *     consistently to PKs and FKs, so per-user/per-order structure is
  *     untouched and replica users are disjoint;
  *   - `documents.text` is token-renamed per replica (token → same-LENGTH
  *     md5-derived string keyed on (token, replica)): within-replica
  *     shingle/jaccard/token structure is preserved bijectively, while
  *     cross-replica similarity collapses — without this, replica copies
  *     of every doc are mutual near-dups and the pair generators measure
  *     a quadratic DATA artifact, not the plan (n_chars stays consistent
  *     because lengths are preserved);
  *   - `embeddings.embedding` gets a per-replica diagonal ±1 sign flip
  *     (md5-keyed per (replica, dim)): an orthogonal transform, so every
  *     within-replica inner product is EXACTLY preserved while
  *     cross-replica cosines collapse to noise;
  *   - dims (region, nation) copy unchanged — they are fixed-size at any
  *     sf, like TPC-H's nation table.
  *
  * Replica 0 is transformed too (rename/flip with r=0), so the ×1 dir is
  * distribution-identical to every rung and ×1-vs-×N growth isolates
  * scale. Usage:
  *
  *   sbt "runMain graft.GenScaled /root/testdata/sf0.1 /tmp/graft-sf1 10"
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt "runMain graft.Bench"
  */
object GenScaled {

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScaled <srcDir> <outDir> <replicas>")
    val (src, out, reps) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)

    def replicate(df: DataFrame)(cols: (String, Column => Column)*): DataFrame = {
      val r = spark.range(reps).select(col("id").cast("int").as("__r"))
      val m = cols.toMap
      df.crossJoin(r).select(df.columns.toSeq.map { c =>
        m.get(c).fold(col(c))(f => f(col(c))).as(c)
      }: _*)
    }
    def shifted(s: Long): Column => Column = c => c + col("__r") * s

    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val sup = spark.read.parquet(s"$src/supplier.parquet")
    val prt = spark.read.parquet(s"$src/part.parquet")
    val ev = graft.core.Tables.events(spark, src) // nanos-ts normalized
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val (kCust, kOrd, kSupp, kPart) = (stride(cust, "c_custkey"),
      stride(ord, "o_orderkey"), stride(sup, "s_suppkey"), stride(prt, "p_partkey"))
    val (kEv, kDoc, kVec) = (stride(ev, "event_id"),
      stride(docs, "doc_id"), stride(emb, "vec_id"))

    replicate(cust)("c_custkey" -> shifted(kCust))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    replicate(sup)("s_suppkey" -> shifted(kSupp))
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    replicate(prt)("p_partkey" -> shifted(kPart))
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    replicate(ord)("o_orderkey" -> shifted(kOrd), "o_custkey" -> shifted(kCust))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    replicate(li)("l_orderkey" -> shifted(kOrd), "l_partkey" -> shifted(kPart),
        "l_suppkey" -> shifted(kSupp))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // events.user_id lives in the custkey domain (the role mapping joins
    // it against customer-derived users), so it shifts by the SAME stride
    replicate(ev)("event_id" -> shifted(kEv), "user_id" -> shifted(kCust))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // token rename: same-length md5-derived string keyed on (token, replica);
    // two md5 blocks cover tokens up to 64 chars without shortening
    val renamed: Column => Column = t => concat_ws(" ",
      transform(split(t, " "), w =>
        when(length(w) === 0, w).otherwise(
          concat(
            md5(concat(w, lit("|"), col("__r"), lit("|1"))),
            md5(concat(w, lit("|"), col("__r"), lit("|2"))))
            .substr(lit(1), length(w)))))
    replicate(docs)("doc_id" -> shifted(kDoc), "text" -> renamed)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // diagonal ±1 per (replica, dim): orthogonal within-replica, noise across
    val flipped: Column => Column = e => transform(e, (x, i) =>
      (x * when(conv(substring(md5(concat(col("__r"), lit("|"), i)), 1, 2),
        16, 10).cast("int") % 2 === 0, lit(1.0f)).otherwise(lit(-1.0f)))
        .cast("float"))
    replicate(emb)("vec_id" -> shifted(kVec), "embedding" -> flipped)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // rename-collision guard (code-review finding): an md5 prefix of
    // length L has only 16^L values, so two same-length tokens can merge
    // inside a replica — silently changing the shingle/near-dup structure
    // the rung exists to hold constant. Distinct-token count must scale
    // exactly with replicas (renamed vocabularies are disjoint across
    // replicas by the |r| key).
    def vocab(df: DataFrame): Long = df
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    val (srcV, outV) =
      (vocab(docs), vocab(spark.read.parquet(s"$out/documents.parquet")))
    require(outV == srcV * reps,
      s"token rename collided: $srcV source tokens x $reps replicas != $outV renamed")

    println(s"[gen-scaled] wrote $out at ${reps}x of $src " +
      s"(events=${spark.read.parquet(s"$out/events.parquet").count()}, " +
      s"lineitem=${spark.read.parquet(s"$out/lineitem.parquet").count()}, " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()})")
    spark.stop()
  }
}
