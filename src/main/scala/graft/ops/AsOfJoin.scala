package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time-correct (as-of) join — SURVEY §7.5's one genuinely new
  * operator class over the reference: for each probe row (key, probeTs),
  * attach the latest fact row with factTs <= probeTs. This is what makes
  * offline training sets leakage-free: a feature value computed AFTER the
  * label event must never be visible at that probe.
  *
  * Implementation is the W1/W2 generalization: equi-join on the key with the
  * temporal inequality, then top-1 per probe by factTs (total-ordered by a
  * tiebreak column). Catalyst executes the inequality as a join filter on
  * the co-hashed key join — no cross product.
  *
  * Scale: the shuffle hashes on `key` only, so per-key fact history must fit
  * a partition's working set; for deep histories, pre-bucket facts by key
  * and time-band the join (factTs within [probeTs - maxLookback, probeTs])
  * so the state per probe is bounded — `maxLookback` is the knob.
  */
object AsOfJoin {

  /** `probeId` must be unique per probe row — the top-1 window partitions on
    * it, so probes sharing (key, timestamp) each keep their row (partitioning
    * on (key, probeTs) alone would silently merge and drop such ties). */
  def asOf(facts: DataFrame, probes: DataFrame, key: String,
           factTs: String, probeTs: String, tiebreak: String,
           probeId: String,
           maxLookback: Option[Column] = None): DataFrame = {
    val f = facts.as("f")
    val p = probes.as("p")
    val timeCond = maxLookback match {
      case Some(lb) => col(s"f.$factTs") <= col(s"p.$probeTs") &&
        col(s"f.$factTs") >= col(s"p.$probeTs") - lb
      case None => col(s"f.$factTs") <= col(s"p.$probeTs")
    }
    val joined = p.join(f,
      col(s"p.$key") === col(s"f.$key") && timeCond, "left")
    Ops.topOnePerKey(joined,
      Seq(col(s"p.$probeId")),
      Seq(col(s"f.$factTs").desc_nulls_last, col(s"f.$tiebreak").desc_nulls_last))
  }
}
