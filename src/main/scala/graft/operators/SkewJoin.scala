package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted replication join for single-hot-key skew — the join sibling of
  * [[SkewAgg]]'s two-level distinct count.
  *
  * The failure mode: a shuffle join hash-partitions both sides on the join
  * key, so EVERY row of a hot key lands in one reducer task — a 100 TB
  * event log where one user/tenant/bot holds 10% of rows turns a 1000-task
  * join into a 1-task straggler. Salting splits the hot key's fact rows
  * across `salts` sub-partitions (salt derived from a fact-side identity
  * column — deterministic, so replays and the oracle agree) and replicates
  * each DIM row into all `salts` sub-keys, so the join on
  * (key, salt) is exactly the join on key, with the hot key's work spread
  * `salts` ways. Cost: dim bytes × salts over the wire — the operator is
  * for the mid-size dim that is too big to broadcast but far smaller than
  * the fact (the gap where neither broadcast nor plain shuffle works).
  *
  * When you DON'T need this: AQE's skew-join (on by default, and what the
  * plain-join path here relies on) already splits oversized sort-merge
  * partitions at runtime by replicating the matching build side. The
  * explicit salt is for the paths AQE cannot rewrite: stream-static joins
  * (no runtime re-plan inside a micro-batch), bucketed-table joins whose
  * partitioning is pinned at write time ([[Bucketing]]), and any plan
  * where the skewed exchange feeds further key-preserving stages that
  * must stay co-partitioned. Salting changes the partitioning CONTRACT,
  * not just the runtime split — that is both its power and its price
  * (downstream per-key stages must first de-salt).
  *
  * Result is bit-identical to `fact.join(dim, keys)` (inner): each fact
  * row meets each matching dim row exactly once — in the one sub-key its
  * salt selects. */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `keys`, spreading each fact key's
    * rows over `salts` sub-keys. `saltFrom` must be a fact column (any
    * type; typically the fact's id) whose hash spreads the hot key's rows
    * — NOT the join key itself (hash(key) is constant within a key, which
    * would leave the hot key in one task, salting nothing). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFrom: Column, salts: Int = 16): DataFrame = {
    require(salts >= 2, s"saltedJoin needs salts >= 2, got $salts")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
