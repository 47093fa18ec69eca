package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB failure mode the small-SF tests
  * can't show. Algebraic aggregates don't need this (Catalyst's partial
  * aggregation already combines map-side), but HOLISTIC aggregates
  * (`collect_list`, exact percentiles, the generic holistic reduce of
  * `graft.mr.MapReduce.run`) put every value of a key into one task. Salting
  * splits a hot key into `salts` sub-keys, aggregates the sub-groups in
  * parallel, then merges the (much smaller) per-salt partials.
  *
  * Join skew is intentionally NOT hand-rolled here: AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles
  * it at runtime from actual partition sizes.
  */
object Skew {

  /** `collect_list(valueCol)` per key, two-stage salted: stage 1 groups by
    * (key, salt) where salt = hash(value) mod salts — deterministic, spreads
    * a hot key over `salts` reducers; stage 2 flattens the per-salt lists.
    * Output lists are sorted for determinism (set semantics + order). */
  def saltedCollectList(df: DataFrame, key: Column, value: Column,
                        salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", pmod(hash(col("v")), lit(salts)))
      .groupBy(col("k"), col("_salt"))
      .agg(collect_list(col("v")).as("part"))
      .groupBy(col("k"))
      .agg(sort_array(flatten(collect_list(col("part")))).as("vs"))

  /** Exact distinct count per key, salted: per-(key, salt) distinct first
    * (each sub-group deduplicates its own shard of the hot key), then a sum
    * — correct because salt = hash(value) puts every duplicate value in the
    * SAME shard. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
                          salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", pmod(hash(col("v")), lit(salts)))
      .groupBy(col("k"), col("_salt"))
      .agg(count_distinct(col("v")).as("part"))
      .groupBy(col("k"))
      .agg(sum(col("part")).as("n_distinct"))
}
