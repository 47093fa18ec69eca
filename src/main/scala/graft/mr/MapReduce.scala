package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The reference engine's user-facing abstraction, re-expressed on Spark.
  *
  * The reference (`/root/reference/seq/sequential.go:9-15`) defines:
  * {{{
  *   type KeyValue struct { Key, Value string }
  *   type MapFunc    func(filename, contents string) []KeyValue
  *   type ReduceFunc func(key string, values []string) string
  * }}}
  * and runs map → shuffle-by-key → group → reduce → sort-by-key
  * (`/root/reference/cmd/worker/worker.go:161-218`). This object is the same
  * API surface on Spark: any Go plugin (`plugins/wc`, `plugins/ii`) ports by
  * supplying the two closures.
  *
  * Semantics preserved exactly (SURVEY.md §4.1): the reference reduce sees the
  * COMPLETE value list for its key — there is no combiner — so arbitrary,
  * non-associative reduce functions are legal (wc's reduce is `len(values)`,
  * which double-applied would be wrong). `run` therefore groups with
  * `groupByKey` + `mapGroups` (one holistic reduce call per key, streamed from
  * the shuffle — values for one key must fit in one executor's group iterator,
  * the same per-key memory bound the reference has at
  * `worker.go:194-205`).
  *
  * For ASSOCIATIVE reduces, `runAggregated` accepts a merge function and
  * plans a partial (map-side) aggregation — at 100 TB this is the difference
  * between shuffling O(tokens) and O(distinct keys); prefer it whenever the
  * reduce is algebraic.
  */
object MapReduce {

  /** One dataflow row — `/root/reference/seq/sequential.go:9-12`. */
  final case class KeyValue(key: String, value: String)

  /** `(docId/filename, contents) => rows` — `sequential.go:14`. */
  type MapFunc = (String, String) => IterableOnce[KeyValue]

  /** `(key, allValues) => result` — `sequential.go:15`. Holistic: sees every
    * value for the key, in no guaranteed order (the reference's order is
    * arrival order, which its plugins never rely on beyond set semantics). */
  type ReduceFunc = (String, Iterator[String]) => String

  private implicit val kvEnc: Encoder[KeyValue] = Encoders.product[KeyValue]
  private implicit val strTupleEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Distributed map → shuffle → holistic reduce → sort-by-key.
    * Input: one row per document `(id, contents)` (the reference's
    * one-file-per-map-task granularity, `coordinator.go:55-61`). */
  def run(input: Dataset[(String, String)], mapf: MapFunc, reducef: ReduceFunc): Dataset[KeyValue] =
    input
      .flatMap { case (id, contents) => mapf(id, contents) }
      .groupByKey(_.key)
      .mapGroups((key, rows) => KeyValue(key, reducef(key, rows.map(_.value))))
      .orderBy("key")

  /** Associative/commutative variant with map-side partial aggregation.
    * `seqOp` folds one value into the accumulator, `combOp` merges two
    * accumulators (the merge the reference lacks), `finish` renders the
    * final string. Plans as partial_agg → shuffle(key) → final_agg. */
  def runAggregated[B](
      input: Dataset[(String, String)],
      mapf: MapFunc,
      zeroB: B,
      seqOp: (B, String) => B,
      combOp: (B, B) => B,
      finishB: B => String)(implicit bEnc: Encoder[B]): Dataset[KeyValue] = {
    val agg = new Aggregator[KeyValue, B, String] {
      override def zero: B = zeroB
      override def reduce(b: B, kv: KeyValue): B = seqOp(b, kv.value)
      override def merge(b1: B, b2: B): B = combOp(b1, b2)
      override def finish(b: B): String = finishB(b)
      override def bufferEncoder: Encoder[B] = bEnc
      override def outputEncoder: Encoder[String] = strEnc
    }
    input
      .flatMap { case (id, contents) => mapf(id, contents) }
      .groupByKey(_.key)
      .agg(agg.toColumn.name("value"))
      .map { case (k, v) => KeyValue(k, v) }
      .orderBy("key")
  }

  /** Convenience: run over the driver's `documents` table using `doc_id` as
    * the reference's filename. */
  def runOnDocuments(spark: SparkSession, sfDir: String, mapf: MapFunc, reducef: ReduceFunc): DataFrame = {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id".cast("string"), $"text").as[(String, String)]
    run(docs, mapf, reducef).toDF()
  }
}
