package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Testdata schema-drift preflight (VERDICT r7 directive 2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shifted parquet physical types once (events.ts: TIMESTAMP(NANOS) →
  * TIMESTAMP_NTZ), which silently broke 13 event-time queries. This spec
  * asserts the NORMALIZED schema every query family assumes, per table, so
  * a drifted parquet fails ONE named test here instead of scattering
  * analysis errors across the query surface.
  *
  * Assertions are deliberately about what queries consume (column name +
  * normalized Spark type after the loader), not raw parquet physical types
  * — the loader is allowed to absorb vintage changes, and this spec must
  * keep passing when it does.
  */
class SchemaPreflightSpec extends SparkSpecBase {

  private def assertCols(table: String, df: org.apache.spark.sql.DataFrame,
                         want: (String, DataType)*): Unit = {
    val got = df.schema.map(f => f.name -> f.dataType).toMap
    want.foreach { case (name, dt) =>
      assert(got.contains(name), s"$table: column '$name' missing (have ${got.keys.mkString(", ")})")
      assert(got(name) == dt, s"$table.$name: expected $dt, testdata now yields ${got(name)} — " +
        "normalize it in graft.sources.Tables before any query sees it")
    }
  }

  test("preflight: events loader yields the event-time contract") {
    val ev = Tables.events(spark, sf0001)
    assertCols("events", ev,
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("preflight: documents and embeddings match the pipeline contract") {
    assertCols("documents", Tables.documents(spark, sf0001),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    val emb = Tables.embeddings(spark, sf0001)
    assertCols("embeddings", emb,
      "vec_id" -> LongType, "label" -> IntegerType)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
           emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding: expected Array[Float], got ${emb.schema("embedding").dataType}")
  }

  test("preflight: TPC-H-ish tables keep their join-key and measure types") {
    assertCols("lineitem", Tables.lineitem(spark, sf0001),
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
    // Date-ish columns: queries use date_trunc/comparisons which tolerate
    // TIMESTAMP, TIMESTAMP_NTZ and DATE — assert membership, not equality.
    val dateish: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
    assert(dateish.contains(Tables.lineitem(spark, sf0001).schema("l_shipdate").dataType))
    assert(dateish.contains(Tables.orders(spark, sf0001).schema("o_orderdate").dataType))
    assertCols("orders", Tables.orders(spark, sf0001),
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
    assertCols("customer", Tables.customer(spark, sf0001),
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier", Tables.supplier(spark, sf0001),
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    assertCols("part", Tables.part(spark, sf0001),
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    assertCols("nation", Tables.nation(spark, sf0001),
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertCols("region", Tables.region(spark, sf0001),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("preflight: streaming events source matches the batch loader's contract") {
    val st = graft.streaming.EventStreams.eventsStream(spark, sf0001)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType,
      s"streaming events.ts must normalize to TimestampType (watermarks require it), got ${st.schema("ts").dataType}")
  }

  test("preflight: no declared query emits a top-level Array/Map/Struct column") {
    // Output contract of the driver's differential checker (VERDICT r8
    // directive 3): it sorts and hashes every output column with pandas,
    // which requires SCALAR cells — a top-level array column crashes it
    // (`unhashable type: numpy.ndarray`), which is exactly how
    // embed_documents went red in round 8 while being value-correct.
    // Complex types are fine INSIDE a query; the declared projection must
    // flatten or stringify them (see TextAnalysis.embedDocumentsFlat).
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val bad = q(spark, sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"driver checker cannot sort these columns — flatten/stringify them:\n  ${offenders.mkString("\n  ")}")
  }

  test("preflight: every declared query has a DuckDB oracle, and no orphan oracles") {
    // The t2 gate only hash-compares keys present in BOTH maps; a query
    // without an oracle silently downgrades to a rows-only check. Keep the
    // contract total so every declared operator stays differentially gated.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
