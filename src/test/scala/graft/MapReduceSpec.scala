package graft

import graft.functions.TextFunctions
import graft.mr.MapReduce
import graft.mr.MapReduce.KeyValue

/** Differential tests in the reference's own style
  * (/root/reference/tests/test_wc.py, test_ii.py): run the distributed
  * engine on the reference's fixtures and compare against a sequential
  * in-memory fold — the same oracle-diff idea as the reference's
  * `seq/sequential.go`. */
/** Map/reduce closures live outside the spec class: Spark serializes them to
  * executors, and a method reference on the spec would drag the whole
  * (non-serializable) ScalaTest instance into the closure. */
object MapReduceSpecFns extends Serializable {
  def wcMap(id: String, text: String): Iterator[KeyValue] =
    TextFunctions.tokenizeScala(text).iterator.map(w => KeyValue(w, "1"))
  def wcReduce(k: String, vs: Iterator[String]): String = vs.size.toString

  def iiMap(id: String, text: String): Iterator[KeyValue] =
    TextFunctions.tokenizeScala(text).iterator.map(w => KeyValue(w, id))
  def iiReduce(k: String, vs: Iterator[String]): String =
    vs.toSeq.distinct.sorted.mkString(",")
}

class MapReduceSpec extends SparkSpecBase {
  import spark.implicits._
  import MapReduceSpecFns._

  /** Sequential oracle: the same fold the reference's sequential.go does. */
  private def seqWc(docs: Seq[(String, String)]): Map[String, String] =
    docs.flatMap { case (id, t) => wcMap(id, t) }
      .groupBy(_.key).map { case (k, kvs) => k -> kvs.size.toString }

  private def runWc(docs: Seq[(String, String)]): Map[String, String] =
    MapReduce.run(docs.toDS(), MapReduceSpecFns.wcMap, MapReduceSpecFns.wcReduce)
      .collect().map(kv => kv.key -> kv.value).toMap

  // Fixtures from /root/reference/tests/test_wc.py:44-57, 85-98, 126-140.
  test("wc basic fixture matches sequential oracle") {
    val docs = Seq("pg-1.txt" -> "hola don pepito", "pg-2.txt" -> "hola don jose")
    val got = runWc(docs)
    assert(got === seqWc(docs))
    assert(got("hola") === "2" && got("don") === "2")
  }

  test("wc lowercases (case fixture)") {
    val docs = Seq("a" -> "HOla dON don senioR seNIoritOO pePItO!",
                   "b" -> "HOLA dOn SENIOR JOSE!")
    val got = runWc(docs)
    assert(got === seqWc(docs))
    assert(got("hola") === "2" && got("don") === "3" && got("senior") === "2")
  }

  test("wc strips punctuation, drops empty tokens (punct fixture)") {
    val docs = Seq("a" -> "hola hola chau", "b" -> "hola,,, hola!!. chau!$$")
    val got = runWc(docs)
    assert(got === seqWc(docs))
    assert(got("hola") === "4" && got("chau") === "2")
    assert(!got.contains(""))
  }

  test("wc stress fixture: closed-form expected output (test_wc.py:254-276)") {
    val d1 = "hola " * 10000 + "don " * 2000 + "pepito " * 5000
    val d2 = "hola " * 10000 + "don " * 2000 + "jose " * 5000
    val got = runWc(Seq("f1" -> d1, "f2" -> d2))
    assert(got === Map("hola" -> "20000", "don" -> "4000",
                       "pepito" -> "5000", "jose" -> "5000"))
  }

  test("ii produces sorted distinct doc lists (test_ii.py semantics)") {
    val docs = Seq("f2" -> "hola don", "f1" -> "hola hola pepito")
    val got = MapReduce.run(docs.toDS(), MapReduceSpecFns.iiMap, MapReduceSpecFns.iiReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === Map("hola" -> "f1,f2", "don" -> "f2", "pepito" -> "f1"))
  }

  test("holistic reduce sees the full value list (non-associative legality)") {
    // A reduce that is NOT associative: returns the count AS A RUN LENGTH.
    // If the engine applied it twice (combiner-style), counts would be wrong.
    val docs = (1 to 100).map(i => (s"f$i", "x y"))
    val got = MapReduce.run(docs.toDS(),
      (id, t) => TextFunctions.tokenizeScala(t).iterator.map(w => KeyValue(w, "1")),
      (_, vs) => vs.size.toString).collect()
    assert(got.toSeq.map(kv => kv.key -> kv.value).sorted ===
           Seq("x" -> "100", "y" -> "100"))
  }

  test("output is sorted ascending by key (worker.go:121-132 parity)") {
    val docs = Seq("f" -> "zeta alpha mike")
    val got = MapReduce.run(docs.toDS(), wcMap, wcReduce).collect().map(_.key)
    assert(got === got.sorted)
  }

  test("runAggregated (associative path) matches holistic run for wc") {
    val docs = Seq("a" -> ("hola " * 500 + "don don"), "b" -> "hola chau")
    val holistic = runWc(docs)
    val aggregated = MapReduce.runAggregated[Long](
      docs.toDS(), wcMap, 0L, (b, _) => b + 1, _ + _, _.toString)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(aggregated === holistic)
  }
}
