package graft

import java.nio.file.Files

import graft.mr.MapReduce
import graft.sources.TextFiles

/** End-to-end file parity with the reference harness: write pg-*.txt
  * fixtures (the reference tests' shape, /root/reference/tests/test_wc.py:
  * 44-57), run map/reduce from the FILES with filename provenance, and read
  * back the sorted "key value" output — source O1, sink O8, provenance P7
  * of SURVEY.md §2 in one pass. */
class TextFilesSpec extends SparkSpecBase {

  private def tempDir(): java.io.File = {
    val d = Files.createTempDirectory("graft_txt").toFile
    d.deleteOnExit()
    d
  }

  test("wc over a directory of text files, sorted KV text output") {
    val in = tempDir()
    Files.writeString(new java.io.File(in, "pg-1.txt").toPath, "hola don pepito\nhola\n")
    Files.writeString(new java.io.File(in, "pg-2.txt").toPath, "hola don jose")
    val out = new java.io.File(tempDir(), "mr-out")

    val docs = TextFiles.readDocumentsDir(spark, in.getAbsolutePath)
    val result = MapReduce.run(docs, MapReduceSpecFns.wcMap, MapReduceSpecFns.wcReduce)
    TextFiles.writeSortedKV(result.toDF(), out.getAbsolutePath)

    val lines = Files.list(out.toPath).toArray.map(_.toString)
      .filter(_.endsWith(".txt")).flatMap(p => scala.io.Source.fromFile(p).getLines())
    assert(lines.toSeq === Seq("don 2", "hola 3", "jose 1", "pepito 1"))
  }

  test("ii uses the file name as document provenance (ii.go:20-21 parity)") {
    val in = tempDir()
    Files.writeString(new java.io.File(in, "f2.txt").toPath, "hola don")
    Files.writeString(new java.io.File(in, "f1.txt").toPath, "hola hola pepito")

    val docs = TextFiles.readDocumentsDir(spark, in.getAbsolutePath)
    val got = MapReduce.run(docs, MapReduceSpecFns.iiMap, MapReduceSpecFns.iiReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === Map("hola" -> "f1.txt,f2.txt", "don" -> "f2.txt", "pepito" -> "f1.txt"))
  }

  test("multi-line files keep their full contents (whole-file read)") {
    val in = tempDir()
    val text = (1 to 50).map(i => s"line$i word$i").mkString("\n")
    Files.writeString(new java.io.File(in, "big.txt").toPath, text)
    val docs = TextFiles.readDocumentsDir(spark, in.getAbsolutePath).collect().toMap
    assert(docs("big.txt") === text)
  }
}
