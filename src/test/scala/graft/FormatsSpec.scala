package graft

import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

class FormatsSpec extends SparkSpecBase {

  test("JSONL and CSV stage-and-read round-trip the documents table exactly") {
    val expected = Tables.documents(spark, sf0001)
      .select(Formats.documentsSchema.fieldNames.map(col).toSeq: _*)
      .collect().map(_.toString).sorted.toSeq
    val jsonl = Formats
      .readDocumentsJsonl(spark, Formats.stageDocumentsJsonl(spark, sf0001))
      .collect().map(_.toString).sorted.toSeq
    assert(jsonl === expected)
    val csv = Formats
      .readDocumentsCsv(spark, Formats.stageDocumentsCsv(spark, sf0001))
      .collect().map(_.toString).sorted.toSeq
    assert(csv === expected)
  }

  test("CSV dialect survives adversarial text: quotes, commas, newlines, unicode") {
    import spark.implicits._
    // every classic CSV killer in one frame; the RFC-4180 writer/reader
    // pair must round-trip ALL of them or the corpus silently corrupts
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak and \r carriage"),
      (5L, "trailing space "),
      (6L, "unicode: ñandú 中文 🚀"),
      (7L, "\"starts and ends\""),
      (8L, ""))
      .toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_nasty").toString
    nasty.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read
      .schema("id LONG, s STRING")
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"").option("multiLine", "true")
      // default CSV dialect TRIMS whitespace both ways — data loss for text
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    // empty string reads back as null in Spark CSV (documented dialect
    // limit — a loader distinguishes them with emptyValue if it must)
    val got = back.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""))).sortBy(_._1).toSeq
    val want = nasty.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === want)
  }
}
