package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Formats, Tables}

class FormatsSpec extends SparkSpec {

  private def events = Tables.events(spark, sfDir)
    .select("event_id", "user_id", "event_type", "value", "ts_ms")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"), r.getAs[Long]("ts_ms")))
      .sortBy(_._1)

  test("json round-trip preserves every row and value") {
    val out = Files.createTempDirectory("graft_json").toString + "/events"
    Formats.writeJson(events, out)
    val back = Formats.readJson(spark, out, events.schema)
    assert(canon(back).sameElements(canon(events)))
  }

  test("csv round-trip preserves every row and value") {
    val out = Files.createTempDirectory("graft_csv").toString + "/events"
    Formats.writeCsv(events, out)
    val back = Formats.readCsv(spark, out, events.schema)
    assert(canon(back).sameElements(canon(events)))
  }

  test("jsonl quarantine: good rows parse, bad lines kept inspectable, none lost") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta"}""",
      """{"doc_id": 2, "text": "gamma}""",            // unterminated string
      """{"doc_id": 3, "text": "delta epsilon"}""",
      """not json at all""",
      """{"doc_id": "not-a-number", "text": "zeta"}""") // type mismatch
    Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val read = Formats.readJsonlQuarantine(spark, dir, schema)
    val goodRows = read.good.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(goodRows == Map(1L -> "alpha beta", 3L -> "delta epsilon"))
    val quarantined = read.quarantined.collect().map(_.getString(0))
    assert(quarantined.length == 3, s"expected 3 quarantined, got ${quarantined.toSeq}")
    assert(quarantined.contains("not json at all"))   // raw line preserved
    assert(goodRows.size + quarantined.length == lines.length, "rows lost")
    // the release hook frees the shared cached scan (no pinned blocks)
    val before = spark.sparkContext.getPersistentRDDs.size
    read.release()
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "release() did not unpersist the cached scan")
  }

  test("explicit-schema read prunes and types correctly") {
    val out = Files.createTempDirectory("graft_json2").toString + "/events"
    Formats.writeJson(events, out)
    val two = Formats.readJson(spark, out, events.schema).select("event_id", "value")
    assert(two.schema.map(_.name) == Seq("event_id", "value"))
    assert(two.count() == events.count())
  }
}
