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

  test("explicit-schema read prunes and types correctly") {
    val out = Files.createTempDirectory("graft_json2").toString + "/events"
    Formats.writeJson(events, out)
    val two = Formats.readJson(spark, out, events.schema).select("event_id", "value")
    assert(two.schema.map(_.name) == Seq("event_id", "value"))
    assert(two.count() == events.count())
  }
}
