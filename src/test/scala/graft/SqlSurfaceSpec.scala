package graft

class SqlSurfaceSpec extends SparkSpec {

  test("every operator is queryable through spark.sql views") {
    Graft.registerViews(spark, sfDir)
    // spot-query a cross-section through pure SQL, including a join
    // between two operator views
    val sessions = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_sessionize WHERE n_events > 1")
      .collect().head.getAs[Long]("n")
    assert(sessions > 0)
    val joined = spark.sql(
      """SELECT q.doc_id FROM graft_quality_score q
        |JOIN graft_lang_id l ON q.doc_id = l.doc_id
        |WHERE q.quality > 0.5 AND l.predicted = 'exec' LIMIT 5""".stripMargin)
      .collect()
    assert(joined.nonEmpty)
    val ask = spark.sql(
      "SELECT q_id, search_effectiveness FROM graft_ask_batch ORDER BY q_id")
      .collect()
    assert(ask.length == 2)
  }
}
