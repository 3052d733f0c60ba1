package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Staging-layer behavior: write-once publication, corrupt-leftover
  * recovery, and the never-a-correctness-dependency fallback.
  */
class DfCacheSpec extends SparkSpec {

  private def frame() = {
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 2.5)).toDF("id", "v")
  }

  test("stagedFrame publishes once and re-serves the staged table") {
    val root = Files.createTempDirectory("graft_dfc").toString
    System.setProperty("graft.staging", root)
    try {
      var builds = 0
      def build() = { builds += 1; frame() }
      val a = DfCache.stagedFrame(spark, "k1:/x", "fp1")(build()).collect()
      assert(builds == 1 && a.length == 100)
      // second call: must read the staged table WITHOUT forcing the
      // by-name compute — that skip is the entire cold-pass saving
      val b = DfCache.stagedFrame(spark, "k1:/x", "fp1")(build()).collect()
      assert(builds == 1, s"staged table present but compute ran ($builds builds)")
      assert(b.sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq ==
        a.sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq)
      val staged = new java.io.File(s"$root/v${DfCache.StagingVersion}")
        .listFiles().map(_.getName).toSeq
      assert(staged.exists(_.startsWith("k1")), s"no staged table: $staged")
      assert(!staged.exists(_.contains(".tmp-")), s"tmp leftover: $staged")
      // a different fingerprint is a different table — stale data is
      // never served after the input changes
      val c = DfCache.stagedFrame(spark, "k1:/x", "fp2")(frame().where(col("id") <= 10))
      assert(c.count() == 10)
    } finally System.clearProperty("graft.staging")
  }

  test("stagedFrame discards a half-written table (no _SUCCESS) and rebuilds") {
    val root = Files.createTempDirectory("graft_dfc2").toString
    System.setProperty("graft.staging", root)
    try {
      val dir = new java.io.File(DfCache.stagingPath("k2:/x", "fp"))
      dir.mkdirs()
      Files.writeString(dir.toPath.resolve("part-junk.parquet"), "not parquet")
      val out = DfCache.stagedFrame(spark, "k2:/x", "fp")(frame()).collect()
      assert(out.length == 100, "half-written leftover not recovered")
      assert(new java.io.File(dir, "_SUCCESS").exists())
    } finally System.clearProperty("graft.staging")
  }

  test("stagedFrame falls back to localCheckpoint when the root is unwritable") {
    // a FILE where the root should be: every fs op under it fails
    val blocker = Files.createTempFile("graft_dfc3", ".blk").toString
    System.setProperty("graft.staging", blocker + "/sub")
    try {
      val out = DfCache.stagedFrame(spark, "k3:/x", "fp")(frame()).collect()
      assert(out.length == 100, "fallback did not serve the computed frame")
    } finally System.clearProperty("graft.staging")
  }
}
