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

  test("publishing a new fingerprint sweeps the superseded table (staging GC)") {
    val root = Files.createTempDirectory("graft_dfc_gc").toString
    System.setProperty("graft.staging", root)
    try {
      // a key whose sanitized form merely EXTENDS k4's must survive the
      // sweep — only a pure-fingerprint tail identifies k4's tables
      DfCache.stagedFrame(spark, "k4:/x_more", "cafecafecafecafe")(frame())
      DfCache.stagedFrame(spark, "k4:/x", "aaaaaaaaaaaaaaaa")(frame())
      DfCache.stagedFrame(spark, "k4:/x", "bbbbbbbbbbbbbbbb")(frame())
      val names = new java.io.File(s"$root/v${DfCache.StagingVersion}")
        .listFiles().map(_.getName).toSeq
      assert(!names.contains("k4__x_aaaaaaaaaaaaaaaa"),
        s"superseded fingerprint not swept: $names")
      assert(names.contains("k4__x_bbbbbbbbbbbbbbbb"), s"live table swept: $names")
      assert(names.contains("k4__x_more_cafecafecafecafe"),
        s"prefix-sharing OTHER key swept: $names")
    } finally System.clearProperty("graft.staging")
  }

  test("gc() drops older-version trees and TTL-expired entries") {
    val root = Files.createTempDirectory("graft_dfc_gc2").toString
    System.setProperty("graft.staging", root)
    try {
      val old = new java.io.File(s"$root/v${DfCache.StagingVersion - 1}/stale_table")
      old.mkdirs()
      DfCache.stagedFrame(spark, "k5:/x", "fp")(frame())
      val live = new java.io.File(DfCache.stagingPath("k5:/x", "fp"))
      DfCache.gc(spark)
      assert(!old.exists(), "older-version tree survived gc()")
      assert(live.exists(), "current-version table swept by default gc()")
      // TTL sweep: age the entry, then gc with a 1-hour TTL
      live.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)
      DfCache.gc(spark, maxAgeMs = 3600 * 1000L)
      assert(!live.exists(), "TTL-expired entry survived gc(maxAgeMs)")
    } finally System.clearProperty("graft.staging")
  }

  test("inputFingerprint distinguishes same-named files in different subdirs") {
    val r1 = Files.createTempDirectory("graft_fp1").toFile
    val r2 = Files.createTempDirectory("graft_fp2").toFile
    new java.io.File(r1, "a").mkdirs(); new java.io.File(r2, "b").mkdirs()
    val f1 = new java.io.File(r1, "a/part-0.parquet")
    val f2 = new java.io.File(r2, "b/part-0.parquet")
    Files.write(f1.toPath, "same-bytes".getBytes)
    Files.write(f2.toPath, "same-bytes".getBytes)
    val t = 1700000000000L   // identical name, length AND mtime
    f1.setLastModified(t); f2.setLastModified(t)
    assert(DfCache.inputFingerprint(spark, r1.toString) !=
      DfCache.inputFingerprint(spark, r2.toString),
      "basename-only fingerprint: different layouts collide")
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

  test("memoComputes counts cold computes only, never memo hits") {
    import spark.implicits._
    val key = "memo-count-test:" + System.nanoTime()
    val before = DfCache.memoComputes
    val f1 = DfCache.getOrCompute(spark, key)(
      Seq(1, 2, 3).toDF("v").localCheckpoint())
    assert(DfCache.memoComputes == before + 1, "cold compute must count")
    val f2 = DfCache.getOrCompute(spark, key)(
      fail("memo hit must not recompute"))
    assert(f2 eq f1)
    assert(DfCache.memoComputes == before + 1, "a memo hit must not count")
    DfCache.evictKey(spark, key)
    DfCache.getOrCompute(spark, key)(
      Seq(1).toDF("v").localCheckpoint())
    assert(DfCache.memoComputes == before + 2,
      "recompute after eviction must count again")
    DfCache.evictKey(spark, key)
  }

  test("getOrComputeRotating evicts the previous epoch's entry under the prefix") {
    import spark.implicits._
    val prefix = "rotate-test-" + System.nanoTime()
    val v1 = DfCache.getOrComputeRotating(spark, prefix, "v1")(
      Seq(1).toDF("v").persist())
    // same tag: memo hit, nothing evicted
    val v1again = DfCache.getOrComputeRotating(spark, prefix, "v1")(
      fail("memo hit must not recompute"))
    assert(v1again eq v1)
    // new tag: v1's cell is evicted and its frame unpersisted
    val v2 = DfCache.getOrComputeRotating(spark, prefix, "v2")(
      Seq(2).toDF("v").persist())
    assert(v1.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "rotation must unpersist the previous epoch's frame")
    val recomputed = DfCache.getOrComputeRotating(spark, prefix, "v1")(
      Seq(3).toDF("v").persist())
    assert(recomputed.collect().head.getInt(0) == 3,
      "a rotated-out tag recomputes instead of serving stale blocks")
    DfCache.evictKey(spark, s"$prefix:v1")
    DfCache.evictKey(spark, s"$prefix:v2")
    val _ = v2
  }
}
