package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Par, Scored2Id, ScoredId, TopK2Agg, TopKAgg, TextFunctions}

/** Seeded randomized invariants for the pure building blocks. */
class PropertySpec extends SparkSpec {

  test("TopKAgg is merge-order independent (partial aggregation safe)") {
    val rnd = new Random(42)
    val agg = new TopKAgg(5)
    (1 to 50).foreach { _ =>
      val data = Vector.fill(200)(ScoredId(rnd.nextInt(50) / 10.0, rnd.nextLong().abs))
      val sequential = data.foldLeft(agg.zero)(agg.reduce)
      // random partitioning + merge tree
      val parts = data.grouped(rnd.nextInt(40) + 1).toVector
      val merged = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(sequential) == agg.finish(merged))
    }
  }

  test("TopKAgg keeps exactly the k best with id tie-breaks") {
    val rnd = new Random(7)
    val agg = new TopKAgg(10)
    val data = Vector.fill(500)(ScoredId(rnd.nextInt(20) / 10.0, rnd.nextInt(100000).toLong))
      .distinctBy(_.id)
    val got = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    val expected = data.sortBy(s => (-s.score, s.id)).take(10)
    assert(got == expected)
  }

  test("TopK2Agg is merge-order independent and honors the secondary key") {
    val rnd = new Random(99)
    val agg = new TopK2Agg(5)
    (1 to 50).foreach { _ =>
      val data = Vector.fill(200)(
        Scored2Id(rnd.nextInt(5) / 10.0, rnd.nextInt(5) / 10.0, rnd.nextInt(100000).toLong))
        .distinctBy(_.id)
      val sequential = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
      val parts = data.grouped(rnd.nextInt(40) + 1).toVector
      val merged = agg.finish(rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        .foldLeft(agg.zero)(agg.merge))
      assert(sequential == merged)
      val expected = data.sortBy(s => (-s.score, -s.score2, s.id)).take(5)
      assert(sequential == expected)
    }
  }

  test("pii_scrub is idempotent: scrubbing twice changes nothing") {
    val once = graft.operators.TextAnalysis.piiScrub(spark, sfDir)
      .select(col("doc_id"), col("scrubbed_text").as("text"))
    val pats = graft.operators.TextAnalysis.PiiPatterns
    val twice = pats.foldLeft(col("text")) { case (c, (_, p)) =>
      regexp_replace(c, p, "[REDACTED]")
    }
    val changed = once.select(col("doc_id"), (twice =!= col("text")).as("chg"))
      .where(col("chg")).count()
    assert(changed == 0L, s"$changed docs changed on second scrub")
  }

  test("Par.round4 is within 5e-5, idempotent, and kills negative zero") {
    val rnd = new Random(1)
    val vals = Seq.fill(2000)(rnd.nextDouble() * 2 - 1) ++
      Seq(-0.000001, 0.0, -0.0, 0.00005, -0.00005)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("x")
      .select(col("x"), Par.round4(col("x")).as("r"))
    df.collect().foreach { row =>
      val x = row.getDouble(0); val r = row.getDouble(1)
      assert(math.abs(r - x) <= 5.001e-5, s"$x -> $r")
      assert(java.lang.Double.doubleToLongBits(r)
        != java.lang.Double.doubleToLongBits(-0.0), s"negative zero from $x")
    }
    val twice = spark.createDataFrame(vals.map(Tuple1(_))).toDF("x")
      .select(Par.round4(col("x")).as("r1"))
      .select(col("r1"), Par.round4(col("r1")).as("r2"))
    twice.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("chunking invariants hold for random texts") {
    val rnd = new Random(3)
    val texts = Seq.fill(200) {
      val n = rnd.nextInt(400)
      (0 until n).map(_ => if (rnd.nextInt(6) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
    }.filter(_.trim.nonEmpty)
    val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("text")
      .select(col("text"), TextFunctions.chunks(col("text"), 50, 10).as("ch"))
    df.collect().foreach { row =>
      val text = row.getString(0)
      val chunks = row.getSeq[String](1)
      chunks.foreach { c =>
        assert(c.nonEmpty && c.length <= 50 && c == c.trim)
        assert(text.contains(c), s"chunk not a substring: '$c' of '$text'")
      }
      // reference semantics: text longer than chunk size ⇒ > 1 chunk
      if (text.trim.length > 50) assert(chunks.length > 1 || text.length <= 50)
    }
  }

  test("components matches a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new Random(11)
    (1 to 5).foreach { trial =>
      val n = 60 + trial * 30
      // random sparse graph: isolated-from-edges nodes excluded (the
      // operator's domain is nodes that appear in a pair)
      val edges = Vector.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val (labels, _) = graft.operators.Dedup.componentsWithRounds(
        edges.toDF("a_id", "b_id"))
      val got = labels.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      // driver-side union-find oracle with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = component minimum
      val members = parent.keys.toSeq
      val minOf = members.groupBy(find).map { case (r, ms) => r -> ms.min }
      val expected = members.map(m => m -> minOf(find(m))).toMap
      assert(got == expected,
        s"trial $trial: ${got.size} vs ${expected.size} labeled nodes, " +
          s"first diff: ${(got.toSet diff expected.toSet).take(3)}")
    }
  }

  test("minhashPerm stays within [0, P) for 32-bit inputs") {
    val rnd = new Random(9)
    val hs = Seq.fill(1000)(rnd.nextLong().abs % 4294967296L)
    val df = spark.createDataFrame(hs.map(Tuple1(_))).toDF("h")
      .select((0 until 16).map(p =>
        TextFunctions.minhashPerm(col("h"), lit(p.toLong)).as(s"m$p")): _*)
    df.collect().foreach { row =>
      (0 until 16).foreach { p =>
        val v = row.getLong(p)
        assert(v >= 0 && v < 4294967311L)
      }
    }
  }
}
