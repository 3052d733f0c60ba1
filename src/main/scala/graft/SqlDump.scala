package graft

/** Dump named oracle SQL spellings to files — the reproducible input
  * of the cross-spelling DuckDB equivalence diffs the gate discipline
  * requires whenever a doc-level oracle is replaced by its quotient
  * form (rounds 12 and 15): `runMain graft.SqlDump <outDir>` writes
  * one .sql file per known spelling; tools/spelling_diff.py then
  * proves the full result sets EQUAL in DuckDB at the chosen SFs. No
  * Spark session — pure string assembly.
  */
object SqlDump {
  private val known: Map[String, () => String] = Map(
    "minhash_pairs_doc"        -> (() => SparkEntry.minhashPairsSql),
    "minhash_pairs_quotient"   -> (() => SparkEntry.minhashQuotientPairsSql),
    "minhash_grouped_doc"      -> (() => SparkEntry.minhashGroupedDocLevelSql),
    "minhash_grouped_quotient" -> (() => SparkEntry.minhashGroupedQuotientSql))

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(out)
    known.foreach { case (n, sql) =>
      java.nio.file.Files.writeString(out.resolve(s"$n.sql"), sql())
    }
    println(s"[sqldump] wrote ${known.size} spellings to $out")
  }
}
