package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most
  * cases at runtime; explicit salting is the deterministic fallback
  * when one key dominates (e.g., a null-ish default user or a viral
  * document): the big side scatters each key over `saltFactor`
  * sub-keys, the small side is replicated `saltFactor` times, and
  * the join runs on (key, salt) — no single reducer sees the whole
  * hot key.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already carry a _salt column")
    // per-row ordinal scatter, not a content hash: a hot key made of
    // byte-identical rows (the exact default-user case above) would
    // hash to ONE salt and defeat the whole exercise; the ordinal
    // spreads duplicates evenly and join correctness never depends on
    // the salt value
    val bigSalted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val smallReplicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    bigSalted.join(smallReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
