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
    // deterministic scatter: hash of the full row, not rand()
    val bigSalted = big.withColumn("_salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val smallReplicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
