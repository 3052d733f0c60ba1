package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Present a corpus-sized result in key order — the determinism the
  * oracle diff and a human reader want, but a GLOBAL range exchange a
  * 100 TB caller materializing the cleaned corpus should skip
  * (`sorted = false`): the next pipeline stage reads shards, not a
  * totally-ordered table. Gate spellings keep the default.
  *
  * One spelling for the whole apply family (dedup_apply, neardup_apply,
  * curate_apply, gopher_filter, c4_filter, fineweb_linededup,
  * clean_text, pii_scrub, quality_perplexity_apply, semdedup_apply)
  * and the Pack family that pioneered the contract.
  */
private[graft] object Present {
  def presented(df: DataFrame, sorted: Boolean, keys: String*): DataFrame =
    if (sorted) df.orderBy(keys.map(col): _*) else df
}
