package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Long

/** Streaming twin of the batch dataset mixer (operators/Pack
  * .datasetMix) — the one training-prep operator whose streaming
  * form is deliberately NOT self-adjusting, and here is why:
  *
  * The mix's keep-rates derive from a GLOBAL aggregate over a closed
  * corpus — capacity `T = min_s n_s/w_s`, rate `w_s·T/n_s`. On a
  * growing stream every arriving document moves `n_s`, so a
  * "running" rate estimate would make earlier keep/drop decisions
  * retroactively wrong (the deterministic coin threshold each doc
  * was judged against has moved). A revocation channel could express
  * that (the CurateStream retro-decontamination pattern), but a
  * trainer does not consume a revocable mixture — it reads an epoch's
  * worth of data whose composition was fixed when the epoch started.
  *
  * So the production contract this twin implements is EPOCH-FROZEN
  * rates: at each epoch boundary the batch operator computes the
  * |strata|-row rate table from the current corpus snapshot
  * (Pack.datasetMix's rates — or any explicit table), and the stream
  * applies it STATELESSLY — broadcast join + the same deterministic
  * md5 coin, no state, no watermark, exactly-once-equivalent under
  * replay because the coin is a pure function of doc_id. Strata
  * drift across an epoch shows up in the NEXT epoch's rates, which
  * is the granularity at which a training mixture can honestly
  * change. MixStreamSpec pins keep-set parity with the batch
  * operator under the same rate table.
  *
  * Scale shape: per micro-batch, a broadcast of |strata| rows
  * against the batch's scan — the same shuffle-free corpus side as
  * the batch mixer, at any stream rate.
  */
object MixStream {

  /** Apply an epoch-frozen rate table to a document stream.
    *
    * @param docs    streaming frame carrying `doc_id` and the stratum
    *                column (assigned upstream — metadata or a
    *                classifier map, e.g. TextAnalysis.predictedLang)
    * @param rates   STATIC (stratum, rate) frame — the epoch's frozen
    *                table, from Pack.datasetMix's rate build or an
    *                explicit policy
    * @param stratum the stratum column name in both frames
    * @param salt    coin salt — must match the batch operator whose
    *                rates these are: `mix:` for Pack.datasetMix
    *                (default), `mixt:` for the temperature mixer
    *                Pack.datasetMixTemperature, so either family's
    *                epoch-frozen rates replay stream-side with the
    *                exact batch keep set
    */
  def mixApply(spark: SparkSession, docs: DataFrame, rates: DataFrame,
               stratum: String = "lang", salt: String = "mix:"): DataFrame = {
    require(docs.columns.contains(stratum),
      s"stream is missing stratum column '$stratum'")
    require(rates.columns.toSet == Set(stratum, "rate"),
      s"rates must be exactly ($stratum, rate), got ${rates.columns.mkString(",")}")
    docs
      .join(broadcast(rates), stratum)
      // the SAME salted coin as the batch mixer — a doc kept by the
      // batch operator under these rates is kept here, and vice versa
      .where(md5Long(concat(lit(salt), col("doc_id").cast("string")), 1, 8)
        .cast("double") / 4294967296.0 < col("rate"))
  }
}
