package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame

/** Streaming corpus statistics: the q54/q73 exact token-length profile
  * maintained CONTINUOUSLY over an arriving document stream. The whole
  * trick is the round-11 histogram rework: `CountHistogram` is a plain
  * aggregate, so a streaming `groupBy(lang)` keeps ONE state row per
  * language holding the exact `(n_tokens, count)` histogram — state
  * bounded by the token-count DOMAIN, not the stream length — and the
  * shared `profileFromHistogram` projection reads exact index-rule
  * percentiles off it every trigger. The r10 window/sort formulation is
  * not expressible on a stream at all (rank windows are unsupported), and
  * an `approx_percentile` stream would surrender exactness; this keeps
  * both. Drained output equals the batch q54/q73 over the same rows
  * (`StreamStatsSpec`).
  */
object StreamStats {

  /** Per-language exact length profile of a streaming `documents` frame
    * (`lang`, `text` columns). Complete-mode aggregation: emit with
    * `outputMode("complete")`.
    */
  def lengthProfile(docs: DataFrame): DataFrame =
    TextOps.profileFromHistogram(TextOps.tokenHistogram(docs))
}
