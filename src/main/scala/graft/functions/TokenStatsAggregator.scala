package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Corpus token statistics in one pass. */
final case class TokenStats(n_docs: Long, total_tokens: Long, max_tokens: Long)

/** Typed `Aggregator[IN, BUF, OUT]` (the facility SURVEY §2B notes the
  * reference never needed but a pipeline engine should offer): aggregates
  * per-document token counts into corpus stats with a mergeable buffer —
  * the same partial/final shape Catalyst uses for map-side combine, so it
  * scales like any built-in aggregate. Use via `F.udaf(TokenStatsAggregator)`
  * or `.toColumn` on a typed Dataset. */
object TokenStatsAggregator extends Aggregator[Int, TokenStats, TokenStats] {
  override def zero: TokenStats = TokenStats(0L, 0L, 0L)
  override def reduce(b: TokenStats, tokens: Int): TokenStats =
    TokenStats(b.n_docs + 1, b.total_tokens + tokens, math.max(b.max_tokens, tokens.toLong))
  override def merge(a: TokenStats, b: TokenStats): TokenStats =
    TokenStats(a.n_docs + b.n_docs, a.total_tokens + b.total_tokens,
      math.max(a.max_tokens, b.max_tokens))
  override def finish(r: TokenStats): TokenStats = r
  override def bufferEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
  override def outputEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
}
