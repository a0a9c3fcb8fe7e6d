package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The engine's tested example of the typed-UDAF surface (SURVEY X5):
  * the reference's client-side balance ledger (`oltp_seeder.py:450-470`
  * — a Python dict of signed running balances, floored at zero on
  * withdrawal) as an `Aggregator[Tx, Buf, BigDecimal]`.
  *
  * Note a semantics difference the typed surface makes explicit: the
  * reference applies `max(0, balance - amount)` PER EVENT, which is
  * order-dependent and non-associative — no distributed merge can
  * reproduce it exactly, so this aggregator implements the associative
  * net-sum ledger (and q30 is the declarative equivalent). The
  * divergence is documented rather than copied (SURVEY A5 note).
  */
object LedgerAggregator {

  final case class Tx(transaction_type: String, amount: BigDecimal)

  /** Signed delta per the reference's rules: deposits/refunds add,
    * withdrawals/payments subtract, transfers subtract (the
    * counterparty leg is a separate row). */
  def signed(t: Tx): BigDecimal = t.transaction_type match {
    case "Deposit" | "Refund" => t.amount
    case _                    => -t.amount
  }

  /** Simple associative ledger: net signed sum. */
  val netSum: Aggregator[Tx, BigDecimal, BigDecimal] =
    new Aggregator[Tx, BigDecimal, BigDecimal] {
      def zero: BigDecimal = BigDecimal(0)
      def reduce(b: BigDecimal, t: Tx): BigDecimal = b + signed(t)
      def merge(a: BigDecimal, b: BigDecimal): BigDecimal = a + b
      def finish(b: BigDecimal): BigDecimal = b.setScale(2)
      def bufferEncoder: Encoder[BigDecimal] = Encoders.kryo[BigDecimal]
      def outputEncoder: Encoder[BigDecimal] = Encoders.kryo[BigDecimal]
    }
}
