package graft.cdc

/** Exactly-once restart semantics as pure functions (SURVEY §7.4.1).
  *
  * The reference resolves the stream-activation LSN with a decision table
  * (comment + code at ext/_informixcdcmodule.ec:2172-2194) fed by two
  * bookkeeping tables: `informixcdc_opntxns` (one row per open transaction;
  * restart candidate = `nvl(min(seq_number), 0)`, ec:590-591) and
  * `informixcdc_lsttxn` (highest committed LSN, loaded at activate,
  * ec:2104-2108). Records before the last committed LSN are then flagged
  * `discard_candidate` / `discard_transaction` for the consumer to drop
  * (ec:1459-1461, 1527-1529).
  */
object Restart {

  /** The activation decision table (ec:2172-2194):
    *
    * {{{
    * use_savepoints  requested      start LSN
    * any             >= 0           requested (explicit arg wins)
    * yes             -1 (default)   min open-txn seq; if none recorded (0)
    *                                and a committed LSN exists, last + 1
    * no              -1 (default)   0 (beginning of stream)
    * any             < -1           error
    * }}}
    *
    * @param requested     explicit LSN argument, -1 = "resolve from state"
    * @param useSavepoints whether bookkeeping state is maintained
    * @param minOpenTxn    `min(seq_number)` over open transactions, if any
    * @param lastCommitted highest committed LSN (0 = none recorded)
    */
  def resolveStartSeq(requested: Long, useSavepoints: Boolean,
                      minOpenTxn: Option[Long], lastCommitted: Long): Long = {
    require(requested >= -1, s"invalid seq_number $requested (must be >= -1)")
    if (requested >= 0) requested
    else if (!useSavepoints) 0L
    else {
      val fromOpen = minOpenTxn.getOrElse(0L)
      if (fromOpen == 0L && lastCommitted != 0L) lastCommitted + 1 else fromOpen
    }
  }

  /** A record at `seq` is a replay of already-committed history iff it
    * precedes the last committed LSN (ec:1459-1461, 1527-1529). The client
    * only *flags*; dropping is the consumer's choice. */
  def discardCandidate(seq: Long, lastCommitted: Long): Boolean =
    seq < lastCommitted

  /** Monotonic guard on the committed-LSN upsert (ec:747): the stored value
    * only advances. */
  def advanceLastCommitted(current: Long, commitSeq: Long): Long =
    math.max(current, commitSeq)
}
