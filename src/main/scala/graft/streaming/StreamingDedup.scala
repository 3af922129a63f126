package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming EXACT dedup: first-seen-wins over a
  * fingerprint-keyed stream — the ingest-time guard that keeps a
  * continuously-fed corpus duplicate-free without re-scanning it.
  *
  * State is one boolean per distinct fingerprint (a seen-set), the
  * minimum state any exact dedup can carry; events fold into it without
  * buffering. A batch's work is one shuffle on the fingerprint.
  *
  * Convergence contract (what the oracle checks): with batches fed in
  * ascending id order, the emitted winner per fingerprint is the GLOBAL
  * minimum id — identical to [[graft.pipeline.Dedup.exact]] run on the
  * full corpus. Within a batch arrival order is irrelevant (the handler
  * takes the min over the batch's group); across batches the seen-set
  * suppresses later duplicates. Unordered feeds still dedup exactly,
  * just with first-arrival (not min-id) winners — the usual streaming
  * semantics.
  */
object StreamingDedup {

  /** (id, fingerprint) input — compute the fingerprint upstream with
    * [[graft.pipeline.TextStats.fingerprintHex]].
    */
  final case class Keyed(doc_id: Long, fp: String)

  /** Emits each fingerprint's winning doc_id exactly once. */
  def dedupStream(docs: Dataset[Keyed]): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.map(_.doc_id).min)
          }
      }
  }
}
