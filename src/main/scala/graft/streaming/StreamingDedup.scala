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

  /** (id, 64-bit hash) input for the NEAR-dup stream — compute the hash
    * upstream ([[graft.pipeline.ImageHash.phash64]],
    * [[graft.pipeline.AudioHash.fingerprint64]], `graft_simhash`).
    */
  final case class HashKeyed(doc_id: Long, hash: Long)

  /** Stateful streaming NEAR-dup detection over 64-bit hashes: the
    * banded-Hamming candidate structure of [[graft.pipeline.ImageHash]]
    * as keyed state — each (band, 16-bit slice) group holds every seen
    * (id, hash) and vetoes arrivals within `maxDist` of a LOWER-id one
    * (exact recall for maxDist < bands by pigeonhole; verification runs
    * on the full hashes inside the handler, so banding adds no false
    * positives). Emits the doc_ids that near-dup an earlier doc —
    * AT-LEAST-ONCE per dup (a doc can match in several bands): consumers
    * treat the output as a set (anti-join the corpus against it).
    *
    * State per (band, bucket) group is `hash → min seen doc_id` — a map
    * over DISTINCT hashes, not every arrival, so an at-least-once
    * upstream redelivering a doc neither grows state nor self-vetoes
    * (the stored min id never vetoes an id ≥ itself). The min id carries
    * a superset of any stored id's veto power, so collapsing dups to it
    * changes no emission. State grows with the distinct corpus (bands
    * entries per distinct hash) — the in-memory counterpart of
    * [[graft.pipeline.HashDedupService]]'s persisted index. Use this as
    * the pipeline-embedded ingest guard; use the service when the corpus
    * outlives executor memory.
    */
  def nearDupStream(docs: Dataset[HashKeyed], maxDist: Int = 3,
      bands: Int = 4): Dataset[Long] = {
    require(64 % bands == 0 && maxDist < bands,
      s"need bands | 64 and maxDist < bands (got $bands, $maxDist)")
    val spark = docs.sparkSession
    import spark.implicits._
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // band rows as (band, bucket, doc_id, hash) tuples — product encoder
    docs.flatMap(k => (0 until bands).map(b =>
        (b, (k.hash >>> (b * width)) & mask, k.doc_id, k.hash)))
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[(Int, Long, Long, Long)],
            state: GroupState[Map[Long, Long]]) =>
          val acc = scala.collection.mutable.HashMap.from(
            state.getOption.getOrElse(Map.empty)) // hash → min seen doc_id
          val dups = Seq.newBuilder[Long]
          // id order within the batch → in-batch lower ids veto too,
          // matching the batch service's l < r semantics
          for ((_, _, id, hash) <- it.toSeq.sortBy(_._3)) {
            if (acc.exists { case (lh, lid) =>
                lid < id && java.lang.Long.bitCount(lh ^ hash) <= maxDist })
              dups += id
            // every seen doc vetoes later near-dups, dropped or not
            val cur = acc.getOrElse(hash, Long.MaxValue)
            if (id < cur) acc(hash) = id
          }
          state.update(acc.toMap)
          dups.result().iterator
      }
  }
}
