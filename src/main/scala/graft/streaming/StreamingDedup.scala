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

  /** (id, fingerprint, event time) input for the WATERMARK-BOUNDED exact
    * guard.
    */
  final case class KeyedEvent(doc_id: Long, fp: String, ts: java.sql.Timestamp)

  /** Exact dedup with BOUNDED state: a fingerprint's seen-bit lives one
    * watermark horizon past its newest arrival, then evicts via event-time
    * timeout — the `dropDuplicatesWithinWatermark` contract with this
    * module's min-id winner semantics. The trade is explicit: duplicates
    * separated by MORE than `delay` may re-emit (their state is gone);
    * within the horizon the guard is exact. Use this form for unbounded
    * feeds where [[dedupStream]]'s forever-state would outgrow executors;
    * the persisted [[graft.pipeline.DedupService]] remains the exact
    * unbounded path.
    */
  def dedupStreamWithinWatermark(docs: Dataset[KeyedEvent],
      delay: java.time.Duration): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delay.toMillis
    docs.withWatermark("ts", s"$delayMs milliseconds")
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[KeyedEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // horizon passed: evict the seen-bit
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            val out =
              if (state.exists) Iterator.empty
              else { state.update(true); Iterator.single(rows.map(_.doc_id).min) }
            val newest = rows.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(newest + delayMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** (id, 64-bit hash) input for the NEAR-dup stream — compute the hash
    * upstream ([[graft.pipeline.ImageHash.phash64]],
    * [[graft.pipeline.AudioHash.fingerprint64]], `graft_simhash`).
    */
  final case class HashKeyed(doc_id: Long, hash: Long)

  /** (id, hash, event time) input for the watermark-bounded near-dup
    * guard.
    */
  final case class HashKeyedEvent(doc_id: Long, hash: Long, ts: java.sql.Timestamp)

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
    *
    * CHECKPOINT COMPATIBILITY: the state encoding changed from
    * `Seq[(Long, Long)]` (every arrival) to `Map[Long, Long]`
    * (hash → min id) when state was bounded by distinct hashes. A
    * streaming query resuming from a checkpoint written by the old
    * encoding will fail state deserialization — restart such queries
    * with a fresh checkpoint (and re-seed by replaying the corpus, or
    * cut over to [[graft.pipeline.HashDedupService]], whose index is
    * persistent and encoding-stable).
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

  /** Near-dup guard with BOUNDED state: each (band, bucket) group keeps
    * `hash → (min id, newest event time)` and evicts entries whose newest
    * sighting fell behind the watermark — a doc vetoes near-dups for one
    * `delay` horizon past its last arrival, then ages out (so state is
    * bounded by the horizon's distinct hashes, not the corpus). Same
    * banded recall contract as [[nearDupStream]] within the horizon.
    */
  def nearDupStreamWithinWatermark(docs: Dataset[HashKeyedEvent],
      delay: java.time.Duration, maxDist: Int = 3, bands: Int = 4): Dataset[Long] = {
    require(64 % bands == 0 && maxDist < bands,
      s"need bands | 64 and maxDist < bands (got $bands, $maxDist)")
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delay.toMillis
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // the watermark attaches AFTER the band explode: the typed flatMap
    // re-creates the row object, so an earlier event-time tag wouldn't
    // survive it
    docs.flatMap(k => (0 until bands).map(b =>
        (b, (k.hash >>> (b * width)) & mask, k.doc_id, k.hash, k.ts)))
      .toDF("band", "bucket", "doc_id", "hash", "ts")
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[(Int, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), it: Iterator[(Int, Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[Map[Long, (Long, Long)]]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val kept = state.getOption.getOrElse(Map.empty)
              .filter { case (_, (_, seen)) => seen + delayMs > wm }
            if (kept.isEmpty) state.remove()
            else {
              state.update(kept)
              state.setTimeoutTimestamp(math.max(
                kept.values.map(_._2).max + delayMs, wm + 1))
            }
            Iterator.empty
          } else {
            val acc = scala.collection.mutable.HashMap.from(
              state.getOption.getOrElse(Map.empty)
                .filter { case (_, (_, seen)) => seen + delayMs > wm })
            val dups = Seq.newBuilder[Long]
            val rows = it.toSeq
            for ((_, _, id, hash, ts) <- rows.sortBy(_._3)) {
              if (acc.exists { case (lh, (lid, _)) =>
                  lid < id && java.lang.Long.bitCount(lh ^ hash) <= maxDist })
                dups += id
              val (curId, curSeen) = acc.getOrElse(hash, (Long.MaxValue, Long.MinValue))
              acc(hash) = (math.min(curId, id), math.max(curSeen, ts.getTime))
            }
            state.update(acc.toMap)
            state.setTimeoutTimestamp(math.max(
              rows.map(_._5.getTime).max + delayMs, wm + 1))
            dups.result().iterator
          }
      }
  }
}
