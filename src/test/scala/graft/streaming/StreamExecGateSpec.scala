package graft.streaming

import graft.{SparkEntry, SparkSpec}

/** Pins that q_stream_exec_windowed really exercises the streaming
  * EXECUTION path (r11 verdict #6): the gate row's result must come from
  * a multi-micro-batch StreamingQuery run, and must equal the gated batch
  * twin's windowed counts exactly. */
class StreamExecGateSpec extends SparkSpec {

  test("gate row runs a real multi-batch StreamingQuery and matches the batch twin") {
    val streamed = SparkEntry.queries("q_stream_exec_windowed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(graft.queries.StreamTwinQueries.lastStreamBatches >= 2L,
      "the streaming gate must accumulate state across >= 2 micro-batches, " +
        s"saw ${graft.queries.StreamTwinQueries.lastStreamBatches}")
    val batch = SparkEntry.queries("q_stream_windowed_counts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "streaming execution diverged from the batch windowed counts")
  }

  test("re-invocation is memoized: the sink is stable within a session") {
    val a = SparkEntry.queries("q_stream_exec_windowed")(spark, sf).collect()
    val b = SparkEntry.queries("q_stream_exec_windowed")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }
}
