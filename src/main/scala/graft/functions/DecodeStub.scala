package graft.functions

/** Multimodal decode STUBS for codecs the environment lacks — now only
  * TRUE EXTERNAL codecs (H.264 et al.). The decode step here is a
  * deterministic fake — the Spark-side plumbing (binary columns, typed
  * metadata, partition-wise batch decode via `mapPartitions`) is real
  * and tested; swap these bodies for a real codec (ffmpeg bindings
  * etc.) in production. IMAGES and AUDIO do NOT need a stub: m4/m5 run
  * a genuine pure-JDK `javax.imageio` PNG encode→decode roundtrip and
  * m6 a genuine `javax.sound.sampled` WAV roundtrip through the same
  * batch-shaped kernel; m10 makes the VIDEO-CONTAINER path real too
  * (length-prefixed frame container parse + selective real PNG frame
  * decode), each oracle-gated against the synthesized payloads
  * ([[imageDims]] remains as the exotic-codec plumbing demo behind
  * m1's metadata pass, [[frameOffsets]] behind m2's sampler). */
object DecodeStub {

  /** Fake image-dimension probe: derived deterministically from the
    * payload so the DuckDB oracle can replicate it. */
  def imageDims(payload: Array[Byte]): (Int, Int) = {
    val first = if (payload.nonEmpty) payload(0) & 0xff else 0
    (64 + first % 64, 64 + payload.length % 64)
  }

  /** Batch decode: real codecs amortize setup per BATCH of payloads (the
    * `mapInPandas`/Arrow batch shape); callers feed partition-grouped
    * chunks. The stub is elementwise, but the signature and call pattern
    * are what a vectorized decoder needs. */
  def imageDimsBatch(payloads: Seq[Array[Byte]]): Seq[(Int, Int)] =
    payloads.map(imageDims)

  /** Fake frame sampler: deterministic frame offsets for a pretend video
    * payload (`n` evenly spaced positions). */
  def frameOffsets(payloadLength: Long, n: Int): Seq[Long] =
    if (payloadLength <= 0 || n <= 0) Seq.empty
    else (0 until n).map(i => i * payloadLength / n)
}
