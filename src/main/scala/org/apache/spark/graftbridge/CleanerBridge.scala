package org.apache.spark.graftbridge

import org.apache.spark.{ContextCleaner, SparkContext}

/** Package-private-bridging access to the ContextCleaner — the
  * measurement surface for Bench's soak-mode cleaner drain. The round-14
  * sf10 soak protocol finding: a long single-JVM suite accumulates
  * cleanup debt (dropped broadcast/shuffle references whose async
  * cleaning competes with the NEXT query's timed slot), inflating
  * successor timings 2–100×. The fix is to finish that cleaning BETWEEN
  * timed slots, which needs visibility into the cleaner's backlog:
  * `referenceBuffer` holds every still-tracked object (live ones AND
  * those awaiting post-GC cleanup), so after a System.gc() its size
  * falling = the cleaning thread working through the wave, and its size
  * stabilizing = the wave drained. `sc.cleaner` is private[spark],
  * hence this bridge lives under org.apache.spark; the buffer field
  * itself is class-private, so one narrow reflective read (no behavior
  * is touched).
  */
object CleanerBridge {

  private lazy val bufferField: Option[java.lang.reflect.Field] =
    try {
      val f = classOf[ContextCleaner].getDeclaredField("referenceBuffer")
      f.setAccessible(true)
      Some(f)
    } catch { case _: Throwable => None }

  /** Number of objects the cleaner still tracks (live + pending
    * cleanup); -1 if the cleaner is disabled or the field moved.
    */
  def referenceBufferSize(sc: SparkContext): Int =
    sc.cleaner.flatMap { c =>
      bufferField.map(_.get(c).asInstanceOf[java.util.Set[_]].size)
    }.getOrElse(-1)

  /** Drain the post-GC cleanup wave: trigger a full GC (which enqueues
    * unreachable tracked refs), then poll until the buffer stops
    * shrinking for two consecutive samples (or `maxMillis` elapses).
    * Two GC rounds catch stragglers promoted past the first collection.
    * A best-effort no-op when the cleaner/field is unavailable.
    */
  def drain(sc: SparkContext, maxMillis: Long = 10000L): Unit = {
    val deadline = System.nanoTime() + maxMillis * 1000000L
    var round = 0
    while (round < 2 && System.nanoTime() < deadline) {
      System.gc()
      var last = Int.MaxValue
      var stable = 0
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val sz = referenceBufferSize(sc)
        if (sz < 0) return
        if (sz >= last) stable += 1 else stable = 0
        last = sz
      }
      round += 1
    }
  }
}
