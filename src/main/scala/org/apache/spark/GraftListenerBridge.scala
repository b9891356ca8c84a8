package org.apache.spark

/** Test-support bridge into `private[spark]` listener plumbing: specs
  * that assert on task metrics (e.g. the no-payloads-on-the-driver
  * proof over sidecar planning) must drain the async listener bus
  * before reading their accumulators, or the assertion races event
  * delivery. */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
