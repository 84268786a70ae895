package graft.streaming

/** Shared small daemon pool for concurrent state-table materialization
  * waves (IncrementalDenormalizer.parMaterialize and
  * IncrementalAggregate's async latest-state persist). Bounded: each
  * submitted job already fans out across executor cores; the pool only
  * overlaps job scheduling + I/O latencies (guide §2.6 — independent
  * actions submitted from driver threads back-fill each other's task
  * tails).
  */
private[streaming] object Waves {
  lazy val ec: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        8,
        (r: Runnable) => {
          val t = new Thread(r, "graft-wave")
          t.setDaemon(true)
          t
        }))
}
