package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-side concurrency for INDEPENDENT branches of one query —
  * guide §2.6: Spark happily runs several jobs at once inside one
  * application; actions are only sequential because the driver calls
  * them sequentially. The serving compositions (hybrid retrieval:
  * lexical branch ⊕ semantic branch, BM25 ⊕ quality prior) build two
  * branch plans whose construction and materialization each pay a
  * chain of bounded driver actions (probe collects, sized-count
  * checkpoints, AQE stage materializations). Submitting the branches
  * from separate driver threads overlaps those chains, so the
  * composition's wall time approaches max(branch) instead of
  * sum(branches) — and on a cluster the second branch's tasks
  * back-fill executors the first branch's tail leaves idle.
  *
  * Each thunk builds AND [[Materialize]]s its branch (bounded top-k
  * rows — the same checkpoint the fusion consumers would otherwise
  * force piecemeal); rows are byte-identical to the sequential plan,
  * only the submission order changes. Failures propagate: the first
  * branch exception rethrows after the pool drains.
  */
private[graft] object Concurrent {

  /** Materialize independent branch thunks concurrently; returns the
    * checkpointed frames in input order. */
  def materializeAll(branches: Seq[() => DataFrame]): Seq[DataFrame] =
    if (branches.lengthCompare(2) < 0) branches.map(b => Materialize(b()))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        branches.size,
        (r: Runnable) => {
          val t = new Thread(r, "graft-branch")
          t.setDaemon(true)
          t
        })
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val futs = branches.map(b => scala.concurrent.Future(Materialize(b())))
        futs.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
      } finally pool.shutdown()
    }

  /** Two-branch convenience. */
  def materialize2(a: () => DataFrame, b: () => DataFrame): (DataFrame, DataFrame) = {
    val r = materializeAll(Seq(a, b))
    (r(0), r(1))
  }
}
