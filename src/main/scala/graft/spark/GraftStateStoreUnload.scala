package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Unloads state-store providers when the last streaming query stops.
  *
  * In local mode every stateful streaming query loads one state-store
  * provider per shuffle partition into the executor-wide
  * `StateStore.loadedProviders` registry. Stopping the query does NOT
  * unload them: they linger until the maintenance thread walks them or
  * the SparkEnv shuts down, so a session that runs many short streaming
  * queries (replays, backfills, tests) accumulates dozens of providers
  * whose maintenance walks, snapshot uploads and memory charge bill the
  * QUERIES THAT FOLLOW. This listener releases the providers at the
  * moment the engine knows they are dead: when a query terminates and
  * no other streaming query is active.
  *
  * Unloading is safe at any point — `StateStore.get` reloads a provider
  * on demand from its checkpoint files — so a rare race with a query
  * starting concurrently costs one provider reload, never correctness.
  * Registered via `spark.sql.streaming.streamingQueryListeners` in the
  * shared session builder (bench, verify and tests alike).
  */
class GraftStateStoreUnloadListener extends StreamingQueryListener {

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = ()

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val anyActive = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .exists(_.streams.active.nonEmpty)
    if (!anyActive) SparkInternals.unloadAllStateStores()
  }
}
