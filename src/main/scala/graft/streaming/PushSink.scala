package graft.streaming

import org.apache.spark.sql.{Dataset, ForeachWriter}

import graft.etl.model.AccountUpdate

/** K3 push-sink analog of the reference's Geyser plugin adapter
  * (geyser_plugin.rs:25-60, geyser.rs:47-71): a per-partition handler
  * lifecycle (`on_load` → N × `update_account` → `on_unload`) behind a
  * serializable trait. The dlopen/FFI plugin loading itself is out of scope
  * (SURVEY.md §2.8); any JVM implementation plugs in here.
  *
  * Unlike the reference (slot hardcoded to 0 — known TODO at geyser.rs:51),
  * we pass the record's real slot.
  */
trait AccountPushHandler extends Serializable {
  def onLoad(partitionId: Long): Unit = ()
  def updateAccount(u: AccountUpdate, isStartup: Boolean): Unit
  def onUnload(): Unit = ()
}

final class AccountForeachWriter(handler: AccountPushHandler, isStartup: Boolean)
    extends ForeachWriter[AccountUpdate] {
  override def open(partitionId: Long, epochId: Long): Boolean = {
    handler.onLoad(partitionId); true
  }
  override def process(u: AccountUpdate): Unit = handler.updateAccount(u, isStartup)
  override def close(errorOrNull: Throwable): Unit = handler.onUnload()
}

object PushSink {
  /** Batch push: per-partition handler lifecycle over a Dataset. */
  def push(ds: Dataset[AccountUpdate], handler: AccountPushHandler,
      isStartup: Boolean = false): Unit =
    ds.foreachPartition { (it: Iterator[AccountUpdate]) =>
      handler.onLoad(org.apache.spark.TaskContext.getPartitionId().toLong)
      try it.foreach(handler.updateAccount(_, isStartup))
      finally handler.onUnload()
    }

  /** Streaming push: ForeachWriter for `writeStream.foreach`. */
  def writer(handler: AccountPushHandler, isStartup: Boolean = false): ForeachWriter[AccountUpdate] =
    new AccountForeachWriter(handler, isStartup)
}
