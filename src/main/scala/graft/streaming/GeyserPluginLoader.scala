package graft.streaming

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** K3 — Geyser plugin LOADING, the JVM analog of the reference's dlopen
  * path (geyser_plugin.rs:25-60 driven from main.rs:71-84):
  *
  * | reference (FFI)                        | here (JVM)                     |
  * |----------------------------------------|--------------------------------|
  * | JSON5 config with `libpath`            | JSON config with `libpath`     |
  * | `dlopen(libpath)`                      | `URLClassLoader(libpath jar)`  |
  * | resolve `_create_plugin` symbol        | `plugin_class` no-arg ctor     |
  * | `plugin.on_load(config_file)`          | `onLoad` (per partition)       |
  * | assert `account_data_notifications_enabled` (main.rs:74-77) | same flag check at load |
  * | `update_account(V0_0_2{...}, slot, is_startup)` | `updateAccount` with the REAL slot (the reference hardcodes 0 — known TODO geyser.rs:51) |
  *
  * The loaded class must implement [[AccountPushHandler]]; the account
  * stream is then driven by [[PushSink]] exactly like any other handler.
  */
object GeyserPluginLoader {

  final case class Config(
      libpath: String,
      pluginClass: String,
      accountDataNotificationsEnabled: Boolean)

  def readConfig(configPath: String): Config = {
    val node = new ObjectMapper().readTree(Files.readAllBytes(Paths.get(configPath)))
    require(node.has("libpath"), s"geyser config $configPath missing 'libpath'")
    require(node.has("plugin_class"), s"geyser config $configPath missing 'plugin_class'")
    Config(
      libpath = node.get("libpath").asText(),
      pluginClass = node.get("plugin_class").asText(),
      accountDataNotificationsEnabled =
        !node.has("account_data_notifications_enabled") ||
          node.get("account_data_notifications_enabled").asBoolean(true))
  }

  /** Serializable lazy-loading wrapper: only (libpath, class) strings ride
    * the task closure; EACH executor JVM opens the jar and instantiates the
    * plugin on first use — the distributed analog of every worker
    * dlopen-ing the shared library (the jar path must be visible to
    * executors, exactly as a .so path must be). */
  final class DistributedPluginHandler(libpath: String, pluginClass: String)
      extends AccountPushHandler {
    @transient private lazy val delegate: AccountPushHandler =
      GeyserPluginLoader.instantiate(libpath, pluginClass)
    override def onLoad(partitionId: Long): Unit = delegate.onLoad(partitionId)
    override def updateAccount(u: graft.etl.model.AccountUpdate, isStartup: Boolean): Unit =
      delegate.updateAccount(u, isStartup)
    override def onUnload(): Unit = delegate.onUnload()
  }

  private[streaming] def instantiate(libpath: String, pluginClass: String): AccountPushHandler = {
    val url = Paths.get(libpath).toUri.toURL
    val loader = new java.net.URLClassLoader(Array(url), getClass.getClassLoader)
    val cls = Class.forName(pluginClass, true, loader)
    cls.getDeclaredConstructor().newInstance() match {
      case h: AccountPushHandler => h
      case other => throw new IllegalArgumentException(
        s"${other.getClass.getName} does not implement AccountPushHandler")
    }
  }

  /** Load the plugin jar (≙ the reference's `.so`): validate the config and
    * the plugin by instantiating it once driver-side, enforce the
    * notifications flag (the reference aborts when the plugin does not
    * consume account updates, main.rs:74-77), and return the distributed
    * wrapper. */
  def load(configPath: String): AccountPushHandler = {
    val cfg = readConfig(configPath)
    require(cfg.accountDataNotificationsEnabled,
      "plugin has account data notifications disabled (main.rs:74-77)")
    require(Files.isRegularFile(Paths.get(cfg.libpath)),
      s"libpath ${cfg.libpath} is not a plugin jar")
    instantiate(cfg.libpath, cfg.pluginClass) // driver-side validation (≙ _create_plugin probe)
    new DistributedPluginHandler(cfg.libpath, cfg.pluginClass)
  }
}
