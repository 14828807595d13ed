package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sources.SnapshotFixture

/** K3 plugin loading: compile a plugin AT TEST TIME (javax.tools), load it
  * through the jar/classes-dir + reflection path (≙ dlopen +
  * `_create_plugin`, geyser_plugin.rs:25-60), push a fixture snapshot. */
class GeyserPluginSpec extends SparkTestBase {

  private def compilePlugin(dir: String): Unit = {
    // counters append to a spool file: plugin instances live in per-task
    // classloaders, so statics cannot be read back from the test
    val src =
      s"""import graft.etl.model.AccountUpdate;
        |public class TestGeyserPlugin implements graft.streaming.AccountPushHandler {
        |  private long count = 0;
        |  private void spool(String line) {
        |    try {
        |      java.nio.file.Files.write(java.nio.file.Paths.get("$dir/events.log"),
        |        (line + "\\n").getBytes(),
        |        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND);
        |    } catch (java.io.IOException e) { throw new RuntimeException(e); }
        |  }
        |  public void onLoad(long partitionId) { synchronized (TestGeyserPlugin.class) { spool("load"); } }
        |  public void updateAccount(AccountUpdate u, boolean isStartup) {
        |    if (u.slot() <= 0) throw new IllegalStateException("real slot expected");
        |    count++;
        |  }
        |  public void onUnload() { synchronized (TestGeyserPlugin.class) { spool("count " + count); } }
        |}
        |""".stripMargin
    val f = Paths.get(dir, "TestGeyserPlugin.java")
    Files.write(f, src.getBytes("UTF-8"))
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    val rc = compiler.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", dir, f.toString)
    assert(rc === 0, "plugin compilation failed")
  }

  /** Jar the compiled class (≙ the reference's .so artifact). */
  private def jarUp(dir: String): String = {
    val jarPath = s"$dir/plugin.jar"
    val out = new java.util.jar.JarOutputStream(new java.io.FileOutputStream(jarPath))
    val cls = Paths.get(dir, "TestGeyserPlugin.class")
    out.putNextEntry(new java.util.jar.JarEntry("TestGeyserPlugin.class"))
    out.write(Files.readAllBytes(cls))
    out.closeEntry()
    out.close()
    jarPath
  }

  test("config-driven plugin load + account push (dlopen analog)") {
    val dir = Files.createTempDirectory("geyser").toString
    compilePlugin(dir)
    val jar = jarUp(dir)
    val cfg = s"""{"libpath": "$jar", "plugin_class": "TestGeyserPlugin",
                 | "account_data_notifications_enabled": true}""".stripMargin
    val cfgPath = s"$dir/geyser.json"
    Files.write(Paths.get(cfgPath), cfg.getBytes("UTF-8"))

    val handler = GeyserPluginLoader.load(cfgPath)

    // push a fixture snapshot through it; the plugin spools its lifecycle
    // events to a file (instances live in per-task classloaders)
    val fx = SnapshotFixture.generate(SnapshotFixture.Spec(seed = 5L))
    import spark.implicits._
    PushSink.push(spark.createDataset(fx.allRecords).repartition(4), handler)
    val lines = scala.io.Source.fromFile(s"$dir/events.log").getLines().toSeq
    assert(lines.count(_ == "load") === 4)       // one on_load per partition
    val pushed = lines.filter(_.startsWith("count ")).map(_.stripPrefix("count ").toLong).sum
    assert(pushed === fx.allRecords.size.toLong)
  }

  test("disabled account notifications abort the load (main.rs:74-77)") {
    val dir = Files.createTempDirectory("geyser-off").toString
    compilePlugin(dir)
    val cfgPath = s"$dir/geyser.json"
    val jar = jarUp(dir)
    Files.write(Paths.get(cfgPath),
      s"""{"libpath": "$jar", "plugin_class": "TestGeyserPlugin",
         | "account_data_notifications_enabled": false}""".stripMargin.getBytes("UTF-8"))
    intercept[IllegalArgumentException](GeyserPluginLoader.load(cfgPath))
  }
}
