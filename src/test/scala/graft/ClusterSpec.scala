package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.TimeUnit
import java.nio.file.Files

/** Drives [[graft.tools.ClusterCheck]] in a SEPARATE JVM (one SparkContext
  * per JVM — the shared local[4] test session cannot coexist with a
  * local-cluster context) and asserts its verdict: under
  * `local-cluster[2,2,2048]` with REAL executor JVMs,
  *
  *  - reliable-checkpoint label propagation survives a forcible executor
  *    kill mid-convergence and produces labels identical to a quiet
  *    single-JVM run, and
  *  - an AQE skew-split join over real network shuffle returns the same
  *    sum as the unsplit plan, with the split observed to fire.
  *
  * This is the Spark-native twin of the reference's distributed-mode
  * fault-injection tests (`distributed_test.go:39-73`).
  */
class ClusterSpec extends AnyFunSuite {

  test("executor kill + AQE skew under local-cluster: recover and match") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val out = Files.createTempFile("cluster_check_", ".json")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx6g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ClusterCheck", "kill,aqe", TestSpark.sfDir, out.toString))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    assert(p.waitFor(10, TimeUnit.MINUTES), "ClusterCheck timed out")
    val json = new String(Files.readAllBytes(out), "UTF-8")
    assert(p.exitValue() == 0, s"ClusterCheck failed: $json")
    assert(json.contains("\"kill\":{\"ok\":true"), s"kill phase not ok: $json")
    assert(json.contains("\"aqe\":{\"ok\":true"), s"aqe phase not ok: $json")
    assert(json.contains("\"hash_match\":true"), json)
    assert(json.contains("\"skew_split_fired\":true"), json)
    Files.deleteIfExists(out)
  }
}
