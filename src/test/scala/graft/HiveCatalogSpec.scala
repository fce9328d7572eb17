package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Forks [[HiveCatalogDemo]] twice (fresh JVM each phase — Derby's embedded
  * lock releases at process exit) to prove the catalog registration made by
  * one process is served to another purely via the Hive metastore. */
class HiveCatalogSpec extends AnyFunSuite {

  private def forkDemo(phase: String, base: String): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.HiveCatalogDemo", phase, base)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    (code, out)
  }

  test("table registered by one process is served to a fresh process via the metastore") {
    val base = Files.createTempDirectory("graft_hive").toString
    val (c1, o1) = forkDemo("phase1", base)
    assert(c1 == 0 && o1.contains("HIVE_PHASE1_OK"), s"phase1 failed:\n$o1")
    val (c2, o2) = forkDemo("phase2", base)
    assert(c2 == 0 && o2.contains("HIVE_PHASE2_OK"), s"phase2 failed:\n$o2")
  }
}
