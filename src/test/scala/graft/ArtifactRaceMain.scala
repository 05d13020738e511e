package graft

/** Second-JVM worker for the cross-JVM artifact-store race test
  * ([[ArtifactRaceSpec]]): loops resolve-then-read against a shared
  * scratch store while the spec JVM (and a sibling worker) concurrently
  * prune and retrain the same entries.
  *
  * Exit codes: 0 = every read returned complete, correct content
  * (loud pruner races are counted and reported on stdout — those are
  * the DOCUMENTED failure mode, not a defect); 2 = a TORN artifact was
  * observed (partial or wrong content after a successful resolve),
  * which the atomic-rename publish contract promises can never happen.
  */
object ArtifactRaceMain {

  private def payload(slot: Int): Array[Byte] =
    Array.tabulate[Byte](4096)(j => ((j * 31 + slot * 7) % 127).toByte)

  def main(args: Array[String]): Unit = {
    val root = new java.io.File(args(0))
    val iters = args(1).toInt
    val seed = args(2).toInt
    var loud = 0
    var i = 0
    while (i < iters) {
      val slot = (i + seed) % 4
      // store-pattern name (kind-md5hex) so pruneStore treats it as its own
      val path = new java.io.File(root, f"race-$slot%032x").getPath
      try {
        graft.northstar.Artifacts.ensureTrained(path) { tmp =>
          val d = new java.io.File(tmp)
          if (!d.mkdirs()) throw new java.io.IOException(s"mkdirs $tmp")
          java.nio.file.Files.write(
            new java.io.File(d, "data").toPath, payload(slot))
          java.nio.file.Files.write(
            new java.io.File(d, "_SUCCESS").toPath, Array.empty[Byte])
        }
        // the reader contract: resolve, then read. A pruner may win the
        // race between the two — that must surface as a LOUD missing
        // file, never as partial content.
        val data = java.nio.file.Files.readAllBytes(
          new java.io.File(path, "data").toPath)
        if (!java.util.Arrays.equals(data, payload(slot))) {
          System.err.println(s"TORN artifact at $path: wrong content")
          sys.exit(2)
        }
      } catch {
        case _: java.nio.file.NoSuchFileException => loud += 1
        case _: java.io.FileNotFoundException => loud += 1
        case _: IllegalArgumentException => loud += 1 // publish-race require
      }
      i += 1
    }
    println(s"loud=$loud")
  }
}
