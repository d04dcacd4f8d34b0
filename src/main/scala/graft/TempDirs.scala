package graft

/** Temp directories that clean themselves up at JVM exit — for the
  * fixture-scale index/codes copies the registry queries materialize
  * (`q_sim_ivf_pq_stored`, Bench's `pq_split` prep). Verify/Bench/gate
  * JVMs are per-run, so exit-time deletion bounds /tmp growth across
  * repeated iterations that previously leaked one encoded-corpus copy
  * per call.
  */
object TempDirs {

  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}
