package graft

/** Shared scratch-directory helper for the session artifact fills
  * (review r18: the createTempDirectory + shutdown-hook rm block was
  * copy-pasted once per store). Each fill gets its own directory,
  * removed at JVM exit — the scratch-volume lifecycle a serving tier's
  * local cache has; durable artifacts use caller-chosen paths.
  */
object Artifacts {

  def tempArtifactDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(dir.toFile)
    }
    dir.toString
  }
}
