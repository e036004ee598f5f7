package graft

/** Shared temp-tree cleanup for the specs (one definition instead of the
  * walk-reverse-delete idiom copy-pasted per suite).
  */
object TestDirs {

  /** Recursively delete `root`. With `retries` > 1, a failed pass (a
    * background writer — e.g. the state-store maintenance thread — mutating
    * the tree mid-walk throws `UncheckedIOException` out of `Files.walk`'s
    * lazy iteration) sleeps briefly and re-walks. The FINAL attempt swallows
    * instead of throwing: cleanup runs from `finally` blocks, and a cleanup
    * exception there would REPLACE the test's real assertion failure — a
    * leftover /tmp tree is the lesser harm.
    */
  def deleteRecursively(root: java.nio.file.Path, retries: Int = 1): Unit = {
    import scala.jdk.CollectionConverters._
    var attempts = math.max(1, retries)
    while (attempts > 0 && java.nio.file.Files.exists(root)) {
      attempts -= 1
      // close the walk stream even on the mid-walk throw (Files.walk holds
      // open DirectoryStream descriptors; the javadoc requires closing)
      try {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
      catch {
        case scala.util.control.NonFatal(_) if attempts > 0 => Thread.sleep(300)
        case scala.util.control.NonFatal(_) => // final attempt: never mask the test result
      }
    }
  }
}
