package graft.ops

/** Shared scratch-path scheme for queries that must write somewhere
  * (layout demos, roundtrips, stream staging): FIXED per (tag, source
  * key) so repeated bench/verify invocations overwrite instead of
  * leaking a fresh temp dir per call. */
object Scratch {

  /** 8-hex-digit md5 of `key` — the stable discriminator used in
    * scratch paths and per-source table names. */
  def key8(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** `tmpdir/<tag>_<key8(key)>`. */
  def dir(tag: String, key: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${tag}_${key8(key)}"

  /** Process-unique staging path for an atomic publish into `dest`:
    * write the artifact under the returned path, then [[publish]] it.
    * Closes the cross-process race on shared derived artifacts (two
    * JVMs — e.g. bench and verify — both deriving while a third reads
    * a half-overwritten directory): readers only ever observe either
    * nothing or a COMPLETE directory, because the publish is a single
    * same-filesystem rename. */
  def stageFor(dest: String): String =
    dest + ".stage-" + java.util.UUID.randomUUID().toString.take(8)

  /** Atomically rename `stage` into `dest`. A leftover torn `dest`
    * (crashed writer: directory without its success marker, as judged
    * by the caller having decided to re-derive) is cleared first; if a
    * concurrent process publishes `dest` between our check and move,
    * their complete artifact wins and our stage is discarded. */
  def publish(stage: String, dest: String): Unit = {
    import java.nio.file._
    val d = Paths.get(dest)
    if (Files.exists(d) && !Files.exists(d.resolve("_SUCCESS")))
      deleteRecursively(d)
    try Files.move(Paths.get(stage), d, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: FileAlreadyExistsException | _: DirectoryNotEmptyException =>
        deleteRecursively(Paths.get(stage))
      case _: FileSystemException =>
        deleteRecursively(Paths.get(stage))
    }
  }

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally s.close()
    }
  }
}
