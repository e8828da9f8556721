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
}
