package graft.queries

/** Collision-free scratch-directory keys shared by every query that
  * materializes per-data-dir state under `java.io.tmpdir` — two data dirs
  * must never share (and thus silently cross-read) a scratch dir, so the
  * key is an injective encoding of the full path (hex of the path bytes),
  * degrading to md5 only when the hex would be unwieldy.
  */
private[queries] object ScratchKeys {
  def forPath(path: String): String = {
    val hex = path.getBytes("UTF-8").map(b => f"$b%02x").mkString
    if (hex.length <= 128) hex
    else java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }
}
