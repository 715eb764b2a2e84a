package graft.ext

/** One resolution of the artifact root every persisted index shares
  * (previously four private copies of the same env lookup + md5 hash).
  * Precedence: the `graft.index.root` system property (the ops/test
  * override — a spec relocates a whole artifact tree by flipping it),
  * then the SPARK_GRAFT_INDEX_ROOT environment variable (the deployment
  * config), then the JVM tmpdir (the only writable location the harness
  * guarantees).
  */
object ArtifactRoots {

  def root: String =
    sys.props.get("graft.index.root")
      .orElse(sys.env.get("SPARK_GRAFT_INDEX_ROOT"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_ann_index")

  /** The per-corpus artifact dir for one artifact kind: md5(corpusDir)
    * under the shared root, prefixed by kind (empty prefix = the ANN
    * index's historical unprefixed layout).
    */
  def dirFor(prefix: String, corpusDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/$prefix$h"
  }
}
