package graft.operators

/** Build-once persisted-state guard — ONE definition of the LabelBase
  * discipline its seven users (text/embedding cluster state, ER
  * link/label state, BM25 postings state) each hand-rolled before r13:
  * a per-`sfDir` root under java.io.tmpdir, `_SUCCESS`-guarded subdirs,
  * and a `synchronized` single-builder gate (the harness runs one JVM
  * at a time per sf dir; the lock only serializes in-JVM callers).
  *
  * `version` participates in the root path: changing a fixture's
  * DEFINITION (split predicate, layout, arithmetic) must bump it, so a
  * stale /tmp root from an earlier build can never pass the `_SUCCESS`
  * check and silently serve state inconsistent with the new query — the
  * lesson ScaleCurve's `graft_scale_v2` root already encodes. */
private[graft] object FixtureBase {

  /** Ensure every `subdirs` entry under the family root carries a
    * parquet `_SUCCESS` marker, running `build(root)` once otherwise;
    * returns the root. */
  def ensure(family: String, version: Int, sfDir: String,
      subdirs: Seq[String])(build: String => Unit): String = synchronized {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val root =
      s"${sys.props("java.io.tmpdir")}/${family}_v$version/$tag"
    if (!subdirs.forall(sd =>
        new java.io.File(s"$root/$sd/_SUCCESS").exists()))
      build(root)
    root
  }
}
