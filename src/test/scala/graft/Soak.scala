package graft

/** Suite depth switch (r17 verdict #6): the tagged expensive property
  * locks run a reduced generator count / fixture slice by default and
  * their full depth under `-Dgraft.soak=full` (build.sbt forwards the
  * property into the forked test JVM). The round's GATE run keeps deep
  * mode — every property still checks at its full count there; the
  * edit-compile-test loop gets a bounded default without losing any
  * TEST (every test still runs in both modes; only iteration counts
  * and fixture slices shrink).
  */
object Soak {
  val full: Boolean = sys.props.get("graft.soak").contains("full")

  /** Generator count / slice size: `deep` under -Dgraft.soak=full,
    * else `fast`. */
  def n(fast: Int, deep: Int): Int = if (full) deep else fast
}
