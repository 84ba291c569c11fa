package graft.util

/** Stable short tag for a fixture/scratch path, used in memoized table
  * names and per-run scratch dirs. A HASH of the FULL path, not a
  * suffix: suffix tags mapped two dirs differing only in earlier
  * segments or punctuation to the same name, silently repointing one
  * fixture's memo at another's data (ADVICE r12). One definition so the
  * scheme can never diverge between call sites. */
object PathTag {
  def tag(path: String): String =
    java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(path.getBytes("UTF-8"))
        .getMostSignificantBits)
}
