package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared filesystem guards for the store layer. */
private[graft] object StoreIO {

  /** Hadoop `FileSystem.rename` reports most failures by RETURNING FALSE,
    * not throwing. Every swap/publish rename in the store layer goes
    * through this guard: on false the operation aborts BEFORE any
    * destructive step, leaving whatever state exists recoverable —
    * unchecked, a false could nest the new tree inside a still-present
    * destination, delete the only surviving copy, or report a manifest
    * commit that never became visible. */
  def renameOrAbort(fs: FileSystem, from: Path, to: Path, what: String): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(
        s"$what rename $from -> $to failed (returned false); aborting with data intact")
}
