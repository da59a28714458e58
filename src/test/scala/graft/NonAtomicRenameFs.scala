package graft

import java.net.URI
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test-only filesystem emulating the OBJECT-STORE rename semantics the
  * `atomicSwap` contract guard exists for (scheme `nar` — listed in
  * `DedupIndex.NonAtomicRenameSchemes` as this harness's scheme): a
  * directory "rename" is a client-side file-by-file copy followed by a
  * source delete, exactly S3A's emulation — an O(data) window during
  * which BOTH roots are partial, where a crash strands a half-moved
  * tree that matches none of the swap's crash-recovery shapes.
  *
  * The crash seam: arm [[NonAtomicRenameFs.crashWhenDstContains]] with
  * a destination-path substring (e.g. `._compact_old` — only the swap's
  * own live→old rename, never the parquet committer's task renames) and
  * the copy throws after moving HALF the data files (sidecars spared —
  * one of the non-deterministic real-store interleavings, chosen to
  * land in the silent branch): both roots now hold a partial data set.
  * DedupIndexSpec drives a compaction through it under the documented
  * `allowNonAtomicRename=true` opt-out and demonstrates the resulting
  * SILENT permanent loss; the default-on guard
  * (`requireAtomicRenameFs`) rejects this scheme before any rename. */
class NonAtomicRenameFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("nar:///")
  override def getScheme: String = "nar"

  override def rename(src: Path, dst: Path): Boolean = {
    if (!getFileStatus(src).isDirectory) return super.rename(src, dst)
    if (exists(dst)) return false // object stores have no dir-merge rename
    // enumerate every file under src (sorted walk, deterministic)
    def walk(p: Path): Seq[Path] =
      listStatus(p).sortBy(_.getPath.getName).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st.getPath)
      }
    // a real object-store rename copies objects in parallel — the
    // interleaving at a crash is non-deterministic. This harness picks
    // ONE deterministic interleaving (data objects first, sidecars
    // last) and crashes halfway through the data: the shape that the
    // swap's recovery then finishes off SILENTLY (sidecar-first
    // interleavings die loudly on the missing meta instead — a crash
    // lottery between loud failure and silent loss is the point)
    def isSidecar(p: Path): Boolean =
      p.toUri.getPath.stripPrefix(src.toUri.getPath).split('/').exists(
        seg => seg.startsWith("_") || seg.startsWith("."))
    val (side, data) = walk(src).partition(isSidecar)
    val files = data ++ side
    val armed = Option(NonAtomicRenameFs.crashWhenDstContains)
      .exists(m => dst.toString.contains(m))
    val stopAt =
      if (armed) math.max(1, data.length / 2) else files.length
    mkdirs(dst)
    files.zipWithIndex.foreach { case (f, i) =>
      if (i >= stopAt)
        throw new java.io.IOException(
          s"NonAtomicRenameFs: simulated crash mid-copy ($i of " +
            s"${files.length} files moved) during rename($src, $dst)")
      val rel = f.toUri.getPath.stripPrefix(src.toUri.getPath)
        .stripPrefix("/")
      val to = new Path(dst, rel)
      mkdirs(to.getParent)
      FileUtil.copy(this, f, this, to, true /* deleteSource */, getConf)
    }
    delete(src, true)
    true
  }
}

object NonAtomicRenameFs {
  /** Substring of the rename DESTINATION that arms the mid-copy crash;
    * null = behave as a plain (but still non-atomic) copy+delete. */
  @volatile var crashWhenDstContains: String = null
}
