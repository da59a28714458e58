package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The index roots of ONE ingest pipeline — the relations a takedown
  * must hit together. A production pipeline maintains several coupled
  * index/store relations over the same document ids (the admission
  * trilogy's exact + minhash + doc store, the ExactSubstr anchor set,
  * the decontamination masks with their reference store, the ANN index
  * with its vector store); deleting a document from ONE of them leaves
  * the others serving its content. Every field is optional — list what
  * the pipeline actually runs. */
final case class PipelineRoots(
    exactIndex: Option[String] = None,
    minhashIndex: Option[String] = None,
    docStore: Option[String] = None,
    anchorIndex: Option[String] = None,
    bloomIndex: Option[String] = None,
    refStore: Option[String] = None,
    annIndex: Option[String] = None,
    vecStore: Option[String] = None)

/** ONE-CALL multi-index takedown (round 17). A real takedown/GDPR
  * request used to be a runbook: five-plus separate
  * [[DedupIndex.deleteDocs]]/[[AnnIndex.deleteVectors]] calls, two of
  * which (anchor, bloom) fail loudly and demand a manually-fed rebuild.
  * This operator is the runbook as one operation, following the
  * reference's own pattern of regenerating derived planning state from
  * the store when the store changes (make-metadata.py:8-22):
  *
  *  - **phase 1 — tombstone everything.** Every listed root gets the id
  *    set appended to its `_tombstones`. Row-wise kinds (exact, minhash,
  *    doc/vector stores, ANN codes) are immediately correct — every
  *    query anti-joins the pending set; aggregate-valued kinds (anchor
  *    grams, bloom masks) immediately FAIL LOUDLY on any probe — deleted
  *    content is never served, even if phase 2 crashes.
  *  - **phase 2 — rebuild the aggregate kinds from their stores.**
  *    [[DedupIndex.rebuildAnchorIndexFromStore]] /
  *    [[DedupIndex.rebuildBloomIndexFromRef]] re-derive anchor/bloom
  *    from the maintained doc/reference store with BOTH tombstone sets
  *    applied, atomically (the ANN pattern of
  *    [[AnnIndex.rebuildIvfPqIndexFromStore]]). Without the matching
  *    store (or with `rebuildAggregates = false`) the root stays
  *    tombstoned — a loud queue: probes keep failing with the rebuild
  *    instruction until an operator runs one.
  *
  * Cost ∝ deletions for phase 1 (tombstones append, nothing rewrites);
  * phase 2 is store-proportional — the anchor rebuild re-winnows the
  * surviving corpus, the bloom rebuild re-masks the (small by nature)
  * reference set. Physical removal from the row-wise kinds stays the
  * compaction's job ([[DedupIndex.compactIndex]] /
  * [[DedupIndex.compactDocStore]] / [[AnnIndex.compactIvfPqCodes]]) —
  * run them on the maintenance schedule; correctness never waits for
  * them. Returns a report relation (root, kind, action, detail) with
  * action ∈ tombstoned | rebuilt | rebuild_required | rebuild_failed.
  *
  * Partial failure (round 18): a phase-2 rebuild that THROWS (a broken
  * store path, a transient executor loss) no longer aborts the report —
  * phase 1 already made every surface safe (anti-joined or fail-loud),
  * so the correct posture is to finish the remaining rebuilds and tell
  * the operator exactly which roots are still loudly queued. Such a
  * root reports `rebuild_failed` with the exception in `detail`; its
  * probes keep failing with the rebuild instruction until an operator
  * re-runs one (the same loud queue as `rebuild_required`). */
object Takedown {

  def apply(ids: DataFrame, roots: PipelineRoots,
      rebuildAggregates: Boolean = true,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    // pin the id set ONCE (round-17 self-review): deleteDocs re-evaluates
    // its input per root, so a non-deterministic ids relation (a sampled
    // batch, a now()-filtered query) would tombstone DIFFERENT sets on
    // different roots — the one inconsistency a takedown must never have.
    // localCheckpoint materializes the evaluated rows; takedown-sized.
    val idsPinned = ids.select(col(ids.columns.head).cast("long").as("id"))
      .distinct().localCheckpoint()
    val report =
      scala.collection.mutable.ArrayBuffer[(String, String, String, String)]()
    def ts(rootOpt: Option[String], kind: String): Unit =
      rootOpt.foreach { p =>
        DedupIndex.deleteDocs(idsPinned, p) // fail-loud on a missing root
        report += ((p, kind, "tombstoned", null))
      }
    // phase 1: tombstone every root FIRST, aggregate kinds included —
    // each surface is safe (anti-joined or fail-loud) from this point
    // on, whatever happens to the rebuilds below
    ts(roots.exactIndex, "exact")
    ts(roots.minhashIndex, "minhash")
    ts(roots.docStore, "docstore")
    ts(roots.annIndex, "ivfpq")
    ts(roots.vecStore, "vecstore")
    ts(roots.refStore, "refstore")
    ts(roots.anchorIndex, "anchor")
    ts(roots.bloomIndex, "bloom")
    // phase 2: store-fed rebuilds clear the aggregate kinds' tombstones
    // by applying them physically. Each rebuild is caught per root
    // (round 18): phase 1 already made this root fail-loud, so a throw
    // here must not hide the OTHER roots' outcomes from the operator —
    // it becomes a rebuild_failed report row instead.
    def rebuild(p: String, kind: String, store: Option[String])(
        run: String => Unit): Unit =
      if (rebuildAggregates && store.isDefined)
        try { run(store.get); report += ((p, kind, "rebuilt", null)) }
        catch { case scala.util.control.NonFatal(e) =>
          report += ((p, kind, "rebuild_failed",
            s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      else report += ((p, kind, "rebuild_required", null))
    roots.anchorIndex.foreach { p =>
      rebuild(p, "anchor", roots.docStore)(st =>
        DedupIndex.rebuildAnchorIndexFromStore(spark, st, p, textCol, idCol))
    }
    roots.bloomIndex.foreach { p =>
      rebuild(p, "bloom", roots.refStore)(st =>
        DedupIndex.rebuildBloomIndexFromRef(spark, st, p, textCol, idCol))
    }
    import spark.implicits._
    report.toSeq.toDF("root", "kind", "action", "detail")
  }
}
