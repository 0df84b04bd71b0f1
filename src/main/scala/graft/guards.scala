package graft

/** Thrown by the deliberate scale guards ([[graft.ops.SimOps]]'s all-pairs
  * vector gate, [[graft.ops.DedupOps]]'s exact n-gram candidate gate): the
  * refused computation is an exact O(n²) verification twin that must not
  * launch on a production-sized corpus. Subclasses IllegalStateException so
  * existing intercepts and messages hold; [[graft.ops.PropertyChecks]]
  * catches THIS type to degrade the affected checks to their precision-only
  * form (every REPORTED pair recomputed exactly — linear in the result)
  * instead of reporting a crashed check, while the recall side stays
  * verified at the scales the guard admits plus the planted-fixture tests.
  */
class ScaleGuardRefusal(msg: String) extends IllegalStateException(msg)
