package graft.txn

import graft.objects.IsolationLevel

/** Pairwise pending-vs-committed conflict analysis (reference
  * AnalyzeActionConflicts.java:22-352). Verdict per pair:
  *
  *  - NoConflict   — different keys, or read-only vs read-only
  *  - Resolvable   — both effects can coexist after a rebase
  *                   (append-vs-append / append-vs-update: re-apply the
  *                   pending append on the winner's table state)
  *  - Unresolvable — abort (update/update, create/create, drop vs any
  *                   write, replace-view vs drop-view)
  *
  * The reference accepts an isolationLevel parameter but never uses it
  * (SURVEY §4.3.2) — SERIALIZABLE degenerates to SNAPSHOT. graft
  * implements the read-write check: under SERIALIZABLE a pending READ
  * of a key that a committed txn WROTE is unresolvable.
  */
object ConflictAnalyzer {

  sealed trait Verdict
  case object NoConflict extends Verdict
  case object Resolvable extends Verdict
  final case class Unresolvable(reason: String) extends Verdict

  def analyzePair(pending: Action, committed: Action, isolation: String): Verdict = {
    import ActionType._
    if (pending.objectKey != committed.objectKey) return NoConflict

    val p = pending.actionType
    val c = committed.actionType

    if (readOnly(p) && readOnly(c)) return NoConflict
    if (readOnly(c)) return NoConflict // committed read constrains nothing
    if (readOnly(p)) {
      // pending read vs committed write: visible only under SERIALIZABLE
      return if (isolation == IsolationLevel.Serializable)
        Unresolvable(s"serializable read-write conflict on ${pending.objectKey}: $p vs $c")
      else NoConflict
    }

    // both writes on the same key (AnalyzeActionConflicts.java:82-249)
    (p, c) match {
      case (TableInsert, TableInsert) => Resolvable // append ∥ append
      case (TableInsert, t) if updates(t) || creates(t) => Resolvable
      case (t, TableInsert) if updates(t) =>
        Unresolvable(s"$t over committed append on ${pending.objectKey}")
      case (a, b) if creates(a) && creates(b) =>
        Unresolvable(s"both transactions created ${pending.objectKey}")
      case (a, b) if updates(a) && updates(b) =>
        Unresolvable(s"concurrent updates of ${pending.objectKey}")
      case (a, _) if drops(a) =>
        Unresolvable(s"drop of concurrently written ${pending.objectKey}")
      case (_, b) if drops(b) =>
        Unresolvable(s"write to concurrently dropped ${pending.objectKey}")
      case _ =>
        Unresolvable(s"$p vs $c on ${pending.objectKey}")
    }
  }

  /** Analyze the full pending set against the committed set; returns
    * the first unresolvable reason, or whether any pair needs a
    * semantic rebase.
    */
  def analyze(pending: Seq[Action], committed: Seq[Action], isolation: String)
      : Either[String, Boolean] = {
    var needsRebase = false
    for (p <- pending; c <- committed) {
      analyzePair(p, c, isolation) match {
        case Unresolvable(reason) => return Left(reason)
        case Resolvable => needsRebase = true
        case NoConflict => ()
      }
    }
    Right(needsRebase)
  }
}
