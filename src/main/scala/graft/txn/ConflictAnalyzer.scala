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
      if (isolation != IsolationLevel.Serializable) return NoConflict
      // a METADATA read (describe/exists/show) observes schema and
      // properties, which a data-plane write doesn't touch — only the
      // data read (TABLE_SELECT) is constrained by inserts/updates
      val dataWrites = Set(TableInsert, TableUpdate, TableDelete)
      if (p != TableSelect && dataWrites(c)) return NoConflict
      // predicate-level refinement: a committed APPEND whose file
      // stats are provably outside the read's predicate intervals
      // never changed a row the reader observed — no conflict. Only
      // sound for pure appends: an overwrite/delete also REMOVES rows
      // the stats of the new files say nothing about.
      if (c == TableInsert && provablyDisjoint(pending.payload, committed.payload))
        return NoConflict
      return Unresolvable(
        s"serializable read-write conflict on ${pending.objectKey}: $p vs $c")
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

  /** True when SOME column's read interval ("ivl.<col>" → "lo|hi" in
    * the read action's args) provably misses the writer's value range
    * ("rng.<col>" from the committed files' stats). One disjoint
    * column proves the appended rows all fall outside the read
    * predicate. Bounds are closed on both sides — equality counts as
    * overlap, unparseable entries prove nothing.
    */
  private[txn] def provablyDisjoint(readArgs: Map[String, String],
      writeArgs: Map[String, String]): Boolean = {
    def parse(s: String): Option[(Double, Double)] = s.split('|') match {
      case Array(lo, hi) =>
        try Some((lo.toDouble, hi.toDouble))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
    readArgs.exists { case (k, v) =>
      k.startsWith("ivl.") && {
        val col = k.stripPrefix("ivl.")
        (parse(v), writeArgs.get(s"rng.$col").flatMap(parse)) match {
          case (Some((rLo, rHi)), Some((wLo, wHi))) => rHi < wLo || rLo > wHi
          case _ => false
        }
      }
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
