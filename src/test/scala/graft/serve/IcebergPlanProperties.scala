package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import graft.objects.Json
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The inclusive-evaluation SOUNDNESS property: for ANY filter
  * expression and ANY file, if some row in the file matches the filter
  * (SQL three-valued semantics — null comparisons never match), the
  * evaluator must keep the file. Completeness (pruning as much as
  * possible) is best-effort; soundness is correctness — a violation
  * means served plans silently drop rows.
  */
object IcebergPlanProperties extends Properties("IcebergPlan") {

  private val mapper = Json.mapper

  // one Long column "k"; rows are Option[Long] (None = null)
  private val genRow: Gen[Option[Long]] = Gen.frequency(
    4 -> Gen.choose(-50L, 50L).map(Some(_)),
    1 -> Gen.const(None))
  private val genRows: Gen[List[Option[Long]]] =
    Gen.nonEmptyListOf(genRow)

  private val genLit: Gen[Long] = Gen.choose(-55L, 55L)

  private def leaf: Gen[JsonNode] = Gen.oneOf(
    Gen.oneOf("lt", "lt-eq", "gt", "gt-eq", "eq", "not-eq").flatMap(op =>
      genLit.map { v =>
        val n = mapper.createObjectNode()
        n.put("type", op); n.put("term", "k"); n.put("value", v); (n: JsonNode)
      }),
    Gen.oneOf("is-null", "not-null").map { op =>
      val n = mapper.createObjectNode()
      n.put("type", op); n.put("term", "k"); (n: JsonNode)
    },
    Gen.oneOf("in", "not-in").flatMap(op =>
      Gen.listOfN(3, genLit).map { vs =>
        val n = mapper.createObjectNode()
        n.put("type", op); n.put("term", "k")
        val arr = n.putArray("values"); vs.foreach(arr.add)
        (n: JsonNode)
      }))

  private def expr(depth: Int): Gen[JsonNode] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for {
        op <- Gen.oneOf("and", "or")
        l <- expr(depth - 1); r <- expr(depth - 1)
      } yield {
        val n = mapper.createObjectNode()
        n.put("type", op)
        n.set[JsonNode]("left", l); n.set[JsonNode]("right", r)
        (n: JsonNode)
      }),
      1 -> expr(depth - 1).map { c =>
        val n = mapper.createObjectNode()
        n.put("type", "not"); n.set[JsonNode]("child", c)
        (n: JsonNode)
      })

  /** SQL three-valued row truth for the generated grammar. */
  private def rowMatches(e: JsonNode, v: Option[Long]): Boolean =
    e.path("type").asText() match {
      case "and" => rowMatches(e.get("left"), v) && rowMatches(e.get("right"), v)
      case "or" => rowMatches(e.get("left"), v) || rowMatches(e.get("right"), v)
      case "not" =>
        // NOT over three-valued logic: null comparisons stay unmatched
        // either way, so compute on the definite outcome only
        v match {
          case None => e.get("child").path("type").asText() match {
            case "is-null" => false // NOT(is-null) over null row
            case "not-null" => true
            case "and" | "or" | "not" => !rowMatches(e.get("child"), v) &&
              rowDefinite(e.get("child"), v)
            case _ => false // NOT(cmp(null)) is null → not matched
          }
          case Some(_) => !rowMatches(e.get("child"), v)
        }
      case "is-null" => v.isEmpty
      case "not-null" => v.isDefined
      case "in" => v.exists(x =>
        iterVals(e).contains(x))
      case "not-in" => v.exists(x => !iterVals(e).contains(x))
      case op => v.exists { x =>
        val lit = e.get("value").asLong()
        op match {
          case "lt" => x < lit
          case "lt-eq" => x <= lit
          case "gt" => x > lit
          case "gt-eq" => x >= lit
          case "eq" => x == lit
          case "not-eq" => x != lit
        }
      }
    }

  /** True when the row's truth value is definite (not SQL NULL). */
  private def rowDefinite(e: JsonNode, v: Option[Long]): Boolean =
    e.path("type").asText() match {
      case "is-null" | "not-null" => true
      case "and" | "or" => rowDefinite(e.get("left"), v) &&
        rowDefinite(e.get("right"), v)
      case "not" => rowDefinite(e.get("child"), v)
      case _ => v.isDefined
    }

  private def iterVals(e: JsonNode): Set[Long] = {
    val a = e.get("values")
    (0 until a.size()).map(a.get(_).asLong()).toSet
  }

  property("soundness: a file containing a matching row is never pruned") =
    forAll(genRows, expr(3)) { (rows, filter) =>
      val nonNull = rows.flatten
      val facts = IcebergPlan.ColFacts(
        nonNull.minOption, nonNull.maxOption,
        Some(rows.count(_.isEmpty).toLong), rows.size.toLong, LongType)
      val anyRowMatches = rows.exists(rowMatches(filter, _))
      val kept = IcebergPlan.mightMatchJson(filter,
        c => if (c == "k") Some(facts) else None)
      // the ONE-SIDED contract: matching rows imply kept; pruning a
      // non-matching file is allowed but not required
      Prop(!anyRowMatches || kept) :| s"pruned a matching file: filter=$filter rows=$rows"
    }

  property("exactness: single-value files prune provably-empty comparisons") =
    forAll(Gen.choose(-50L, 50L)) { v =>
      val facts = IcebergPlan.ColFacts(Some(v), Some(v), Some(0L), 5L, LongType)
      val n = mapper.createObjectNode()
      n.put("type", "gt"); n.put("term", "k"); n.put("value", v)
      val n2 = mapper.createObjectNode()
      n2.put("type", "not-eq"); n2.put("term", "k"); n2.put("value", v)
      !IcebergPlan.mightMatchJson(n, _ => Some(facts)) &&
        !IcebergPlan.mightMatchJson(n2, _ => Some(facts))
    }
}
