package graft.txn

import graft.objects.Json
import com.fasterxml.jackson.databind.JsonNode

/** Audit-log entry for conflict detection (reference proto/actions.proto:26-59,
  * core/.../action/Action.java): the touched object key, the action
  * type, and an optional payload (pruned columns + pushed filters for
  * SELECT, data files for INSERT/UPDATE — actions.proto:77-97).
  */
final case class Action(
    actionType: String,
    objectKey: String,
    payload: Map[String, String] = Map.empty)

object ActionType {
  // writes
  val CreateNamespace = "CREATE_NAMESPACE"
  val AlterNamespace = "ALTER_NAMESPACE"
  val AlterNamespaceSetProps = "ALTER_NAMESPACE_SET_PROPERTIES"
  val AlterNamespaceUnsetProps = "ALTER_NAMESPACE_UNSET_PROPERTIES"
  val DropNamespace = "DROP_NAMESPACE"
  val CreateTable = "CREATE_TABLE"
  val AlterTable = "ALTER_TABLE"
  val AlterTableAddColumns = "ALTER_TABLE_ADD_COLUMNS"
  val AlterTableRemoveColumns = "ALTER_TABLE_REMOVE_COLUMNS"
  val DropTable = "DROP_TABLE"
  val CreateView = "CREATE_VIEW"
  val ReplaceView = "REPLACE_VIEW"
  val DropView = "DROP_VIEW"
  // data plane (recorded by the DSv2 scan/write paths)
  val TableSelect = "TABLE_SELECT"
  val TableInsert = "TABLE_INSERT"
  val TableUpdate = "TABLE_UPDATE"
  val TableDelete = "TABLE_DELETE"
  // reads
  val NamespaceExists = "NAMESPACE_EXISTS"
  val DescribeNamespace = "DESCRIBE_NAMESPACE"
  val ShowNamespaces = "SHOW_NAMESPACES"
  val TableExists = "TABLE_EXISTS"
  val DescribeTable = "DESCRIBE_TABLE"
  val ShowTables = "SHOW_TABLES"
  val ViewExists = "VIEW_EXISTS"
  val DescribeView = "DESCRIBE_VIEW"
  val ShowViews = "SHOW_VIEWS"

  val readOnly: Set[String] = Set(
    TableSelect, NamespaceExists, DescribeNamespace, ShowNamespaces,
    TableExists, DescribeTable, ShowTables, ViewExists, DescribeView, ShowViews)

  /** create-new-object actions */
  val creates: Set[String] = Set(CreateNamespace, CreateTable, CreateView)

  /** in-place mutations of an existing object */
  val updates: Set[String] = Set(
    AlterNamespace, AlterNamespaceSetProps, AlterNamespaceUnsetProps,
    AlterTable, AlterTableAddColumns, AlterTableRemoveColumns,
    ReplaceView, TableUpdate, TableDelete)

  val drops: Set[String] = Set(DropNamespace, DropTable, DropView)

  def isWrite(t: String): Boolean = !readOnly(t)
}

object Actions {
  def toJson(actions: Seq[Action]): String = Json.writeString(actions)

  def fromJson(json: String): Seq[Action] = {
    val node: JsonNode = Json.mapper.readTree(json)
    (0 until node.size()).map { i =>
      val a = node.get(i)
      val payload = Option(a.get("payload")).map { p =>
        val it = p.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      }.getOrElse(Map.empty[String, String])
      Action(a.get("actionType").asText(), a.get("objectKey").asText(), payload)
    }
  }
}
