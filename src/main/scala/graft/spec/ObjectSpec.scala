package graft.spec

/** The query language of the engine: a config-driven specification of one
  * object's extract + aggregate pipeline.
  *
  * Mirrors the reference's frozen dataclass
  * (`configs/salesforce_objects.py:5-12`): `fields` is the SELECT list
  * pushed into the source, `requiredCols` the minimal schema contract
  * enforced by the QA gate, `groupBy` the grouping keys, `metrics` maps a
  * numeric column to its aggregation ops (`sum|mean|min|max|count`), and
  * `where` an optional predicate pushed into the source.
  *
  * The pseudo-metric column [[ObjectSpec.DurationHours]] requests
  * aggregation over the derived `duration_hours` column (see
  * `graft.ops.Normalize.deriveDurationHours`, ≙ `tasks/process.py:89-97`).
  */
final case class ObjectSpec(
    apiName: String,
    fields: Seq[String],
    requiredCols: Seq[String],
    groupBy: Seq[String],
    metrics: Map[String, Seq[String]],
    where: String = ""
)

object ObjectSpec {
  /** Pseudo-column dispatching to the derived duration metric
    * (`configs/salesforce_objects.py:71`, `tasks/process.py:30-41`). */
  val DurationHours = "__DURATION_HOURS__"
}

/** The 23-entry spec registry, a faithful re-declaration of the
  * reference's `OBJECT_SPECS` (`configs/salesforce_objects.py:15-195`).
  * Insertion order is preserved (ListMap) so compiled aggregate column
  * order is deterministic.
  */
object SpecRegistry {
  import scala.collection.immutable.ListMap

  private def spec(
      api: String,
      fields: Seq[String],
      required: Seq[String],
      groupBy: Seq[String],
      metrics: Seq[(String, Seq[String])],
      where: String = ""
  ): (String, ObjectSpec) =
    api -> ObjectSpec(api, fields, required, groupBy, ListMap(metrics: _*), where)

  val specs: ListMap[String, ObjectSpec] = ListMap(
    // ---- Core CRM (configs/salesforce_objects.py:16-86) ----
    spec("Account",
      Seq("Id", "Name", "Phone", "Website", "BillingCity", "BillingState", "Industry", "AnnualRevenue"),
      Seq("Id", "Name"), Seq("BillingState"),
      Seq("AnnualRevenue" -> Seq("sum", "mean", "count"))),
    spec("Contact",
      Seq("Id", "FirstName", "LastName", "Email", "Phone", "MailingCity", "MailingState", "AccountId"),
      Seq("Id", "LastName"), Seq("MailingState"),
      Seq("Id" -> Seq("count"))),
    spec("Lead",
      Seq("Id", "FirstName", "LastName", "Company", "Status", "LeadSource", "Email", "Phone", "City", "State"),
      Seq("Id", "Status"), Seq("Status", "LeadSource"),
      Seq("Id" -> Seq("count"))),
    spec("Opportunity",
      Seq("Id", "Name", "StageName", "Amount", "CloseDate", "OwnerId", "AccountId", "Type"),
      Seq("Id", "StageName"), Seq("StageName"),
      Seq("Amount" -> Seq("sum", "mean", "count"))),
    spec("OpportunityLineItem",
      Seq("Id", "OpportunityId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"),
      Seq("Id", "OpportunityId"), Seq("Product2Id"),
      Seq("Quantity" -> Seq("sum"), "UnitPrice" -> Seq("mean"), "TotalPrice" -> Seq("sum", "count"))),
    spec("Case",
      Seq("Id", "CaseNumber", "Status", "Priority", "Origin", "AccountId", "ContactId", "OwnerId"),
      Seq("Id", "Status"), Seq("Status", "Priority"),
      Seq("Id" -> Seq("count"))),
    spec("Task",
      Seq("Id", "Subject", "Status", "Priority", "OwnerId", "WhatId", "WhoId", "ActivityDate"),
      Seq("Id"), Seq("Status", "Priority"),
      Seq("Id" -> Seq("count"))),
    spec("Event",
      Seq("Id", "Subject", "StartDateTime", "EndDateTime", "OwnerId", "WhatId", "Location"),
      Seq("Id"), Seq("OwnerId"),
      Seq(ObjectSpec.DurationHours -> Seq("sum", "mean", "count"))),
    spec("Campaign",
      Seq("Id", "Name", "Status", "Type", "StartDate", "EndDate", "BudgetedCost", "ActualCost"),
      Seq("Id", "Name"), Seq("Status", "Type"),
      Seq("BudgetedCost" -> Seq("sum"), "ActualCost" -> Seq("sum", "count"))),
    spec("CampaignMember",
      Seq("Id", "CampaignId", "ContactId", "LeadId", "Status"),
      Seq("Id", "CampaignId"), Seq("Status"),
      Seq("Id" -> Seq("count"))),
    // ---- Catalog / Pricing (configs/salesforce_objects.py:88-112) ----
    spec("Product2",
      Seq("Id", "Name", "ProductCode", "Family", "IsActive"),
      Seq("Id", "Name"), Seq("Family", "IsActive"),
      Seq("Id" -> Seq("count"))),
    spec("Pricebook2",
      Seq("Id", "Name", "IsActive"),
      Seq("Id", "Name"), Seq("IsActive"),
      Seq("Id" -> Seq("count"))),
    spec("PricebookEntry",
      Seq("Id", "Pricebook2Id", "Product2Id", "UnitPrice", "IsActive", "UseStandardPrice"),
      Seq("Id", "Product2Id"), Seq("Pricebook2Id", "IsActive"),
      Seq("UnitPrice" -> Seq("mean", "count"))),
    // ---- Orders / Quotes / Contracts / Assets (configs/salesforce_objects.py:114-160) ----
    spec("Order",
      Seq("Id", "AccountId", "Status", "TotalAmount", "EffectiveDate", "OwnerId"),
      Seq("Id", "Status"), Seq("Status"),
      Seq("TotalAmount" -> Seq("sum", "mean", "count"))),
    spec("OrderItem",
      Seq("Id", "OrderId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"),
      Seq("Id", "OrderId"), Seq("Product2Id"),
      Seq("Quantity" -> Seq("sum"), "UnitPrice" -> Seq("mean"), "TotalPrice" -> Seq("sum", "count"))),
    spec("Quote",
      Seq("Id", "Name", "OpportunityId", "Status", "GrandTotal", "ExpirationDate"),
      Seq("Id", "Status"), Seq("Status"),
      Seq("GrandTotal" -> Seq("sum", "mean", "count"))),
    spec("QuoteLineItem",
      Seq("Id", "QuoteId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"),
      Seq("Id", "QuoteId"), Seq("Product2Id"),
      Seq("Quantity" -> Seq("sum"), "UnitPrice" -> Seq("mean"), "TotalPrice" -> Seq("sum", "count"))),
    spec("Contract",
      Seq("Id", "AccountId", "Status", "StartDate", "EndDate", "OwnerId"),
      Seq("Id", "Status"), Seq("Status"),
      Seq("Id" -> Seq("count"))),
    spec("Asset",
      Seq("Id", "AccountId", "ContactId", "Product2Id", "Status", "InstallDate"),
      Seq("Id", "Status"), Seq("Status"),
      Seq("Id" -> Seq("count"))),
    // ---- Files / Notes (configs/salesforce_objects.py:162-185) ----
    spec("Note",
      Seq("Id", "Title", "IsPrivate", "OwnerId", "ParentId"),
      Seq("Id", "Title"), Seq("IsPrivate"),
      Seq("Id" -> Seq("count"))),
    spec("ContentDocument",
      Seq("Id", "Title", "FileType", "LatestPublishedVersionId", "OwnerId"),
      Seq("Id", "Title"), Seq("FileType"),
      Seq("Id" -> Seq("count"))),
    spec("ContentVersion",
      Seq("Id", "Title", "FileExtension", "VersionDataSize", "ContentDocumentId"),
      Seq("Id", "Title"), Seq("FileExtension"),
      Seq("VersionDataSize" -> Seq("sum", "mean", "count"))),
    // ---- Admin (configs/salesforce_objects.py:187-194) ----
    spec("User",
      Seq("Id", "Name", "Username", "Email", "IsActive", "Alias", "TimeZoneSidKey"),
      Seq("Id", "Name"), Seq("IsActive", "TimeZoneSidKey"),
      Seq("Id" -> Seq("count")))
  )

  def apply(name: String): ObjectSpec =
    specs.getOrElse(name, throw new IllegalArgumentException(s"Unsupported object: $name"))
}
