package graft.model

import java.sql.Date

/** Typed core data model (SURVEY §1.3): one canonical billing shape, two
  * ingest dialects. `Dataset[Billing]` / `Dataset[PricedLine]` when
  * compile-time field checks help; the readers return DataFrames with
  * exactly these schemas (`.as[Billing]` is a no-op cast).
  */
object Schemas {

  /** Dialect A basket: a receipt — date + item set.
    * (The reference has no row id; one is minted at ingest for pair
    * generation — see sources.BillingReader.) */
  final case class Billing(billId: Long, date: Date, items: Seq[String])

  /** Dialect B priced line, pre-exploded to one row per (item, cost). */
  final case class PricedLine(billId: Long, date: Date, item: String, unitCost: Double)
}
