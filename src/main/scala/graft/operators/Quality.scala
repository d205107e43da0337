package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based data-quality layer generalizing the reference's two inline
  * checks (SURVEY.md §2.9, procurement_dag.py:153-194) into a declarative
  * rule set: each rule yields violating product_ids (or any key), tagged
  * with type + severity, union'd into the exception frame the JSON sink
  * writes.
  *
  * Rules evaluate lazily as DataFrames — the union is one plan; Catalyst
  * shares scans between rules where it can, and nothing is collected
  * until the sink runs.
  */
object Quality {

  final case class Rule(name: String, severity: String,
                        violations: DataFrame)

  /** Evaluate rules → exception rows `(type, severity, product_id)`
    * (procurement_dag.py:169,179 shape). Each rule's frame must expose a
    * product_id column. */
  def exceptions(rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    rules.map { r =>
      r.violations.select(
        lit(r.name).as("type"), lit(r.severity).as("severity"),
        col("product_id"))
    }.reduce(_ unionByName _)
  }

  /** The reference's rule set over the procurement inputs. */
  def referenceRules(orders: DataFrame, inventory: DataFrame,
                     productSuppliers: DataFrame,
                     d: java.time.LocalDate): Seq[Rule] = Seq(
    Rule("MISSING_SUPPLIER_MAPPING", "HIGH",
      Procurement.missingSupplierMapping(orders, productSuppliers, d)),
    Rule("MISSING_INVENTORY", "MEDIUM",
      Procurement.missingInventory(orders, inventory, d)))

  /** Extra rules a production pipeline would add (modelled, tested):
    * negative/zero quantities and inventory snapshots where reserved
    * exceeds available. */
  def nonPositiveQuantity(orders: DataFrame): DataFrame =
    orders.filter(col("quantity") <= 0).select("product_id").distinct()

  def reservedExceedsAvailable(inventory: DataFrame): DataFrame =
    inventory.filter(col("reserved_qty") > col("available_qty"))
      .select("product_id").distinct()
}
