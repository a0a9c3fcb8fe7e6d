package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Northwind

/** Queries over the Northwind retail fixture (S12 + the declared
  * 8-path FK join graph, `northwind.sql:3809-3906`): the multi-hop
  * join surface the TPC-H-ish corpus doesn't exercise — two fact
  * tables (orders, order_details) fanning out to four dimensions.
  *
  * Scale shape: order_details/orders are the fact side (shuffle-joined
  * on their keys); customers/products/categories/suppliers are
  * explicitly broadcast dims, so the whole graph runs without a single
  * dim-side shuffle. The oracle reads the same fixture parquet via
  * `read_parquet`, so both engines see identical bytes.
  */
object NorthwindInventory {

  private def N(s: SparkSession, name: String): DataFrame = Northwind.table(s, name)

  // Spark writes each table as a parquet directory; DuckDB needs the
  // part-file glob.
  private def rp(table: String): String =
    s"read_parquet('${Northwind.fixtureDir}/$table.parquet/*.parquet')"

  val defs: Seq[QueryDef] = Seq(

    // Q40 [S12,J3,J6] revenue per category across the full FK graph:
    // order_details -> orders -> customers, and -> products ->
    // categories / suppliers (northwind.sql FKs :3810-3858).
    QueryDef("q40_northwind_join_graph",
      (s, _) => {
        // Money math in DECIMAL on both sides (engine-independent sums).
        val od = N(s, "order_details").select(
          col("order_id"), col("product_id"), col("quantity"),
          col("unit_price").cast("decimal(12,4)").as("price"),
          col("discount").cast("decimal(6,4)").as("disc"))
        val o = N(s, "orders").select("order_id", "customer_id")
        val c = N(s, "customers").select("customer_id")
        val p = N(s, "products").select("product_id", "category_id", "supplier_id")
        val cat = N(s, "categories").select("category_id", "category_name")
        val sup = N(s, "suppliers").select("supplier_id")
        od.join(o, "order_id")
          .join(broadcast(c), "customer_id")
          .join(broadcast(p), "product_id")
          .join(broadcast(cat), "category_id")
          .join(broadcast(sup), "supplier_id")
          .groupBy("category_name")
          .agg(
            round(sum(col("price") * col("quantity") * (lit(1) - col("disc"))), 2)
              .cast("double").as("revenue"),
            countDistinct(col("order_id")).as("n_orders"),
            countDistinct(col("customer_id")).as("n_customers"),
            countDistinct(col("supplier_id")).as("n_suppliers"))
          .orderBy("category_name")
      },
      Some(s"""WITH od AS (SELECT * FROM ${rp("order_details")}),
              |o AS (SELECT * FROM ${rp("orders")}),
              |c AS (SELECT * FROM ${rp("customers")}),
              |p AS (SELECT * FROM ${rp("products")}),
              |cat AS (SELECT * FROM ${rp("categories")}),
              |sup AS (SELECT * FROM ${rp("suppliers")})
              |SELECT cat.category_name,
              |       CAST(ROUND(SUM(CAST(od.unit_price AS DECIMAL(12,4)) * od.quantity
              |                      * (1 - CAST(od.discount AS DECIMAL(6,4)))), 2)
              |            AS DOUBLE) AS revenue,
              |       COUNT(DISTINCT od.order_id) AS n_orders,
              |       COUNT(DISTINCT o.customer_id) AS n_customers,
              |       COUNT(DISTINCT p.supplier_id) AS n_suppliers
              |FROM od
              |JOIN o   ON od.order_id = o.order_id
              |JOIN c   ON o.customer_id = c.customer_id
              |JOIN p   ON od.product_id = p.product_id
              |JOIN cat ON p.category_id = cat.category_id
              |JOIN sup ON p.supplier_id = sup.supplier_id
              |GROUP BY cat.category_name
              |ORDER BY cat.category_name""".stripMargin)),

    // Q41 [S12,J4] org chart: employees self-join on reports_to
    // (fk_employees_employees :3906) + territory coverage counts.
    QueryDef("q41_northwind_org",
      (s, _) => {
        val e = N(s, "employees").select(
          col("employee_id"), col("last_name"), col("reports_to"))
        val m = N(s, "employees").select(
          col("employee_id").as("m_id"), col("last_name").as("manager"))
        val et = N(s, "employee_territories")
          .select(col("employee_id").as("et_eid"), col("territory_id"))
        e.join(broadcast(m), col("reports_to") === col("m_id"), "left")
          .join(et, col("employee_id") === col("et_eid"), "left")
          .groupBy("employee_id", "last_name", "manager")
          .agg(count(col("territory_id")).as("n_territories"))
          .orderBy("employee_id")
      },
      Some(s"""WITH e AS (SELECT * FROM ${rp("employees")}),
              |et AS (SELECT * FROM ${rp("employee_territories")})
              |SELECT e.employee_id, e.last_name, m.last_name AS manager,
              |       COUNT(et.territory_id) AS n_territories
              |FROM e
              |LEFT JOIN e m ON e.reports_to = m.employee_id
              |LEFT JOIN et ON e.employee_id = et.employee_id
              |GROUP BY e.employee_id, e.last_name, m.last_name
              |ORDER BY e.employee_id""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
