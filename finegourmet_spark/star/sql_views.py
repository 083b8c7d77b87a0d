"""SQL-first consumption of the star schema: register the star frames as
temp views and expose the dashboard catalog (SURVEY.md §2C) as plain SQL —
the interface a BI tool (the reference's Power BI layer) would issue against
a Spark Thrift/Connect endpoint.

Each statement is the SQL twin of the DataFrame query in
star/analytics.py; tests assert both surfaces return identical results."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DSUM = "CAST(SUM(CAST(Price AS DECIMAL(18,4))) AS DOUBLE)"

ANALYTICS_SQL: dict[str, str] = {
    "total_revenue": f"SELECT {_DSUM} AS revenue FROM Fact_Sales",
    "revenue_by_type": f"SELECT Type, {_DSUM} AS revenue FROM Fact_Sales GROUP BY Type",
    "revenue_by_month": f"""
        SELECT CAST(date_trunc('month', Date) AS DATE) AS month, {_DSUM} AS revenue
        FROM Fact_Sales GROUP BY 1 ORDER BY month
    """,
    "revenue_by_category": f"""
        SELECT p.Category, {_DSUM.replace("Price", "f.Price")} AS revenue
        FROM Fact_Sales f LEFT JOIN Dim_Product p ON f.FK_Product_ID = p.Product_ID
        GROUP BY p.Category
        ORDER BY revenue DESC NULLS LAST, p.Category ASC NULLS LAST
    """,
    "top_products": f"""
        SELECT p.Name, {_DSUM.replace("Price", "f.Price")} AS revenue
        FROM Fact_Sales f JOIN Dim_Product p ON f.FK_Product_ID = p.Product_ID
        GROUP BY p.Name ORDER BY revenue DESC, p.Name LIMIT 10
    """,
    "store_share": f"""
        SELECT s.Name, {_DSUM.replace("Price", "f.Price")} AS revenue
        FROM Fact_Sales f JOIN Dim_Store s ON f.FK_Store_ID = s.Store_ID
        WHERE s.Name IS NOT NULL GROUP BY s.Name
    """,
    "revenue_by_store_address": f"""
        SELECT s.Address, {_DSUM.replace("Price", "f.Price")} AS revenue
        FROM Fact_Sales f JOIN Dim_Store s ON f.FK_Store_ID = s.Store_ID
        GROUP BY s.Address
    """,
    "client_ranking": f"""
        SELECT c.First_Name, c.Last_Name,
               {_DSUM.replace("Price", "f.Price")} AS revenue,
               COUNT(*) AS n_purchases
        FROM Fact_Sales f JOIN Dim_Client c ON f.FK_Client_ID = c.Client_ID
        WHERE c.Last_Name IS NOT NULL
        GROUP BY c.First_Name, c.Last_Name
        ORDER BY revenue DESC, c.Last_Name, c.First_Name
    """,
}


def register_star_views(spark: SparkSession, star: dict[str, DataFrame]) -> None:
    for name, df in star.items():
        df.createOrReplaceTempView(name)


def run_analytics_sql(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(ANALYTICS_SQL[name])
