from search_engine_spark.plans.driver_queries import driver_queries, driver_oracle_sql

__all__ = ["driver_queries", "driver_oracle_sql"]
