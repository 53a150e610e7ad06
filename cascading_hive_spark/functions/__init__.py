from cascading_hive_spark.functions.registry import install_sql_functions  # noqa: F401
