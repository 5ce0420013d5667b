from aind_data_transformation_spark.io.sources import (  # noqa: F401
    TABLES,
    load_table,
    table_path,
)
