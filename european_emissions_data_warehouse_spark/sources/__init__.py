from european_emissions_data_warehouse_spark.sources.schemas import (  # noqa: F401
    EMISSIONS_RAW_SCHEMA,
    TESTDATA_SCHEMAS,
    WAREHOUSE_SCHEMA,
)
from european_emissions_data_warehouse_spark.sources.readers import (  # noqa: F401
    load_table,
    register_tables,
    read_csv,
    read_json,
    read_parquet,
)
