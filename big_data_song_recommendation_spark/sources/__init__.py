from . import sinks  # noqa: F401
from .batchfile_source import BatchFileDataSource  # noqa: F401
from .readers import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_csv_hardened,
    read_json_hardened,
    register_views,
)
