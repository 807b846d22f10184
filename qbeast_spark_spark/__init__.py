"""qbeast_spark_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Qbeast-io/qbeast-spark (reference read-only at
/root/reference), built Spark-first from public APIs.

Public surface (SURVEY.md §7.0):

    import qbeast_spark_spark as qss
    qss.write(df, path, columns_to_index=["a", "b"], cube_size=5000)
    qt = qss.QbeastTable.for_path(spark, path)
    qt.to_df();  qt.sample(0.01);  qt.read(filters=[("a", ">=", 10)])
    qt.index_metrics();  qt.revisions()
"""

from .core.cube import CubeId
from .core.revision import Revision, DEFAULT_CUBE_SIZE
from .core.weight import fraction_to_weight, weight_to_fraction
from .functions.ranks import exact_ntile_cuts, rows_at_ranks
from .functions.selection import compute_quantiles, select_columns_to_index
from .functions.skew import salted_join
from .sources.delta_import import (convert_delta_to_qbeast,
                                   read_delta_snapshot, read_delta_table)
from .sources.qbeast_format import (attach_qbeast_delta,
                                    read_qbeast_delta_snapshot)
from .sources.compact import compact_table
from .sources.dml import delete_rows, merge_rows, update_rows
from .sources.maintenance import auto_maintain
from .sources.matview import (create_continuous_agg, read_continuous_agg,
                              refresh_continuous_agg)
from .sources.optimize import convert_to_qbeast, optimize_table, write_staging
from .sources.catalog import QbeastSqlCatalog, qsql
from .sources.pyds import QbeastDataSource
from .sources.pyds import register as register_data_source
from .sources.reader import QbeastTable, read_qbeast
from .sources.writer import write_qbeast

__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package's executor-side closures by value so Spark Python
    workers never need the package importable on their own PYTHONPATH (the
    usual failure mode of a driver-only library on a real cluster)."""
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - pyspark always present here
        return
    for name, mod in list(sys.modules.items()):
        if name == __name__ or name.startswith(__name__ + "."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


_register_pickle_by_value()

write = write_qbeast
read = read_qbeast

__all__ = [
    "CubeId", "Revision", "DEFAULT_CUBE_SIZE", "QbeastTable",
    "write", "read", "write_qbeast", "read_qbeast",
    "optimize_table", "compact_table", "auto_maintain",
    "create_continuous_agg", "refresh_continuous_agg",
    "read_continuous_agg",
    "convert_to_qbeast", "write_staging",
    "convert_delta_to_qbeast", "read_delta_snapshot", "read_delta_table",
    "select_columns_to_index", "compute_quantiles",
    "fraction_to_weight", "weight_to_fraction",
    "rows_at_ranks", "exact_ntile_cuts", "salted_join",
    "QbeastDataSource", "register_data_source",
    "QbeastSqlCatalog", "qsql",
]
