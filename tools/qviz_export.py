"""CLI twin of the reference's `qviz` command (utils/visualizer/
setup.py entry point -> qviz.show_tree): export a table's per-revision
OTree cube tree as JSON + a static self-contained HTML/SVG instead of
launching a dash server.

    python tools/qviz_export.py <table_path> [--revision-id N]
        [--fraction F] [--out DIR] [--delta]

``--delta`` opens a reference/Delta-format table through the interop
reader (QbeastTable.for_delta); default expects this engine's
_qbeast_log format.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("-r", "--revision-id", type=int, default=None,
                    help="target revision (default: latest non-staging)")
    ap.add_argument("-f", "--fraction", type=float, default=0.02,
                    help="sampling fraction to highlight (default 0.02)")
    ap.add_argument("-o", "--out", default=None,
                    help="output dir (default: <table>/_qviz)")
    ap.add_argument("--delta", action="store_true",
                    help="open a reference/Delta-format table")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import qbeast_spark_spark as qss

    spark = (SparkSession.builder.master("local[4]")
             .appName("qviz-export")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qt = (qss.QbeastTable.for_delta(spark, args.path) if args.delta
          else qss.QbeastTable.for_path(spark, args.path))
    out_dir = args.out or os.path.join(args.path, "_qviz")
    tree = qt.viz(out_dir, revision_id=args.revision_id,
                  fraction=args.fraction)
    si = tree.get("sampling_info", {})
    print(f"revision {tree['revision_id']}: {tree['cube_count']} cubes, "
          f"dims {tree['dimensions']} ({', '.join(tree['columns'])})")
    if si:
        print(f"fraction {si['fraction']}: rows {si['sampled_rows']}/"
              f"{si['total_rows']} ({si['rows_pct']}%), files "
              f"{si['sampled_files']}/{si['total_files']}")
    print("wrote", tree["json_path"])
    print("wrote", tree["html_path"])


if __name__ == "__main__":
    main()
