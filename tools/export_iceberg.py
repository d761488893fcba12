"""CLI for the Iceberg metadata export (ICEBERG.md made executable).

    python tools/export_iceberg.py <index_dir> <out_dir>

Writes one Iceberg table metadata tree per snapshot-pinned index table
(see searchengines_spark/index/iceberg_export.py for the spec mapping and
the JSON-vs-Avro encoding caveat on manifests) and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from searchengines_spark.index.iceberg_export import export_index  # noqa: E402


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    index_dir, out_dir = sys.argv[1], sys.argv[2]
    paths = export_index(index_dir, out_dir)
    print(json.dumps({"tables": len(paths), "metadata": paths}, indent=1))


if __name__ == "__main__":
    main()
