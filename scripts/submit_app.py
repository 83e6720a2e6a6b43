#!/usr/bin/env python3
"""spark-submit primary application file.

The package itself ships via ``--py-files dist/zentity_spark.zip`` (built by
``scripts/build_zip.py``); this launcher only forwards argv to the CLI:

    spark-submit --master <cluster> \\
        --py-files dist/zentity_spark.zip scripts/submit_app.py \\
        resolve --docs <table> --model model.json --output <table> \\
        [--checkpoint-dir <dir>] [--storage-format iceberg] ...

All subcommands/flags are ``zentity_spark.cli``'s (resolve / seeded / about).
No repo checkout is needed on the cluster — the import below resolves from
the zip on the driver and executors.
"""

import sys

from zentity_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
