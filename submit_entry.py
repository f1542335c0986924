#!/usr/bin/env python3
"""spark-submit entry script (north rule: ships via --py-files).

    python -m searchengine_spark.cli package --out dist/searchengine_spark.zip
    spark-submit --py-files dist/searchengine_spark.zip submit_entry.py \
        build --input /data/corpus --index /data/index --buckets 256 --range-bits 8
    spark-submit --py-files dist/searchengine_spark.zip submit_entry.py \
        search --index /data/index --query "inverted index merge" -k 100

--py-files puts the zip on the driver's and every executor's sys.path; this
script is the only file outside the zip (the package's cli uses relative
imports, so it cannot itself be the primary resource).
"""

import sys

from searchengine_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
