"""spark-submit launcher (north rule: ships via ``spark-submit --py-files``).

Build the dependency zip, then submit:

    python scripts/package_pyfiles.py            # -> /tmp/doc2md_pyfiles.zip
    spark-submit --master local[8] \
        --py-files /tmp/doc2md_pyfiles.zip \
        scripts/submit_job.py --n-docs 500 --output /tmp/out_submit

On a real cluster the same invocation takes ``--master yarn|k8s://...``
and ``--num-executors N`` — the job code is identical; the package
arrives on executors via the zip, not a cluster-wide install.

spark-submit injects a SparkSession-friendly environment; the CLI's own
``build_session`` then only fills in what --conf didn't set.
"""

import sys

from document_convert_to__markdown_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
