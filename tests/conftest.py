import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for the Spark-layer tests."""
    from document_convert_to__markdown_spark.pipeline.session import build_session

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    warehouse = tempfile.mkdtemp(prefix="doc2md_wh_")
    session = build_session(
        "doc2md-tests", master="local[8]", shuffle_partitions=8,
        extra_conf={
            # Keep managed-table files (bucketing tests) out of the repo.
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield session
    session.stop()
    shutil.rmtree(warehouse, ignore_errors=True)
