"""E1 (Hive catalog mode) and S8 (JDBC source) exercised for REAL.

Both need a fresh JVM — ``enableHiveSupport`` sets the static
``catalogImplementation`` conf, and the embedded Derby engine locks its
database directory per JVM — so the scenario runs in one subprocess
(reusing the parent's SparkContext would silently test nothing).

The JDBC round-trip uses the Derby embedded driver that ships inside
pyspark's jars: a genuine write → partitioned read through Spark's JDBC
source, executing the partition-bound logic of
``sources/files.jdbc_batch`` (reference: the bulk-mode MySQL connector,
mysql-kafka-connect-source.properties:1-10) instead of only validating
its option dict.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)

_SCENARIO = """
import sys
sys.path.insert(0, {repo!r})

from projetbigdatastreaming_spark.session import get_session
from projetbigdatastreaming_spark.sources.files import jdbc_batch

spark = get_session(
    master="local[2]",
    shuffle_partitions=2,
    hive_support=True,
    warehouse_dir={warehouse!r},
)

# --- E1: Hive catalog round-trip ------------------------------------
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
df = spark.range(10).selectExpr("id", "id * 2 AS v")
df.write.mode("overwrite").saveAsTable("t_hive_rt")
back = spark.table("t_hive_rt")
assert back.count() == 10
assert spark.catalog.tableExists("t_hive_rt")
assert sorted(r.v for r in back.collect()) == [2 * i for i in range(10)]
print("HIVE_OK")

# --- S8: JDBC write -> partitioned read via embedded Derby ----------
url = "jdbc:derby:" + {derby_db!r} + ";create=true"
props = {{"driver": "org.apache.derby.jdbc.EmbeddedDriver"}}
src = spark.range(100).selectExpr("CAST(id AS INT) AS id", "id * 3 AS v")
src.write.mode("overwrite").format("jdbc").option("url", url).option(
    "dbtable", "T_JDBC"
).option("driver", props["driver"]).save()

got = jdbc_batch(
    spark,
    url,
    "T_JDBC",
    partition_column="id",
    num_partitions=3,
    lower_bound=0,
    upper_bound=100,
    properties=props,
)
# the partition bounds must produce a genuinely parallel scan
assert got.rdd.getNumPartitions() == 3
rows = {{r.id: r.v for r in got.collect()}}
assert len(rows) == 100 and rows[7] == 21
print("JDBC_OK")
"""


def test_hive_and_jdbc_round_trip(tmp_path):
    code = _SCENARIO.format(
        repo=REPO_ROOT,
        warehouse=str(tmp_path / "warehouse"),
        derby_db=str(tmp_path / "derbydb"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # keeps metastore_db/ + derby.log out of the repo
        timeout=600,
    )
    assert "HIVE_OK" in proc.stdout, proc.stderr[-3000:]
    assert "JDBC_OK" in proc.stdout, proc.stderr[-3000:]
