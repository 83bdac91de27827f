"""Table maintenance walkthrough: stats → histogram → compaction → merge →
streaming CDC — the storage-ownership verbs a 100 TB deployment runs daily.

    PYTHONPATH=. python examples/table_maintenance.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from duckpipe_spark.operators.maintenance import (
    column_histogram,
    compact_small_files,
    merge_upsert,
    table_stats,
)
from duckpipe_spark.session import get_spark
from duckpipe_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("table-maintenance")
    li = load_table(spark, sf_dir, "lineitem")

    print("== one-pass column statistics ==")
    table_stats(li, ["l_orderkey", "l_quantity", "l_extendedprice"]).show()

    print("== value histogram (skew check before picking salt factors) ==")
    column_histogram(li, "l_extendedprice", 0.0, 80000.0, 8).orderBy("bucket").show()

    print("== small-file compaction ==")
    work = tempfile.mkdtemp(prefix="maint-")
    li.repartition(40).write.parquet(f"{work}/many")
    n = compact_small_files(spark, f"{work}/many", f"{work}/compact", target_file_mb=256)
    print(f"40 files -> {n} file(s); rows preserved:",
          spark.read.parquet(f"{work}/compact").count() == li.count())

    print("== keyed upsert merge (daily incremental load) ==")
    import pyspark.sql.functions as F

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = orders.limit(100).withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    merged = merge_upsert(orders, updates, "o_orderkey")
    print("rows:", merged.count(), "(unchanged);",
          "updated keys:", updates.count())
