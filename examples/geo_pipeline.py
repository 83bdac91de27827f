"""End-to-end exposure-variable pipeline — the Spark-native equivalent of
the reference's `test/example.py:1-38` usage. Runs against the synthetic geo
fixtures (tests/geo_fixtures.py) since the real Korean datasets aren't
distributable; point DATA_DIR at a directory of the reference's parquet
layout to run it for real.

    PYTHONPATH=. python examples/geo_pipeline.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

import pandas as pd

from duckpipe_spark.calculator import Calculator
from tests.geo_fixtures import make_fixtures

if __name__ == "__main__":
    DATA_DIR = tempfile.mkdtemp(prefix="duckpipe-spark-demo-")
    info = make_fixtures(DATA_DIR)
    df: pd.DataFrame = info["points"]

    calculator = Calculator(data_dir=DATA_DIR, n_workers=8)
    geovariable = (
        calculator.add_point_with_table(df, x_col="longitude", y_col="latitude", epsg=4326)
        .chunk_by_centroid(max_cluster_size=100, distance_threshold=10000)
        .calculate_coordinate()
        .calculate_airport_distance(years=[2000, 2005])
        .calculate_coastline_distance(years=[2000])
        .calculate_landuse_area_ratio(years=[2000], buffer_sizes=[100.0, 500.0, 1000.0])
        .calculate_relative_elevation(elev_types=["dem"], buffer_sizes=[500.0, 1000.0])
        .calculate_road_distance(years=[2005, 2010])
        .calculate_road_llw(buffer_sizes=[500.0, 2000.0], years=[2005])
        .calculate_main_road_llw("mr1", buffer_sizes=[2000.0], years=[2005])
        .get_result(pivot=True)
    )
    pd.set_option("display.max_columns", 12)
    pd.set_option("display.width", 200)
    print(geovariable)
    print(f"\n{len(geovariable)} rows x {len(geovariable.columns)} columns")
