"""Scale smoke: the reference's headline workload shape — 100,000 points
(its bundled sample CSV size, `data/sample_point_korea.csv`) through the
exposure-variable pipeline — against the synthetic feature fixtures.

    PYTHONPATH=. python examples/geo_scale_smoke.py [n_points]
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

from duckpipe_spark.calculator import Calculator
from duckpipe_spark.geo.crs import tm_to_lonlat
from tests.geo_fixtures import X0, X1, Y0, Y1, make_fixtures

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    data_dir = tempfile.mkdtemp(prefix="duckpipe-spark-scale-")
    make_fixtures(data_dir)

    rng = np.random.default_rng(7)
    px = rng.uniform(X0 + 5000, X1 - 5000, n)
    py = rng.uniform(Y0 + 5000, Y1 - 5000, n)
    lon, lat = tm_to_lonlat(px, py)
    df = pd.DataFrame({"pid": np.arange(n), "longitude": lon, "latitude": lat})

    t0 = time.perf_counter()
    calc = Calculator(data_dir=data_dir)
    wide = (
        calc.add_point_with_table(df, x_col="longitude", y_col="latitude", epsg=4326)
        .chunk_by_hilbert()
        .calculate_coordinate()
        .calculate_airport_distance(years=[2000, 2005])
        .calculate_road_distance(years=[2005])
        .calculate_road_llw(buffer_sizes=[500.0], years=[2005])
        .calculate_relative_elevation(elev_types=["dem"], buffer_sizes=[500.0])
        .get_result(pivot=True)
    )
    dt = time.perf_counter() - t0
    n_vars = len(wide.columns) - 3  # pid, longitude, latitude
    print(f"{n} points x {n_vars} variables in {dt:.1f}s  ({n * n_vars / dt:.0f} point-vars/s)")
