"""End-to-end Calculator pipeline tests on synthetic geo fixtures
(SURVEY.md §5 items 3-4), with expected values recomputed by independent
brute-force numpy (not through the Spark operators)."""

import math

import numpy as np
import pandas as pd
import pytest

from duckpipe_spark.geo import geom, wkb
from tests.geo_fixtures import N_POINTS, make_fixtures


@pytest.fixture(scope="module")
def geo(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("geodata")
    info = make_fixtures(str(d))
    return {"dir": str(d), "info": info}


def _calc(spark, geo):
    from duckpipe_spark.calculator import Calculator

    c = Calculator(data_dir=geo["dir"], spark=spark, verbose=False)
    c.add_point_with_table(geo["info"]["points"], x_col="longitude", y_col="latitude", epsg=4326)
    return c


def _brute_min_point_dist(px, py, fx, fy):
    return np.sqrt((fx[None, :] - px[:, None]) ** 2 + (fy[None, :] - py[:, None]) ** 2).min(axis=1)


def test_ingest_ids_and_crs_roundtrip(spark, geo):
    c = _calc(spark, geo)
    pts = c.points.orderBy("id").toPandas()
    assert pts["id"].tolist() == list(range(1, N_POINTS + 1))
    # CRS round trip: x/y must match the generator's original EPSG:5179 coords
    assert np.abs(pts["x"].to_numpy() - geo["info"]["px"]).max() < 1e-6
    assert np.abs(pts["y"].to_numpy() - geo["info"]["py"]).max() < 1e-6


def test_airport_distance_matches_bruteforce(spark, geo):
    c = _calc(spark, geo).calculate_airport_distance(years=[2000, 2005])
    long = c.result_long().toPandas()
    for year in (2000, 2005):
        ax, ay = geo["info"]["airport"][year]
        expected = _brute_min_point_dist(geo["info"]["px"], geo["info"]["py"], ax, ay)
        got = (
            long[(long.varname == "D_Airport") & (long.year == year)]
            .sort_values("id")["value"]
            .to_numpy()
        )
        assert len(got) == N_POINTS
        assert np.allclose(got, expected, rtol=1e-12)


def test_empty_year_drops_ids_then_null_after_pivot(spark, geo):
    # airport has zero rows for 2015 (inner-join semantics J1)
    c = _calc(spark, geo).calculate_airport_distance(years=[2000, 2015])
    long = c.result_long().toPandas()
    assert (long.year == 2015).sum() == 0
    wide = c.get_result(pivot=True)
    y2000 = wide[wide.year == 2000]
    assert y2000["D_Airport"].notna().all()
    assert len(y2000) == N_POINTS


def test_invalid_year_raises(spark, geo):
    c = _calc(spark, geo)
    with pytest.raises(ValueError, match="Invalid year"):
        c.calculate_airport_distance(years=[1999])


def test_runtime_typecheck_raises_clear_errors(spark, geo):
    """@typechecked analog (ref core.py:38, Worker.py:108): wrong argument
    TYPES fail fast with the argument name, not as deep Spark errors."""
    c = _calc(spark, geo)
    with pytest.raises(TypeError, match="years"):
        c.calculate_airport_distance(years="2000")
    with pytest.raises(TypeError, match="years"):
        c.calculate_airport_distance(years=[2000, "2005"])
    with pytest.raises(TypeError, match="years"):
        c.calculate_airport_distance(years=True)
    with pytest.raises(TypeError, match="buffer_sizes"):
        c.calculate_road_llw(buffer_sizes={"100": 1}, years=[2005])
    with pytest.raises(TypeError, match="mr_types"):
        c.calculate_main_road_distance(mr_types=1, years=[2005])
    # int where float is declared is fine (buffer_sizes=100 means 100.0)
    c2 = _calc(spark, geo)
    c2.calculate_road_llw(buffer_sizes=100, years=[2005])
    with pytest.raises(TypeError, match="df must be"):
        _calc(spark, geo).add_point_with_table([(1.0, 2.0)], x_col="a", y_col="b")
    with pytest.raises(ValueError, match="not in input"):
        c2.add_point_with_table(geo["info"]["points"], x_col="nope", y_col="latitude")
    with pytest.raises(TypeError, match="epsg"):
        c2.add_point_with_table(geo["info"]["points"], epsg="4326")


def test_numpy_scalars_normalize_in_typecheck():
    """Values sliced from pandas/numpy columns (np.int64, np.float64,
    ndarray) pass the runtime typecheck as their abstract-number kinds;
    bools (incl. np.bool_) never count as numbers."""
    import numpy as np

    from duckpipe_spark.calculator import _as_list

    assert _as_list(np.int64(2010), int) == [2010]
    assert _as_list(np.array([2000, 2005]), int) == [2000, 2005]
    assert _as_list(np.float64(1.5), float) == [1.5]
    assert _as_list(np.int32(100), float) == [100.0]
    with pytest.raises(TypeError):
        _as_list(np.float64(1.5), int)  # float where int declared still raises
    with pytest.raises(TypeError):
        _as_list(np.bool_(True), int)


def test_coastline_simplify_changes_distance(spark, geo):
    c = _calc(spark, geo).calculate_coastline_distance(years=[2000])
    got = c.result_long().toPandas().sort_values("id")["value"].to_numpy()
    coords = geo["info"]["coastline"][2000]
    raw_line = wkb.linestring(coords)
    simp_line = geom.simplify(raw_line, 1.0)
    assert len(simp_line.data) < len(coords)  # simplify actually reduced
    exp_simp = np.array(
        [geom.distance_point(x, y, simp_line) for x, y in zip(geo["info"]["px"], geo["info"]["py"])]
    )
    assert np.allclose(got, exp_simp, rtol=1e-9)


def test_road_llw_matches_bruteforce(spark, geo):
    buffers = [500.0, 2000.0]
    c = _calc(spark, geo).calculate_road_llw(buffer_sizes=buffers, years=[2005])
    long = c.result_long().toPandas()
    px, py = geo["info"]["px"], geo["info"]["py"]
    roads05 = [r for r in geo["info"]["roads"] if r["year"] == 2005]
    for bs in buffers:
        for stat, fL in (("L", lambda L, r: L), ("LL", lambda L, r: L * r["lanes"]),
                         ("LLW", lambda L, r: L * r["lanes"] * r["width"])):
            varname = f"Road_{stat}_{int(bs):04d}"
            got = (
                long[long.varname == varname].sort_values("id")["value"].to_numpy()
            )
            exp = np.zeros(N_POINTS)
            for i, (x, y) in enumerate(zip(px, py)):
                for r in roads05:
                    L = geom.circle_line_clip_length(x, y, bs, wkb.linestring(r["coords"]))
                    exp[i] += fL(L, r)
            assert len(got) == N_POINTS, varname
            assert np.allclose(got, exp, rtol=1e-9, atol=1e-6), varname


def test_main_road_llw_fk_subset(spark, geo):
    c = _calc(spark, geo).calculate_main_road_llw("mr1", buffer_sizes=[2000.0], years=[2005])
    long = c.result_long().toPandas()
    fk = set(geo["info"]["mr1_fk"])
    roads_sel = [r for r in geo["info"]["roads"] if r["id"] in fk]
    px, py = geo["info"]["px"], geo["info"]["py"]
    got = long[long.varname == "MR1_L_2000"].sort_values("id")["value"].to_numpy()
    exp = np.zeros(N_POINTS)
    for i, (x, y) in enumerate(zip(px, py)):
        for r in roads_sel:
            exp[i] += geom.circle_line_clip_length(x, y, 2000.0, wkb.linestring(r["coords"]))
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-6)


def test_landuse_area_ratio(spark, geo):
    buffers = [1000.0]
    c = _calc(spark, geo).calculate_landuse_area_ratio(years=[2000], buffer_sizes=buffers)
    long = c.result_long().toPandas()
    px, py = geo["info"]["px"], geo["info"]["py"]
    codes = sorted({p["code"] for p in geo["info"]["landuse"]})
    # full skeleton: ids × codes × buffers × 2 stats
    assert len(long) == N_POINTS * len(codes) * len(buffers) * 2
    for code in codes:
        polys = [p for p in geo["info"]["landuse"] if p["code"] == code]
        exp_a = np.zeros(N_POINTS)
        for i, (x, y) in enumerate(zip(px, py)):
            for p in polys:
                exp_a[i] += geom.circle_polygon_area(x, y, 1000.0, wkb.polygon([p["ring"]]))
        got_a = (
            long[long.varname == f"LS{code}_1000_a"].sort_values("id")["value"].to_numpy()
        )
        got_p = (
            long[long.varname == f"LS{code}_1000_p"].sort_values("id")["value"].to_numpy()
        )
        assert np.allclose(got_a, exp_a, rtol=1e-9, atol=1e-6)
        assert np.allclose(got_p, exp_a / (math.pi * 1000.0**2), rtol=1e-9, atol=1e-12)


def test_relative_elevation(spark, geo):
    buffers = [500.0]
    c = _calc(spark, geo).calculate_relative_elevation("dem", buffer_sizes=buffers)
    long = c.result_long().toPandas()
    assert long["year"].isna().all()
    dem = geo["info"]["dem"]
    px, py = geo["info"]["px"], geo["info"]["py"]
    xmin = dem["xmin"].to_numpy()
    xmax = dem["xmax"].to_numpy()
    ymin = dem["ymin"].to_numpy()
    ymax = dem["ymax"].to_numpy()
    val = dem["value"].to_numpy()
    ref_got = long[long.varname == "Altitude_k"].sort_values("id")["value"].to_numpy()
    for i, (x, y) in enumerate(zip(px, py)):
        inside = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
        exp_ref = val[inside].mean() if inside.any() else np.nan
        assert ref_got[i] == pytest.approx(exp_ref, rel=1e-12)
        # donut ratio above_20 for r=500
        dx = np.maximum(np.maximum(xmin - x, x - xmax), 0.0)
        dy = np.maximum(np.maximum(ymin - y, y - ymax), 0.0)
        min_d = np.hypot(dx, dy)
        cdx = np.maximum(x - xmin, xmax - x)
        cdy = np.maximum(y - ymin, ymax - y)
        max_d = np.hypot(cdx, cdy)
        donut = (min_d <= 530.0) & (max_d >= 500.0)
        if donut.any():
            exp_above = ((val[donut] - exp_ref) > 20.0).mean()
            got = long[(long.varname == "Alt_k_above_20_500.0") & (long.id == i + 1)]["value"]
            assert got.iloc[0] == pytest.approx(exp_above, rel=1e-12)


def test_coordinates_roundtrip(spark, geo):
    c = _calc(spark, geo).calculate_coordinate(mode="centroid")
    long = c.result_long().toPandas()
    pts = geo["info"]["points"]
    wgs_x = long[long.varname == "WGS_X"].sort_values("id")["value"].to_numpy()
    assert np.abs(wgs_x - pts["longitude"].to_numpy()).max() < 1e-9
    tm_x = long[long.varname == "TM_X"].sort_values("id")["value"].to_numpy()
    assert np.abs(tm_x - geo["info"]["px"]).max() < 1e-6
    with pytest.raises(ValueError, match="Invalid mode"):
        _calc(spark, geo).calculate_coordinate(mode="nope")


def test_intersecting_oa(spark, geo):
    c = _calc(spark, geo).calculate_intersecting_oa(buffer_sizes=[3000.0])
    df = c.oa_intersection_df.toPandas()
    px, py = geo["info"]["px"], geo["info"]["py"]
    # every (id, buffer) present even when nothing intersects
    assert set(df["id"]) == set(range(1, N_POINTS + 1))
    for row in df.itertuples():
        if row.tot_reg_cd is None:
            continue
        oa = next(o for o in geo["info"]["oa"] if o["tot_reg_cd"] == row.tot_reg_cd)
        x, y = px[row.id - 1], py[row.id - 1]
        exp = geom.circle_polygon_area(x, y, 3000.0, wkb.polygon([oa["ring"]])) / oa["area"]
        assert row.intersection_ratio == pytest.approx(exp, rel=1e-9)


def test_pivot_shape_and_attr_preservation(spark, geo):
    c = (
        _calc(spark, geo)
        .calculate_airport_distance(years=[2000])
        .calculate_coordinate()
    )
    wide = c.get_result(pivot=True)
    # per id: one row for year 2000 + one NULL-year row (coordinate vars)
    assert len(wide) == 2 * N_POINTS
    value_cols = [c_ for c_ in wide.columns if c_ not in ("pid", "longitude", "latitude", "id", "year")]
    assert value_cols == sorted(value_cols)
    assert "pid" in wide.columns  # original attrs preserved
    null_rows = wide[wide.year.isna()]
    assert null_rows["TM_X"].notna().all()
    assert null_rows["D_Airport"].isna().all()


def test_pivot_with_dotted_varnames(spark, geo):
    # relative-elevation varnames contain '.' (buffer cast to VARCHAR, e.g.
    # Alt_k_above_20_500.0) — pivot column selection must backtick-quote
    c = _calc(spark, geo).calculate_relative_elevation("dem", buffer_sizes=[500.0])
    wide = c.get_result(pivot=True)
    assert any("." in col for col in wide.columns)
    assert "Alt_k_above_20_500.0" in wide.columns


def test_get_result_long_mode(spark, geo):
    c = _calc(spark, geo).calculate_airport_distance(years=[2000])
    long = c.get_result(pivot=False)
    assert {"id", "varname", "year", "value"} <= set(long.columns)
    assert len(long) == N_POINTS


def test_chunk_hints(spark, geo):
    c = _calc(spark, geo)
    c.chunk_by_order(max_cluster_size=10)
    assert c.get_chunks() == 3
    c.chunk_by_hilbert(max_cluster_size=10)
    got = c.calculate_airport_distance(years=[2000]).result_long().toPandas()
    assert len(got) == N_POINTS


def test_distributed_spark_ingest_path(spark, geo):
    """add_point_with_table with a Spark DataFrame input: arrival-order ids
    from monotonically_increasing_id + partition offsets (JVM-side — the id
    path must not appear as a Python RDD scan), CRS transform via pandas
    UDF — must agree with the pandas driver-side path."""
    from duckpipe_spark.calculator import Calculator

    pdf = geo["info"]["points"]
    sdf = spark.createDataFrame(pdf)
    c = Calculator(data_dir=geo["dir"], spark=spark, verbose=False)
    c.add_point_with_table(sdf, x_col="longitude", y_col="latitude", epsg=4326)
    plan = c.points._jdf.queryExecution().executedPlan().toString()
    # the only Python boundary allowed is the Arrow-vectorized CRS transform
    assert "ExistingRDD" not in plan, plan
    pts = c.points.orderBy("id").toPandas()
    assert pts["id"].tolist() == list(range(1, N_POINTS + 1))
    assert np.abs(pts["x"].to_numpy() - geo["info"]["px"]).max() < 1e-6
    attrs = c.attrs.orderBy("id").toPandas()
    assert "pid" in attrs.columns and len(attrs) == N_POINTS


def test_distributed_ingest_empty_dataframe(spark, geo):
    """Empty Spark-DataFrame ingest must build (explicit createDataFrame
    schemas) and produce empty points/attrs, not a schema-inference error."""
    import pyspark.sql.functions as F

    from duckpipe_spark.calculator import Calculator

    src = spark.createDataFrame([], "longitude double, latitude double, tag string")
    c = Calculator(data_dir=geo["dir"], spark=spark, verbose=False)
    c.add_point_with_table(src, x_col="longitude", y_col="latitude", epsg=4326)
    assert c.points.count() == 0
    assert c.attrs.count() == 0
