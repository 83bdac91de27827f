"""Feature-table decode: WKB geometry columns → plan-friendly shapes.

The reference keeps geometry opaque inside DuckDB and probes it with an
RTREE per chunk (`LanduseCalculator.py:94-96`). The Spark engine instead
decodes each feature table ONCE into either:

* ``segments`` — every geometry exploded to line segments
  ``(x1,y1,x2,y2)`` + the feature's passthrough attributes. After this, the
  hot paths (point-segment distance, circle-segment clip length) are pure
  column arithmetic inside whole-stage codegen — no Python in the per-pair
  loop, which is where the row counts explode.
* ``bbox`` — geometry kept as WKB + computed ``(xmin,ymin,xmax,ymax)``
  columns, the same trick as the reference's precomputed bbox columns
  (`LanduseCalculator.py:84-88`), for the exact-kernel overlay operators.

Decode runs distributed via ``mapInPandas`` (Arrow batches); at 100 TB each
scan task decodes only its own split.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from duckpipe_spark.geo import geom, wkb


def _passthrough_schema(df: DataFrame, keep_cols: list[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {fields[c]}" for c in keep_cols)


def decode_segments(
    df: DataFrame,
    keep_cols: list[str] | None = None,
    geometry_col: str = "geometry",
    simplify_tol: float | None = None,
    tolerant: bool = False,
) -> DataFrame:
    """Explode geometries into segments. Point features become degenerate
    zero-length segments (the distance/clip math handles them).

    Mirrors `NOT ST_IsEmpty(geometry)` filtering
    (`AirportDistanceCalculator.py:43`) and optional `ST_Simplify`
    (`CoastlineDistanceCalculator.py:18,40`). ``tolerant=True`` skips
    malformed WKB rows instead of failing the job (run
    ``wkb_decode_stats`` on the same table to count them).
    """
    keep_cols = keep_cols or []
    base = _passthrough_schema(df, keep_cols)
    schema = (base + ", " if base else "") + "x1 double, y1 double, x2 double, y2 double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_keep: dict[str, list] = {c: [] for c in keep_cols}
            segs_list = []
            for row in pdf.itertuples(index=False):
                raw = getattr(row, geometry_col)
                if raw is None:
                    continue
                g = wkb.from_wkb(raw, tolerant=tolerant)
                if g is None or g.is_empty:
                    continue
                if simplify_tol is not None:
                    g = geom.simplify(g, simplify_tol)
                segs = geom.segments(g)
                if not len(segs):
                    continue
                segs_list.append(segs)
                for c in keep_cols:
                    out_keep[c].extend([getattr(row, c)] * len(segs))
            if segs_list:
                allsegs = np.concatenate(segs_list, axis=0)
                data = {c: out_keep[c] for c in keep_cols}
                data.update(
                    x1=allsegs[:, 0], y1=allsegs[:, 1], x2=allsegs[:, 2], y2=allsegs[:, 3]
                )
                yield pd.DataFrame(data)

    return df.mapInPandas(gen, schema)


def decode_bbox(
    df: DataFrame,
    keep_cols: list[str] | None = None,
    geometry_col: str = "geometry",
    with_area: bool = False,
    tolerant: bool = False,
) -> DataFrame:
    """Keep WKB, add bbox columns (and optionally the polygon area, used by
    the OA intersection-ratio denominator, `_IntersectingOACalculator.py:77`).
    ``tolerant=True`` skips malformed WKB rows instead of failing the job."""
    keep_cols = keep_cols or []
    base = _passthrough_schema(df, keep_cols)
    schema = (base + ", " if base else "") + "geometry binary, xmin double, ymin double, xmax double, ymax double"
    if with_area:
        schema += ", geom_area double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                raw = getattr(row, geometry_col)
                if raw is None:
                    continue
                g = wkb.from_wkb(raw, tolerant=tolerant)
                if g is None or g.is_empty:
                    continue
                b = geom.bounds(g)
                rec = [getattr(row, c) for c in keep_cols] + [bytes(raw), *b]
                if with_area:
                    rec.append(geom.area(g))
                rows.append(rec)
            cols = keep_cols + ["geometry", "xmin", "ymin", "xmax", "ymax"] + (
                ["geom_area"] if with_area else []
            )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema)


def wkb_decode_stats(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Decode-health profile of a geometry column in one distributed pass →
    a single row (n_rows, n_null, n_malformed, n_empty, n_ok). This is the
    skip COUNT surfaced for tolerant decodes: run it once per ingest and
    alert when n_malformed moves — corpus data at 100 TB always contains
    garbage rows, and a silent skip rate is how a feed regression hides.
    Per-partition counting in the Arrow batch loop + one tiny global sum."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_rows = n_null = n_malformed = n_empty = n_ok = 0
        for pdf in batches:
            for raw in pdf[geometry_col]:
                n_rows += 1
                if raw is None:
                    n_null += 1
                    continue
                try:
                    g = wkb.from_wkb(raw)
                except ValueError:
                    n_malformed += 1
                    continue
                if g is None or g.is_empty:
                    n_empty += 1
                else:
                    n_ok += 1
        yield pd.DataFrame(
            {
                "n_rows": [n_rows],
                "n_null": [n_null],
                "n_malformed": [n_malformed],
                "n_empty": [n_empty],
                "n_ok": [n_ok],
            }
        )

    schema = "n_rows bigint, n_null bigint, n_malformed bigint, n_empty bigint, n_ok bigint"
    part = df.select(geometry_col).mapInPandas(gen, schema)
    return part.agg(
        *[F.sum(c).alias(c) for c in ["n_rows", "n_null", "n_malformed", "n_empty", "n_ok"]]
    )
