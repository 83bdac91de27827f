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
) -> DataFrame:
    """Explode geometries into segments. Point features become degenerate
    zero-length segments (the distance/clip math handles them).

    Mirrors `NOT ST_IsEmpty(geometry)` filtering
    (`AirportDistanceCalculator.py:43`) and optional `ST_Simplify`
    (`CoastlineDistanceCalculator.py:18,40`).
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
                g = wkb.from_wkb(raw)
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
) -> DataFrame:
    """Keep WKB, add bbox columns (and optionally the polygon area, used by
    the OA intersection-ratio denominator, `_IntersectingOACalculator.py:77`)."""
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
                g = wkb.from_wkb(raw)
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
