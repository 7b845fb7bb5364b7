"""S8 PNG report sink: one stacked raw/clean check panel per QC variable.

Reference: ``qc_save_all_plots_png`` (``R/qc_plots.R:131-177``) renders
``qc_check_plot`` (V5, ``R/qc_plots.R:45-56``) for every flagged
variable into a single tall PNG, warning when the computed height
exceeds ~30,000 px (``R/qc_plots.R:151-157``).

Scale design: the engine never ships raw rows to the renderer.  Each
variable is reduced by ONE grouped aggregation to ≤ ``n_buckets``
per-pixel-bucket rows carrying raw/clean/flagged min-max bands (the V5
panel pair + overlay in a single shuffle), so a 100 TB table renders
from a few thousand rows.  The raster itself is a numpy array encoded
with a dependency-free PNG writer (zlib deflate of filter-0 scanlines —
the minimal standard encoding), because no plotting library ships in
this environment; the output is a plain 8-bit RGB PNG any viewer opens.
"""

from __future__ import annotations

import os
import struct
import warnings
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.schema import DEFAULT_SUFFIX, qc_vars

#: reference's viewer-compatibility guard (R/qc_plots.R:151-157)
MAX_HEIGHT_PX = 30_000

# panel colors (RGB)
_RAW = (70, 70, 190)
_CLEAN = (30, 140, 60)
_FLAGGED = (200, 40, 40)
_AXIS = (180, 180, 180)
_BG = (255, 255, 255)


def panel_downsample(
    df: DataFrame,
    var: str,
    time_col: str,
    *,
    suffix: str = DEFAULT_SUFFIX,
    n_buckets: int = 2000,
    t0: float | None = None,
    t1: float | None = None,
) -> DataFrame:
    """Per-bucket bands for one variable's check panel — ONE aggregation.

    Columns: bucket, raw_min/raw_max (all non-null values), clean_min/
    clean_max (strict-clean: flag < 1 masked, P5), flag_min/flag_max
    (manual-flagged only, flag ≤ -2), n_rows.  Conditional aggregates
    fuse the three V5 bands into a single shuffle whose input is two
    columns per row regardless of table width.
    """
    f = F.col(f"{var}{suffix}")
    v = F.col(var)
    if t0 is None or t1 is None:
        lo, hi = df.agg(
            F.min(F.col(time_col).cast("double")),
            F.max(F.col(time_col).cast("double")),
        ).collect()[0]
        t0 = t0 if t0 is not None else lo
        t1 = t1 if t1 is not None else hi
    span = max((t1 or 0) - (t0 or 0), 1e-9)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(time_col).cast("double") - F.lit(t0)) / span * n_buckets),
    ).cast("int")
    clean = F.when(f >= 1, v)
    flagged = F.when(f <= -2, v)
    return (
        df.filter(v.isNotNull() & F.col(time_col).isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.min(v).alias("raw_min"),
            F.max(v).alias("raw_max"),
            F.min(clean).alias("clean_min"),
            F.max(clean).alias("clean_max"),
            F.min(flagged).alias("flag_min"),
            F.max(flagged).alias("flag_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bucket")
    )


def _write_png(path: str, arr) -> None:
    """Minimal PNG encoder: 8-bit RGB, filter 0, one zlib stream."""
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


def _axis_scale(pdf, lo_col, hi_col) -> tuple[float, float] | None:
    """(v_lo, v_hi) with the A5 ±2% pad over a band's finite values."""
    import numpy as np

    vals = pdf[[lo_col, hi_col]].to_numpy(dtype=float)
    finite = vals[~np.isnan(vals).any(axis=1)]
    if not len(finite):
        return None
    v_lo, v_hi = float(finite.min()), float(finite.max())
    pad = (v_hi - v_lo) * 0.02 or 1.0
    return v_lo - pad, v_hi + pad


def _rasterize_panel(canvas, y_off: int, panel_h: int, pdf, lo_col, hi_col,
                     color, n_buckets: int, scale: tuple[float, float]) -> None:
    """Draw one band (vertical min-max bars per bucket) into the canvas.

    ``scale`` is the shared panel axis — overlays (e.g. the flagged
    band drawn over the raw band) must use the host panel's scale so
    they register at the correct y positions.
    """
    import numpy as np

    h, w = panel_h, canvas.shape[1]
    v_lo, v_hi = scale
    vals = pdf[[lo_col, hi_col]].to_numpy(dtype=float)
    mask = ~np.isnan(vals).any(axis=1)
    if not mask.any():
        return
    finite = vals[mask]
    xs = (pdf["bucket"].to_numpy()[mask] * (w - 1) / max(n_buckets - 1, 1)).astype(int)
    y0 = ((v_hi - finite[:, 1]) / (v_hi - v_lo) * (h - 1)).astype(int)
    y1 = ((v_hi - finite[:, 0]) / (v_hi - v_lo) * (h - 1)).astype(int)
    for x, a, b in zip(xs, y0, y1):
        if b < 0 or a > h - 1:
            continue
        canvas[y_off + max(a, 0) : y_off + min(b, h - 1) + 1, x] = color


def save_all_check_plots(
    df: DataFrame,
    outfile: str,
    *,
    time_col: str,
    vars: list[str] | None = None,
    suffix: str = DEFAULT_SUFFIX,
    width_px: int = 2000,
    per_var_px: int = 500,
    n_buckets: int | None = None,
) -> str:
    """Render every QC variable's raw/clean check panel into one PNG.

    Mirrors ``qc_save_all_plots_png``: variables auto-discovered from
    the flag-column suffix (``R/qc_plots.R:140-147``), one stacked
    panel pair per variable (raw band with flagged overlay above, clean
    band below), the >30,000 px height warning, and the written path
    returned.  Sizing is in pixels rather than inches×dpi — the product
    is what the guard tests either way.
    """
    import numpy as np

    vars = vars or qc_vars(df, suffix)
    if not vars:
        raise ValueError(f"no QC variables found (looked for '*{suffix}')")
    n_buckets = n_buckets or width_px
    height_px = max(1, len(vars)) * per_var_px
    if height_px > MAX_HEIGHT_PX:
        warnings.warn(
            f"Output will be {height_px} px tall; some viewers may struggle."
            " Lower per_var_px or split into chunks."
        )

    # one shared time extent scan, then one aggregation per variable
    lo, hi = df.agg(
        F.min(F.col(time_col).cast("double")),
        F.max(F.col(time_col).cast("double")),
    ).collect()[0]
    if lo is None:
        raise ValueError(f"cannot render: {time_col!r} is all NULL")

    canvas = np.full((height_px, width_px, 3), _BG, dtype=np.uint8)
    half = per_var_px // 2
    for i, var in enumerate(vars):
        pdf = panel_downsample(
            df, var, time_col, suffix=suffix, n_buckets=n_buckets,
            t0=lo, t1=hi,
        ).toPandas()
        top = i * per_var_px
        # panel separators
        canvas[top, :] = _AXIS
        canvas[top + half, :] = _AXIS
        # raw band + flagged overlay (upper half, one shared axis),
        # clean band (lower half, its own axis)
        raw_scale = _axis_scale(pdf, "raw_min", "raw_max")
        if raw_scale:
            _rasterize_panel(canvas, top + 1, half - 2, pdf,
                             "raw_min", "raw_max", _RAW, n_buckets, raw_scale)
            _rasterize_panel(canvas, top + 1, half - 2, pdf,
                             "flag_min", "flag_max", _FLAGGED, n_buckets,
                             raw_scale)
        clean_scale = _axis_scale(pdf, "clean_min", "clean_max")
        if clean_scale:
            _rasterize_panel(canvas, top + half + 1, half - 2, pdf,
                             "clean_min", "clean_max", _CLEAN, n_buckets,
                             clean_scale)

    os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
    _write_png(outfile, canvas)
    return outfile


def png_size(path: str) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — for report assertions."""
    with open(path, "rb") as fh:
        head = fh.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"{path} is not a PNG")
    w, h = struct.unpack(">II", head[16:24])
    return int(w), int(h)
