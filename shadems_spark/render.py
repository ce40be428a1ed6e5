"""PNG sink — the thin driver-side renderer (SURVEY.md §2 A4).

The engine's raster result is the *binned table* (≤ W·H·ncat rows by
construction); shadeMS hands the equivalent xarray raster to
``datashader.transfer_functions.shade`` + matplotlib ([R]
shade_ms/data_plots.py::create_plot tail ≈L300-420).  Here shading
(normalization) runs engine-side (operators/normalize.py window fns),
and this module only colorizes the collected pixels and writes a PNG
with the stdlib (zlib/struct) — no matplotlib/datashader dependency,
so the sink works in any executor-less driver environment.

Scale note: collect() here is safe at any input scale because the
binned table's size is bounded by the canvas, not the data.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from pyspark.sql import DataFrame

from shadems_spark.operators.normalize import eq_hist, norm

#: colormap name -> anchor colors (linear-interpolated, 256-entry LUT).
#: 'fire'/'bgy'/'grey' follow the colorcet families shadeMS exposes
#: via --cmap; anchors are coarse public approximations, not copies.
_CMAPS: dict[str, list[tuple[int, int, int]]] = {
    "grey": [(0, 0, 0), (255, 255, 255)],
    "fire": [(0, 0, 0), (120, 0, 0), (230, 110, 0), (255, 235, 160), (255, 255, 255)],
    "bgy": [(0, 0, 90), (0, 110, 160), (60, 200, 110), (250, 250, 80)],
    "viridis": [(68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98), (253, 231, 37)],
}

#: categorical palette (--colour-by): distinct hues, cycled.
PALETTE = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207), (174, 199, 232), (255, 187, 120),
    (152, 223, 138), (255, 152, 150), (197, 176, 213), (196, 156, 148),
]


def lut(cmap: str) -> np.ndarray:
    """256x3 uint8 LUT from the anchor list."""
    anchors = np.array(_CMAPS[cmap], dtype=np.float64)
    pos = np.linspace(0.0, 1.0, len(anchors))
    xs = np.linspace(0.0, 1.0, 256)
    chans = [np.interp(xs, pos, anchors[:, i]) for i in range(3)]
    return np.stack(chans, axis=1).round().astype(np.uint8)


def shade(binned: DataFrame, how: str = "eq_hist", val: str = "val") -> DataFrame:
    """Engine-side normalization dispatch (W1/W2): shade ∈ [0,1]."""
    if how == "eq_hist":
        return eq_hist(binned, val=val)
    return norm(binned, how, val=val)


def raster_to_rgba(
    rows, width: int, height: int, cmap: str = "viridis", categories: list | None = None
) -> np.ndarray:
    """Collected shaded pixels -> H×W×4 RGBA (row 0 = top scanline).

    ``rows`` carry (bx, by, shade[, cat]).  Continuous rasters map
    shade through the LUT; categorical rasters mix the palette colors
    of each pixel's categories weighted by their counts (the
    datashader count_cat color-mixing idea) with alpha from the
    pixel-total shade.
    """
    img = np.zeros((height, width, 4), dtype=np.uint8)
    table = lut(cmap)
    if categories is None:
        for r in rows:
            bx, by, s = int(r["bx"]), int(r["by"]), float(r["shade"])
            c = table[min(255, int(s * 255.0))]
            img[height - 1 - by, bx] = (c[0], c[1], c[2], 255)
        return img
    cat_idx = {c: i for i, c in enumerate(categories)}
    acc = np.zeros((height, width, 3), dtype=np.float64)
    wsum = np.zeros((height, width), dtype=np.float64)
    alpha = np.zeros((height, width), dtype=np.float64)
    for r in rows:
        bx, by = int(r["bx"]), int(r["by"])
        color = PALETTE[cat_idx[r["cat"]] % len(PALETTE)]
        n = float(r["val"])
        acc[height - 1 - by, bx] += np.array(color, dtype=np.float64) * n
        wsum[height - 1 - by, bx] += n
        alpha[height - 1 - by, bx] = max(alpha[height - 1 - by, bx], float(r["shade"]))
    mask = wsum > 0
    img[mask, :3] = (acc[mask] / wsum[mask, None]).round().astype(np.uint8)
    img[mask, 3] = (alpha[mask] * 255.0).round().astype(np.uint8)
    return img


def write_png(path: str, rgba: np.ndarray) -> None:
    """Minimal RGBA PNG encoder (stdlib zlib; filter type 0 rows)."""
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(payload)


def render_png(
    binned: DataFrame,
    path: str,
    width: int,
    height: int,
    how: str = "eq_hist",
    cmap: str = "viridis",
    categories: list | None = None,
) -> str:
    """Binned table -> shaded PNG file; returns the path."""
    shaded = shade(binned, how=how)
    rows = shaded.collect()
    img = raster_to_rgba(rows, width, height, cmap=cmap, categories=categories)
    write_png(path, img)
    return path
