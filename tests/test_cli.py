"""CLI + PNG-sink tests (SURVEY.md §2 A4/A5, §3.1 lifecycle): the
shadems-equivalent surface must go axis-spec -> selection -> two-job
raster -> shaded PNG, deterministically."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from shadems_spark import cli
from shadems_spark.render import lut, raster_to_rgba, write_png


def _png_size(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    return w, h, data


def _decode_png(data: bytes) -> np.ndarray:
    """Decode our own filter-0 RGBA PNGs back to an array."""
    w, h = struct.unpack(">II", data[16:24])
    idat_len = struct.unpack(">I", data[33:37])[0]
    raw = zlib.decompress(data[41 : 41 + idat_len])
    stride = 1 + 4 * w
    rows = [raw[y * stride + 1 : (y + 1) * stride] for y in range(h)]
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, 4)


def test_write_png_roundtrip(tmp_path):
    rgba = np.zeros((4, 3, 4), dtype=np.uint8)
    rgba[1, 2] = (10, 20, 30, 255)
    p = str(tmp_path / "t.png")
    write_png(p, rgba)
    w, h, data = _png_size(p)
    assert (w, h) == (3, 4)
    # decode IDAT and undo the filter-0 scanlines
    idat_len = struct.unpack(">I", data[33:37])[0]
    raw = zlib.decompress(data[41 : 41 + idat_len])
    rows = [raw[y * (1 + 3 * 4) + 1 : (y + 1) * (1 + 3 * 4)] for y in range(4)]
    decoded = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(4, 3, 4)
    assert (decoded == rgba).all()


def test_lut_endpoints():
    t = lut("grey")
    assert t.shape == (256, 3)
    assert (t[0] == [0, 0, 0]).all() and (t[255] == [255, 255, 255]).all()


def test_raster_orientation():
    """by=0 must land on the BOTTOM scanline (y axis points up)."""
    rows = [{"bx": 0, "by": 0, "shade": 1.0}]
    img = raster_to_rgba(rows, width=2, height=3, cmap="grey")
    assert img[2, 0, 3] == 255 and img[0, 0, 3] == 0


def test_cli_end_to_end(tmp_path, spark, sf_dir):
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "DATA:amp",
            "--xcanvas", "64", "--ycanvas", "48",
            "--dir", str(tmp_path), "--png", "{ms}_{xname}_{yname}.png",
        ],
        spark=spark,
    )
    assert len(paths) == 1 and paths[0].endswith("sf0.001_time_DATA_amp.png")
    w, h, _ = _png_size(paths[0])
    assert (w, h) == (64, 48)


def test_cli_deterministic(tmp_path, spark, sf_dir):
    argv = [
        sf_dir, "-x", "time", "-y", "amp",
        "--xcanvas", "32", "--ycanvas", "32", "--norm", "log",
        "--dir", str(tmp_path),
    ]
    p1 = cli.run(argv + ["--png", "a.png"], spark=spark)[0]
    p2 = cli.run(argv + ["--png", "b.png"], spark=spark)[0]
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_cli_facets(tmp_path, spark, sf_dir):
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "DATA:phase", "--iter-field",
            "--xcanvas", "32", "--ycanvas", "32",
            "--dir", str(tmp_path), "--png", "f{field}.png",
        ],
        spark=spark,
    )
    assert len(paths) >= 2  # one PNG per field_label present at this sf
    for p in paths:
        assert _png_size(p)[:2] == (32, 32)


def test_cli_chan_axis(tmp_path, spark, sf_dir):
    """Channel-shaped axes attach the broadcast spectral-window dim;
    --chan slices it (row x chan outer product, F5)."""
    paths = cli.run(
        [
            sf_dir, "-x", "uvwave", "-y", "amp",
            "--nchan", "8", "--chan", "0:8:2",
            "--xcanvas", "32", "--ycanvas", "32",
            "--dir", str(tmp_path), "--png", "chan.png",
        ],
        spark=spark,
    )
    assert _png_size(paths[0])[:2] == (32, 32)


def test_cli_agg_axis_clip(tmp_path, spark, sf_dir):
    """--ared mean over --aaxis with --amin/--amax clipping (F7)."""
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp",
            "--ared", "mean", "-a", "DATA:real",
            "--amin", "0", "--amax", "50000",
            "--xcanvas", "32", "--ycanvas", "32",
            "--dir", str(tmp_path), "--png", "agg.png",
        ],
        spark=spark,
    )
    assert _png_size(paths[0])[:2] == (32, 32)


def test_cli_iter_corr(tmp_path, spark, sf_dir):
    """--iter corr facets on the correlation label (A/N/R)."""
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp", "--iter", "corr",
            "--xcanvas", "16", "--ycanvas", "16",
            "--dir", str(tmp_path), "--png", "c{group}.png",
        ],
        spark=spark,
    )
    assert len(paths) >= 2
    assert all("c_" in p for p in paths)


def test_cli_uv_mirror_with_colour_and_agg(tmp_path, spark, sf_dir):
    """'-x u -y v' conjugate-mirrors the coverage; the union must keep
    the --colour-by and --ared/--aaxis columns (ADVICE r01: the mirror
    used to drop them -> AnalysisException)."""
    paths = cli.run(
        [
            sf_dir, "-x", "u", "-y", "v", "-C", "corr_label",
            "--ared", "mean", "-a", "DATA:amp",
            "--xcanvas", "24", "--ycanvas", "24",
            "--dir", str(tmp_path), "--png", "uv.png",
        ],
        spark=spark,
    )
    assert _png_size(paths[0])[:2] == (24, 24)


def test_cli_uv_mirror_faceted(tmp_path, spark, sf_dir):
    """The mirror must also carry the --iter facet key."""
    paths = cli.run(
        [
            sf_dir, "-x", "u", "-y", "v", "--iter", "field",
            "--xcanvas", "16", "--ycanvas", "16",
            "--dir", str(tmp_path), "--png", "uvf{group}.png",
        ],
        spark=spark,
    )
    assert len(paths) >= 2


def test_cli_iter_scan_spw_baseline(tmp_path, spark, sf_dir):
    """[R] main.py --iter-scan/-spw/-baseline parity: each facet axis
    yields one PNG per group from ONE raster plan."""
    for facet, at_least in (("scan", 2), ("spw", 2), ("baseline", 2)):
        paths = cli.run(
            [
                sf_dir, "-x", "time", "-y", "amp", "--iter", facet,
                "--xcanvas", "8", "--ycanvas", "8",
                "--dir", str(tmp_path), "--png", facet + "{group}.png",
            ],
            spark=spark,
        )
        assert len(paths) >= at_least, facet


def test_cli_row_chunk_size_is_rows_per_chunk(tmp_path, spark, sf_dir):
    """-z means rows PER CHUNK: a huge -z on a tiny table must yield
    ONE partition, not -z partitions (ADVICE r01)."""
    assert cli._chunk_partitions(6000, 100000) == 1
    assert cli._chunk_partitions(6000, 1000) == 6
    assert cli._chunk_partitions(6001, 1000) == 7
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp", "-z", "100000",
            "--xcanvas", "8", "--ycanvas", "8",
            "--dir", str(tmp_path), "--png", "z.png",
        ],
        spark=spark,
    )
    assert _png_size(paths[0])[:2] == (8, 8)


def test_spread_neighborhood_max(spark):
    """tf.spread semantics on the binned table: one occupied pixel
    paints its (2px+1)² neighbourhood, clipped to the canvas, max on
    overlap."""
    from shadems_spark.render import dynspread, spread

    binned = spark.createDataFrame(
        [(0, 0, 9), (5, 5, 4)], "bx int, by int, val long"
    )
    out = {(r["bx"], r["by"]): r["val"] for r in spread(binned, 1, 8, 8).collect()}
    # corner pixel clips to 4 cells; interior paints 9
    assert len(out) == 4 + 9
    assert out[(0, 0)] == 9 and out[(1, 1)] == 9
    assert out[(4, 4)] == 4 and out[(6, 6)] == 4
    assert (7, 7) not in out
    # dynspread: two isolated points -> spreads; a dense block -> no-op
    dyn = {(r["bx"], r["by"]) for r in dynspread(binned, 8, 8, max_px=2).collect()}
    assert len(dyn) > 2
    dense = spark.createDataFrame(
        [(x, y, 1) for x in range(4) for y in range(4)], "bx int, by int, val long"
    )
    assert dynspread(dense, 8, 8).count() == 16


def test_cli_spread_golden_pixels(tmp_path, spark, sf_dir):
    """--spread 1 must strictly grow the set of painted pixels of the
    same plot, and identical argv stays deterministic."""
    base_argv = [
        sf_dir, "-x", "time", "-y", "amp",
        "--xcanvas", "48", "--ycanvas", "48", "--norm", "linear",
        "--bgcol", "none",  # alpha marks occupancy for this test
        "--dir", str(tmp_path),
    ]
    p0 = cli.run(base_argv + ["--png", "nospread.png"], spark=spark)[0]
    p1 = cli.run(base_argv + ["--spread", "1", "--png", "spread.png"], spark=spark)[0]

    def painted(path):
        _, _, data = _png_size(path)
        idat_len = struct.unpack(">I", data[33:37])[0]
        raw = zlib.decompress(data[41 : 41 + idat_len])
        px = np.frombuffer(
            b"".join(
                raw[y * (1 + 48 * 4) + 1 : (y + 1) * (1 + 48 * 4)] for y in range(48)
            ),
            dtype=np.uint8,
        ).reshape(48, 48, 4)
        return {(x, y) for y in range(48) for x in range(48) if px[y, x, 3] > 0}

    a, b = painted(p0), painted(p1)
    assert a and a < b  # strict superset: neighbourhoods painted
    p2 = cli.run(base_argv + ["--spread", "1", "--png", "spread2.png"], spark=spark)[0]
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_cli_dynspread_and_cmaps(tmp_path, spark, sf_dir):
    """--dynspread end-to-end plus a couple of the new LUT names."""
    for cmap in ("inferno", "coolwarm"):
        paths = cli.run(
            [
                sf_dir, "-x", "u", "-y", "v", "--dynspread", "--cmap", cmap,
                "--xcanvas", "24", "--ycanvas", "24",
                "--dir", str(tmp_path), "--png", f"d_{cmap}.png",
            ],
            spark=spark,
        )
        assert _png_size(paths[0])[:2] == (24, 24)


def test_cli_categorical(tmp_path, spark, sf_dir):
    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp", "-C", "corr_label",
            "--xcanvas", "32", "--ycanvas", "32",
            "--dir", str(tmp_path), "--png", "cat.png",
        ],
        spark=spark,
    )
    w, h, _ = _png_size(paths[0])
    assert (w, h) == (32, 32)


def test_cli_bgcol_composes_background(tmp_path, spark, sf_dir):
    """--bgcol paints unoccupied pixels opaque ([R] --bgcol, default
    white): with a black background every pixel is opaque, and both
    occupied and background pixels exist."""
    import zlib

    import numpy as np

    path = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp", "--bgcol", "black",
            "--cmap", "viridis", "--xcanvas", "24", "--ycanvas", "24",
            "--dir", str(tmp_path), "--png", "bg.png",
        ],
        spark=spark,
    )[0]
    raw = open(path, "rb").read()
    idat = raw[raw.index(b"IDAT") + 4 : raw.rindex(b"IEND") - 4]
    px = zlib.decompress(idat)
    rows = [px[y * (24 * 4 + 1) + 1 : (y + 1) * (24 * 4 + 1)] for y in range(24)]
    img = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(24, 24, 4)
    assert (img[:, :, 3] == 255).all()  # fully opaque canvas
    black = (img[:, :, :3] == 0).all(axis=2)
    assert black.any() and (~black).any()  # background + data pixels


def test_figure_compose_layout():
    """compose_figure: deterministic geometry — margins around the
    raster, axes box drawn, ticks on both axes, colorbar strip on the
    right.  Pure-numpy, no Spark."""
    import numpy as np

    from shadems_spark import figure as FIG

    raster = np.zeros((40, 60, 4), dtype=np.uint8)
    raster[10:20, 10:30] = (255, 0, 0, 255)
    fig = FIG.compose_figure(
        raster, (0.0, 120.0), (-5.0, 5.0),
        title="TEST", xlabel="time", ylabel="amp", cmap="viridis",
    )
    H = FIG.M_TOP + 40 + FIG.M_BOTTOM
    W = FIG.M_LEFT + 60 + FIG.M_RIGHT
    assert fig.shape == (H, W, 4)
    # axes box edges are black
    assert (fig[FIG.M_TOP - 1, FIG.M_LEFT - 1 : FIG.M_LEFT + 61, :3] == 0).all()
    # raster panel composited in place
    assert tuple(fig[FIG.M_TOP + 15, FIG.M_LEFT + 15, :3]) == (255, 0, 0)
    # colorbar strip present (non-background column right of panel)
    bar = fig[FIG.M_TOP : FIG.M_TOP + 40, FIG.M_LEFT + 60 + 14, :3]
    assert len({tuple(c) for c in bar}) > 10  # gradient, not flat


def test_figure_ticks_and_text():
    """nice_ticks covers the range at sane steps; glyph rendering
    marks pixels for every supported character class."""
    import numpy as np

    from shadems_spark import figure as FIG

    ts = FIG.nice_ticks(0.0, 120.0)
    assert ts[0] >= 0.0 and ts[-1] <= 120.0 and 3 <= len(ts) <= 7
    ts2 = FIG.nice_ticks(-0.037, 0.051)
    assert all(-0.037 <= t <= 0.051 for t in ts2) and len(ts2) >= 3

    img = np.zeros((20, 400, 4), dtype=np.uint8)
    s = "AMP 0.5e-3 (42%) time_day:XY/Z"
    FIG.draw_text(img, 1, 1, s)
    assert int((img[:, :, 3] == 255).sum()) > 12 * len(s.replace(" ", ""))


def test_cli_figure_golden_layout(tmp_path, spark, sf_dir):
    """--figure: labeled figure output — canvas + margins sized, and
    byte-identical across runs (golden determinism, VERDICT r03 #3)."""
    from shadems_spark import figure as FIG

    argv = [
        sf_dir, "-x", "time", "-y", "amp",
        "--xcanvas", "64", "--ycanvas", "48", "--figure",
        "--dir", str(tmp_path),
    ]
    p1 = cli.run(argv + ["--png", "fa.png"], spark=spark)[0]
    p2 = cli.run(argv + ["--png", "fb.png"], spark=spark)[0]
    w, h, _ = _png_size(p1)
    assert (w, h) == (64 + FIG.M_LEFT + FIG.M_RIGHT, 48 + FIG.M_TOP + FIG.M_BOTTOM)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_cli_figure_legend_categorical(tmp_path, spark, sf_dir):
    """--figure with --colour-by renders the category legend sidebar
    (palette swatch pixels present right of the panel)."""
    import numpy as np

    from shadems_spark import figure as FIG
    from shadems_spark.render import PALETTE

    paths = cli.run(
        [
            sf_dir, "-x", "time", "-y", "amp", "-C", "corr_label",
            "--xcanvas", "48", "--ycanvas", "48", "--figure",
            "--dir", str(tmp_path), "--png", "leg.png",
        ],
        spark=spark,
    )
    data = open(paths[0], "rb").read()
    img = _decode_png(data)
    sx = FIG.M_LEFT + 48 + 14
    swatch = tuple(img[FIG.M_TOP + 2, sx + 2, :3])
    assert swatch in {tuple(c) for c in PALETTE}


def test_pipeline_cli_end_to_end(spark, sf_dir, tmp_path):
    """The curation-pipeline CLI: curated parquet partitioned by
    split + a JSON-able report; semantic dedup route exercises the
    semdedup join."""
    import os

    from shadems_spark.pipeline import run

    out = str(tmp_path / "curated")
    rep = run([sf_dir, out, "--dedup", "exact", "--pack", "512"])
    assert rep["curated_docs"] <= rep["input_docs"]
    assert set(rep["splits"]) == {"train", "val", "test"}
    assert rep["train_sequences"] > 0
    assert sorted(d for d in os.listdir(out) if d.startswith("split=")) == [
        "split=test", "split=train", "split=val"
    ]
    rep2 = run([sf_dir, str(tmp_path / "c2"), "--dedup", "semantic"])
    assert rep2["curated_docs"] < rep["input_docs"]  # semdedup prunes


def test_pipeline_audit_mode(spark, tmp_path):
    """--audit reports rule-by-rule rejection counts and writes
    nothing: a planted symbol-soup doc trips the symbol and alpha
    rules."""
    import os

    from pyspark.sql import Row

    from shadems_spark.pipeline import run

    d = str(tmp_path)
    rows = [
        Row(doc_id=0, text="a perfectly ordinary document with enough words here",
            lang="en", source="s", n_chars=52),
        Row(doc_id=1, text="$$$ %%% ^^^ &&& *** $$$ %%% ^^^",
            lang="en", source="s", n_chars=31),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    out = str(tmp_path / "never_written")
    rep = run([d, out, "--audit"])["audit"]
    assert rep["n_docs"] == 2
    assert rep["rejected_any"] == 1 and rep["alpha"] == 1
    assert not os.path.exists(out)


def test_lut_reversed_variants_and_r5_tail():
    """Every palette must expose its matplotlib-style _r reversed
    twin, and the r5 colorcet tail must resolve."""
    import numpy as np

    from shadems_spark.render import _CMAPS

    t = lut("viridis")
    tr = lut("viridis_r")
    assert (tr == t[::-1]).all()
    for name in ("kgy", "kb", "kg", "kr", "dimgray", "cwr", "gwv", "bky", "bjy"):
        assert lut(name).shape == (256, 3)
        assert lut(name + "_r").shape == (256, 3)
    assert len(_CMAPS) >= 33


def test_cli_multiplot_grid_one_scan(tmp_path, spark, sf_dir):
    """[R] main.py multi-plot loop (VERDICT r5 #5): comma-separated
    -x/-y specs render every combination in ONE run, and the grid's
    raster plan scans the parquet source exactly once."""
    from pyspark.sql import functions as F

    from shadems_spark.catalog import load_table
    from shadems_spark.operators import mappers as M
    from shadems_spark.operators import raster as R
    from shadems_spark.operators import selection as S
    from shadems_spark.vis import vis_view

    paths = cli.run(
        [
            sf_dir, "-x", "time,uvdist", "-y", "amp,phase",
            "--xcanvas", "16", "--ycanvas", "16",
            "--dir", str(tmp_path), "--png", "{xname}_{yname}.png",
        ],
        spark=spark,
    )
    assert len(paths) == 4
    names = {p.rsplit("/", 1)[-1] for p in paths}
    assert names == {
        "time_amp.png", "time_phase.png",
        "uvdist_amp.png", "uvdist_phase.png",
    }
    for p in paths:
        assert _png_size(p)[:2] == (16, 16)

    # single-scan pin on the grid raster plan itself
    df = S.apply_flags(vis_view(load_table(spark, sf_dir, "lineitem")))
    combos = [
        (M.parse_axis("time"), M.parse_axis("DATA:amp"), False),
        (M.parse_axis("time"), M.parse_axis("DATA:phase"), False),
        (M.parse_axis("uvdist"), M.parse_axis("DATA:amp"), False),
        (M.parse_axis("uvdist"), M.parse_axis("DATA:phase"), False),
    ]
    binned, ranges = R.grid_raster(df, combos, 16, 16)
    assert len(ranges) == 4
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_cli_multiplot_col_list_dedup(tmp_path, spark, sf_dir):
    """--col lists multiply only the combos whose axes read the
    column; col-independent axis pairs collapse (axis-dedup)."""
    args = cli.build_parser().parse_args(
        [sf_dir, "-x", "time", "-y", "amp,uvdist", "--col", "DATA,MODEL_DATA"]
    )
    combos = cli._expand_combos(args)
    # (time, amp) x 2 cols + (time, uvdist) collapsed once
    assert len(combos) == 3


def test_cli_multiplot_with_colour_falls_back_per_combo(
    tmp_path, spark, sf_dir
):
    """Grid + --colour-by runs the full single-plot path per combo
    (colour discovery is per-plot state) — still every combination."""
    paths = cli.run(
        [
            sf_dir, "-x", "time,uvdist", "-y", "amp",
            "-C", "corr_label",
            "--xcanvas", "8", "--ycanvas", "8",
            "--dir", str(tmp_path), "--png", "{xname}_{yname}.png",
        ],
        spark=spark,
    )
    assert len(paths) == 2
