"""K7 plot sinks — the PNGs are decoded back with the repo's OWN
decode_png and checked pixel-for-pixel against the Spark-computed binned
aggregates, so the renderer is pinned to the engine's numbers, not
eyeballed. Reference: results.py:618-700 (corner/hist/trace),
:850-1010 (OS plots)."""

import os

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.codecs import decode_png
from enterprise_warp_spark.plotting import (
    BLUE,
    MARGIN_B,
    MARGIN_L,
    MARGIN_R,
    MARGIN_T,
    RED,
    SUB_H,
    SUB_W,
    Canvas,
    bar_geometry,
    make_chain_trace_grid,
    make_corner_plot,
    make_histogram_grid,
    make_noisemarg_os_plots,
    make_os_orf_plot,
    pair_histograms_2d,
    thinned_traces,
    tile_grid,
)


@pytest.fixture(scope="module")
def chains_long(spark):
    """3-parameter synthetic chain with known values, long form."""
    rng = np.random.default_rng(7)
    n = 600
    data = {
        "p_alpha": rng.normal(0.0, 1.0, n),
        "p_beta": rng.uniform(2.0, 5.0, n),
        "p_gamma": rng.normal(-3.0, 0.5, n),
    }
    rows = [
        ("run0", int(s), p, float(v))
        for p, vs in data.items()
        for s, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "run_id string, step int, par string, value double"
    )
    return df, data


def test_canvas_roundtrip(tmp_path):
    cv = Canvas(40, 30)
    cv.fill_rect(5, 5, 10, 10, BLUE)
    cv.line(0, 0, 39, 29, RED)
    cv.text(2, 20, "A1_")
    p = cv.save(str(tmp_path / "c.png"))
    img = decode_png(open(p, "rb").read())
    assert img.shape == (30, 40, 3)
    assert tuple(img[7, 7]) == BLUE
    assert tuple(img[0, 0]) == RED
    # '_' glyph bottom row: 5 dark pixels at y=26, x=14..18
    assert (img[26, 14:19] == 0).all()


def test_grouped_histogram_matches_numpy(spark, chains_long):
    from enterprise_warp_spark.operators.binning import grouped_histogram

    df, data = chains_long
    out = grouped_histogram(df, ["run_id", "par"], "value", bins=50).collect()
    for par, vals in data.items():
        rows = [r for r in out if r["par"] == par]
        lo, hi = vals.min(), vals.max()
        assert np.isclose(rows[0]["lo"], lo) and np.isclose(rows[0]["hi"], hi)
        edges = np.linspace(lo, hi, 51)
        expect, _ = np.histogram(vals, bins=edges)
        got = np.zeros(50, dtype=int)
        for r in rows:
            got[int(r["bucket"])] = r["cnt"]
        assert got.sum() == len(vals)
        assert (got == expect).all(), par


def test_histogram_grid_pixels_match_counts(tmp_path, spark, chains_long):
    """Bar pixel heights in the PNG == bar_geometry of the Spark counts."""
    df, data = chains_long
    p = make_histogram_grid(df, str(tmp_path / "h.png"), bins=50)
    img = decode_png(open(p, "rb").read())
    xt, yt = tile_grid(3)
    assert img.shape == (xt * SUB_H, yt * SUB_W, 3)
    pars = sorted(data)
    for k, par in enumerate(pars):
        vals = data[par]
        lo, hi = vals.min(), vals.max()
        counts, _ = np.histogram(vals, bins=np.linspace(lo, hi, 51))
        ox, oy = (k % yt) * SUB_W, (k // yt) * SUB_H
        px0, py1 = ox + MARGIN_L, oy + SUB_H - MARGIN_B
        pw = SUB_W - MARGIN_L - MARGIN_R - 1
        ph = SUB_H - MARGIN_T - MARGIN_B - 1
        for xl, xr, hpx in bar_geometry(pw, ph, counts):
            col = px0 + 1 + xl
            blue = (img[oy : oy + SUB_H, col] == BLUE).all(axis=1)
            assert int(blue.sum()) == hpx, (par, xl, hpx, int(blue.sum()))


def test_pair_histograms_2d_matches_numpy(spark, chains_long):
    df, data = chains_long
    pars = sorted(data)
    counts, edges = pair_histograms_2d(df, pars, bins=30)
    rows = counts.collect()
    a, b = pars[0], pars[1]
    got = np.zeros((30, 30), dtype=int)
    for r in rows:
        if r["pair"] == f"{a}|{b}":
            got[int(r["bx"]), int(r["by"])] = r["cnt"]
    lo_a, hi_a = edges[a]
    lo_b, hi_b = edges[b]
    expect, _, _ = np.histogram2d(
        data[a], data[b],
        bins=[np.linspace(lo_a, hi_a, 31), np.linspace(lo_b, hi_b, 31)],
    )
    assert (got == expect.astype(int)).all()
    assert got.sum() == len(data[a])


def test_thinned_traces_stride(spark, chains_long):
    df, _ = chains_long  # 600 steps, max_points 200 -> stride 3
    rows = thinned_traces(df, max_points=200).collect()
    steps = sorted({r["step"] for r in rows})
    assert steps == list(range(0, 600, 3))


def test_trace_grid_renders(tmp_path, spark, chains_long):
    df, data = chains_long
    p = make_chain_trace_grid(df, str(tmp_path / "t.png"))
    img = decode_png(open(p, "rb").read())
    xt, yt = tile_grid(3)
    assert img.shape == (xt * SUB_H, yt * SUB_W, 3)
    # some trace ink (blue) inside the first panel's plot area
    panel = img[MARGIN_T : SUB_H - MARGIN_B, MARGIN_L : SUB_W - MARGIN_R]
    assert ((panel == BLUE).all(axis=2)).sum() > 50


def test_corner_plot_heatmap_and_truths(tmp_path, spark, chains_long):
    df, data = chains_long
    pars = sorted(data)
    truths = {pars[0]: float(np.median(data[pars[0]]))}
    p = make_corner_plot(df, pars, str(tmp_path / "c.png"), bins=30,
                         truths=truths)
    img = decode_png(open(p, "rb").read())
    cell, gap = 130, 4
    size = 3 * (cell + gap) + gap + 40
    assert img.shape == (size, size, 3)
    # densest 2D cell of pair (p0, p1) renders as the darkest gray patch
    a, b = pars[0], pars[1]
    h2, xe, ye = np.histogram2d(
        data[a], data[b],
        bins=[np.linspace(data[a].min(), data[a].max(), 31),
              np.linspace(data[b].min(), data[b].max(), 31)],
    )
    # off-diagonal panel (i=1 row, j=0 col) — x axis is pars[0] (bx),
    # y axis is pars[1] (by)
    ox = gap + 36 + 0 * (cell + gap)
    oy = gap + 1 * (cell + gap)
    bx, by = np.unravel_index(np.argmax(h2), h2.shape)
    expected_shade = 255 - int(np.rint(h2[bx, by] / h2.max() * 220))
    px = cell - 2
    xl = int(np.floor(bx * px / 30))
    yl = int(np.floor(by * px / 30))
    sample = img[oy + cell - 2 - yl, ox + 1 + xl]
    assert tuple(sample) == (expected_shade,) * 3
    # truth line: a full-height red column in the (0,0) diagonal panel
    dx0, dy0 = gap + 36, gap
    red_cols = ((img[dy0 + 1 : dy0 + cell - 1, dx0 : dx0 + cell] == RED)
                .all(axis=2).sum(axis=0))
    assert red_cols.max() >= cell - 4


def test_corner_plot_model_mask(tmp_path, spark):
    """nmodel-masked corner (reference model_mask): only model-1 samples
    are counted when model=1."""
    rows = []
    for s in range(200):
        m = float(s % 2)
        rows += [("r", s, "nmodel", m), ("r", s, "x", float(s)),
                 ("r", s, "y", float(-s if m else s))]
    df = spark.createDataFrame(
        rows, "run_id string, step int, par string, value double"
    )
    counts, _ = pair_histograms_2d(df, ["nmodel", "x", "y"], bins=10, model=1.0)
    total = sum(r["cnt"] for r in counts.collect() if r["pair"] == "x|y")
    assert total == 100


def test_os_plots_from_synthetic_frames(tmp_path, spark):
    """plot_os_orf + plot_noisemarg_os over hand-built OS frames."""
    binned = spark.createDataFrame(
        [(i + 1, 10, 0.3 * (i + 1), 0.05, 1e-30 * (4 - i), 2e-31)
         for i in range(8)],
        "bin int, n int, xi_mean double, xi_std double, wavg double, werr double",
    )
    osdf = spark.createDataFrame(
        [(3e-30, 1e-30)], "a2_hat double, sig_os double"
    )
    rng = np.random.default_rng(3)
    marg = spark.createDataFrame(
        [(int(i), float(v), 1e-30) for i, v in
         enumerate(rng.normal(3e-30, 1e-30, 200))],
        "draw_id int, a2_hat double, sig_os double",
    )
    res = {"hd": {"os": osdf, "binned": binned, "marginalised": marg}}
    p1 = make_os_orf_plot(res, str(tmp_path / "orf.png"))
    img = decode_png(open(p1, "rb").read())
    assert img.shape == (400, 650, 3)
    # the dashed hd curve leaves C3-red ink
    assert ((img == (214, 39, 40)).all(axis=2)).sum() > 30
    # errorbar ink (black) present
    assert ((img == 0).all(axis=2)).sum() > 50
    out = make_noisemarg_os_plots(
        res, str(tmp_path / "snr.png"), str(tmp_path / "a2.png")
    )
    assert len(out) == 2
    for p in out:
        img = decode_png(open(p, "rb").read())
        assert img.shape == (400, 650, 3)
        assert ((img == (214, 39, 40)).all(axis=2)).sum() > 30


def test_os_plot_no_marginalised_is_noop(tmp_path, spark):
    osdf = spark.createDataFrame([(1.0, 0.5)], "a2_hat double, sig_os double")
    binned = spark.createDataFrame(
        [(1, 5, 1.0, 0.1, 0.5, 0.2)],
        "bin int, n int, xi_mean double, xi_std double, wavg double, werr double",
    )
    res = {"hd": {"os": osdf, "binned": binned}}
    assert make_noisemarg_os_plots(
        res, str(tmp_path / "s.png"), str(tmp_path / "a.png")
    ) == []


def test_per_run_guard(tmp_path, spark):
    """Per-run plot functions refuse multi-run input loudly — each run has
    its own bin edges, so silent cross-run count merging would be wrong."""
    rows = [(rid, s, "x", float(s)) for rid in ("a", "b") for s in range(20)]
    df = spark.createDataFrame(
        rows, "run_id string, step int, par string, value double"
    )
    with pytest.raises(ValueError, match="ONE run"):
        make_histogram_grid(df, str(tmp_path / "h.png"))
    with pytest.raises(ValueError, match="ONE run"):
        make_chain_trace_grid(df, str(tmp_path / "t.png"))


def test_corner_par_count_guard(spark):
    rows = [("r", 0, f"p{i}", float(i)) for i in range(41)]
    df = spark.createDataFrame(
        rows, "run_id string, step int, par string, value double"
    )
    with pytest.raises(ValueError, match="explodes"):
        pair_histograms_2d(df, [f"p{i}" for i in range(41)])


def test_bar_geometry_properties():
    """Geometry invariants under arbitrary counts (hypothesis): bars tile
    the plot width without overlap, heights stay in [0, ph-1], the max
    count always reaches full height, zeros stay at zero."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=80),
        st.integers(min_value=2, max_value=400),
        st.integers(min_value=2, max_value=300),
    )
    def check(counts, pw, ph):
        geo = bar_geometry(pw, ph, counts)
        assert len(geo) == len(counts)
        prev_end = -1
        for (xl, xr, hpx), c in zip(geo, counts):
            assert 0 <= xl <= xr < pw
            if pw >= len(counts):  # >=1 px per bin: bars tile, no overlap
                assert xl > prev_end
            prev_end = xr
            assert 0 <= hpx <= ph - 1
            if c == 0:
                assert hpx == 0
        if max(counts) > 0:
            assert max(h for _, _, h in geo) == ph - 1

    check()
