"""Property-based pinning of the selection conventions (hypothesis).

The reference's selection semantics (fdf_signal.py:283-302) have two
easy-to-break conventions: scalar lookup keeps exactly the ONE nearest
sample (first argmin on ties), and range selection keeps
[argmin(|t-lo|), argmin(|t-hi|)) with the hi-nearest EXCLUDED. The
oracle queries pin them on fixed fixtures; here hypothesis sweeps
random non-uniform grids and query points against a literal numpy
transcription of the reference code.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fdf_spark.operators.selection import nearest_sample, positional_slice, value_window

AXES = st.lists(
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
    min_size=2,
    max_size=40,
    unique=True,
)
POINTS = st.floats(min_value=-150.0, max_value=150.0, allow_nan=False, width=32)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _np_nearest(t: np.ndarray, v: float) -> float:
    # fdf_signal.py:298-300: slice(i, i+1), i = argmin(|t - v|)
    return float(t[int(np.abs(t - v).argmin())])


def _np_window(t: np.ndarray, lo: float, hi: float) -> np.ndarray:
    # fdf_signal.py:296-297,301: [argmin(|t-lo|), argmin(|t-hi|))
    i0 = int(np.abs(t - lo).argmin())
    i1 = int(np.abs(t - hi).argmin())
    return t[i0:i1]


def _df(spark, t: np.ndarray):
    return spark.createDataFrame([(float(x), float(x) * 2) for x in t], "t double, v double")


@settings(**_SETTINGS)
@given(axis=AXES, v=POINTS)
def test_nearest_sample_matches_numpy(spark, axis, v):
    t = np.sort(np.asarray(axis, dtype=np.float64))
    out = nearest_sample(_df(spark, t), "t", v).collect()
    assert len(out) == 1
    assert out[0]["t"] == _np_nearest(t, v)


@settings(**_SETTINGS)
@given(axis=AXES, a=POINTS, b=POINTS)
def test_value_window_matches_numpy(spark, axis, a, b):
    lo, hi = (a, b) if a <= b else (b, a)
    t = np.sort(np.asarray(axis, dtype=np.float64))
    got = sorted(r["t"] for r in value_window(_df(spark, t), "t", lo, hi).collect())
    want = _np_window(t, lo, hi).tolist()
    assert got == want


_BOUND = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
_STEP = st.integers(min_value=-5, max_value=5).filter(lambda s: s != 0)


@settings(**_SETTINGS)
@given(axis=AXES, start=_BOUND, stop=_BOUND, step=_STEP)
def test_positional_slice_matches_numpy(spark, axis, start, stop, step):
    """Full Python slice surface — negative bounds, negative steps, None
    bounds — matches numpy exactly, including output order via __sel."""
    t = np.sort(np.asarray(axis, dtype=np.float64))
    rows = positional_slice(_df(spark, t), ["t"], start, stop, step).collect()
    got = [r["t"] for r in sorted(rows, key=lambda r: r["__sel"])]
    want = t[start:stop:step].tolist()
    assert got == want


@settings(**_SETTINGS)
@given(
    axis=AXES,
    positions=st.lists(st.integers(min_value=-60, max_value=60), min_size=0, max_size=8),
)
def test_positional_take_matches_numpy(spark, axis, positions):
    """Fancy int-array indexing matches numpy's take for in-range
    positions (out-of-range are dropped, not raised — documented)."""
    from fdf_spark.operators.selection import positional_take

    t = np.sort(np.asarray(axis, dtype=np.float64))
    n = len(t)
    in_range = [p for p in positions if -n <= p < n]
    rows = positional_take(_df(spark, t), ["t"], positions).collect()
    got = [r["t"] for r in sorted(rows, key=lambda r: r["__sel"])]
    want = t[in_range].tolist() if in_range else []
    assert got == want


@settings(**{**_SETTINGS, "max_examples": 8})
@given(
    axis=AXES,
    grid=st.lists(
        st.floats(min_value=-10.0, max_value=10.0, allow_nan=False), min_size=1, max_size=10
    ),
)
def test_resample_linear_matches_np_interp(spark, axis, grid):
    """Union+two-directional-windows interpolation == np.interp, including
    edge clamping and exact coordinate hits."""
    from fdf_spark.operators.resample import resample_linear

    t = np.sort(np.unique(np.asarray(axis, dtype=np.float64)))
    v = np.cos(t)  # deterministic values on the sample grid
    samples = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(t, v)], "t double, value double"
    )
    # include an exact hit so the tie path is always exercised
    gpts = sorted(set([float(g) for g in grid] + [float(t[0])]))
    gdf = spark.createDataFrame([(g,) for g in gpts], "t double")
    got = {
        r["t"]: r["value"]
        for r in resample_linear(samples, "t", gdf).collect()
    }
    want = np.interp(gpts, t, v)
    assert sorted(got) == gpts
    for g, w in zip(gpts, want):
        assert got[g] == pytest.approx(w, rel=1e-12, abs=1e-12)


# ---------------------------------------------------------------------------
# Connected components vs union-find reference
# ---------------------------------------------------------------------------

EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)),
    min_size=1,
    max_size=12,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component = min node id in the set
    comp = {}
    for n in nodes:
        r = find(n)
        comp[n] = min(m for m in nodes if find(m) == r)
    return comp


@given(edges=EDGES)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_components_match_union_find(spark, edges):
    """min-label propagation (operators/graph.py) == union-find on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from fdf_spark.operators.graph import connected_components

    nodes = sorted({n for e in edges for n in e})
    edf = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "id_a long, id_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(edf).collect()
    }
    assert got == _union_find(edges, nodes)


# --- gradient vs numpy.gradient ---------------------------------------------

from fdf_spark.operators.gradient import gradient  # noqa: E402

# non-uniform grid as bounded positive gaps (cumsum): spacing in
# [0.01, 5] keeps the comparison in the well-conditioned regime — at
# ulp-scale gaps the single-fraction window form and numpy's
# three-coefficient form diverge by cancellation, which is a property
# of float algebra, not of the operator
GAPS = st.lists(
    st.floats(min_value=0.015625, max_value=4.0, allow_nan=False, width=32),
    min_size=1,
    max_size=39,
)


@settings(**_SETTINGS)
@given(gaps=GAPS, t0=st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32))
def test_gradient_matches_numpy(spark, gaps, t0):
    """numpy.gradient parity on random non-uniform strictly-increasing
    grids (second-order interior, edge_order=1 one-sided edges)."""
    t = t0 + np.concatenate([[0.0], np.cumsum(np.asarray(gaps, dtype=np.float64))])
    f = 0.5 * t * t + np.cos(t)  # nonlinear, so 2nd-order accuracy matters
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(t, f)], "t double, v double"
    )
    got = {r["t"]: r["g"] for r in gradient(df, value="v", axis="t", by=(), out="g").collect()}
    want = np.gradient(f, t)
    assert len(got) == len(t)
    for x, w in zip(t, want):
        assert got[float(x)] == pytest.approx(float(w), rel=1e-9, abs=1e-12)


def test_gradient_degenerate_series(spark):
    """Single-sample series → NULL gradient (numpy raises; a distributed
    operator degrades per group), and tied axis values → NULL per-row
    instead of an ANSI DIVIDE_BY_ZERO job abort."""
    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("b", 2.0, 1.0), ("b", 2.0, 3.0), ("b", 4.0, 7.0)],
        "k string, t double, v double",
    )
    rows = gradient(df, value="v", axis="t", by=("k",), out="g").collect()
    a = [r for r in rows if r["k"] == "a"]
    assert len(a) == 1 and a[0]["g"] is None  # singleton series
    b_null = [r for r in rows if r["k"] == "b" and r["g"] is None]
    assert b_null, "tied axis values must yield NULL, not throw"


# --- dup_spans vs a literal python transcription ----------------------------

from fdf_spark.llm.spans import dup_spans  # noqa: E402

# tiny vocabulary so short random docs collide on n-grams
DOCS = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def _py_dup_spans(texts, n, min_count):
    from collections import Counter

    grams = Counter()
    per_doc = []
    for t in texts:
        w = t.split()
        g = [tuple(w[i : i + n]) for i in range(len(w) - n + 1)] if len(w) >= n else []
        per_doc.append(g)
        grams.update(g)
    out = {}
    for did, g in enumerate(per_doc):
        hits = [(i, i + n) for i, gram in enumerate(g) if grams[gram] >= min_count]
        spans = []
        for s, e in hits:  # hits are position-sorted; merge overlaps
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e)
                spans[-1][2] += 1
            else:
                spans.append([s, e, 1])
        if spans:
            out[did] = [tuple(x) for x in spans]
    return out


@settings(**_SETTINGS)
@given(texts=DOCS, n=st.integers(min_value=1, max_value=3))
def test_dup_spans_matches_python(spark, texts, n):
    """Random tiny-vocab corpora: global n-gram counting + interval
    merging must match a direct python transcription exactly."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in dup_spans(df, n=n, min_count=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_grams"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    want = _py_dup_spans(texts, n, 2)
    assert got == want


# ---------------------------------------------------------------------------
# round-5: Count-Min sketch (N20) and incremental view maintenance (N23)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from fdf_spark.llm.sketches import cm_estimate, cm_merge, countmin_sketch  # noqa: E402
from fdf_spark.operators.ivm import (  # noqa: E402
    agg_view,
    finish_view,
    incremental_refresh,
)

TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(tokens=TOKENS, width=st.sampled_from([2, 8, 64]))
def test_countmin_never_underestimates(spark, tokens, width):
    """The CM guarantee's hard direction: est >= exact for EVERY token,
    at any width — collisions only ever add. At width 64 with an
    8-token vocabulary, every estimate must also be exact unless two
    vocab words collide in all 4 hash rows."""
    from collections import Counter

    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    sk = countmin_sketch(df, width=width)
    probes = spark.createDataFrame([(t,) for t in set(tokens)], "token string")
    est = {r["token"]: r["est_cnt"] for r in cm_estimate(sk, probes, width=width).collect()}
    exact = Counter(tokens)
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)
    # total sketch mass per row equals the stream length (mergeability)
    per_row = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row.values()) == {len(tokens)}
    # explicit mergeability: sketch(front) ⊕ sketch(back) == sketch(all)
    cut = len(tokens) // 2
    front = countmin_sketch(
        spark.createDataFrame([(t,) for t in tokens[:cut]], "token string"), width=width
    )
    back = countmin_sketch(
        spark.createDataFrame([(t,) for t in tokens[cut:]], "token string"), width=width
    )
    merged = {
        (r["row"], r["bucket"]): r["cnt"] for r in cm_merge(front, back).collect()
    }
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert merged == whole


ROWS = st.lists(
    st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 1000)),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(base=ROWS, inserts=ROWS, delete_idx=st.sets(st.integers(0, 29)))
def test_incremental_refresh_equals_recompute(spark, base, inserts, delete_idx):
    """IVM's defining property on random bases/deltas: folding a signed
    delta into the view == rebuilding the view over the post-change
    base, including groups created by inserts and emptied by deletes."""
    deletes = [r for i, r in enumerate(base) if i in delete_idx]
    schema = "k string, v long"
    base_df = spark.createDataFrame(base, schema)
    view = agg_view(base_df, ["k"], "v")
    delta = spark.createDataFrame(
        [(k, v, 1) for k, v in inserts] + [(k, v, -1) for k, v in deletes],
        "k string, v long, sign int",
    )
    got = {
        r["k"]: (r["sum_val"], r["n_rows"])
        for r in finish_view(incremental_refresh(view, delta, ["k"], "v"), ["k"]).collect()
    }
    final = [r for i, r in enumerate(base) if i not in delete_idx] + inserts
    final_df = spark.createDataFrame(final, schema) if final else None
    want = (
        {
            r["k"]: (r["sum_val"], r["n_rows"])
            for r in finish_view(agg_view(final_df, ["k"], "v"), ["k"]).collect()
        }
        if final
        else {}
    )
    assert got == want


from fdf_spark.llm.sharding import assign_token_shards  # noqa: E402

SHARD_DOCS = st.lists(st.integers(0, 40), min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(tok_counts=SHARD_DOCS, n_shards=st.sampled_from([1, 3, 8]),
       bucket_docs=st.sampled_from([4, 4096]))
def test_shard_assignment_contiguous_and_balanced(spark, tok_counts, n_shards, bucket_docs):
    """Random token distributions: shards are contiguous in doc order,
    every shard is within one document of total/N tokens, and the
    hierarchical prefix sum is invariant to the bucketing width."""
    rows = [(i, " ".join(["w"] * c)) for i, c in enumerate(tok_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.tokens, r.shard)
        for r in assign_token_shards(docs, n_shards, bucket_docs=bucket_docs).collect()
    )
    # python reference: flat prefix sum, integer shard arithmetic
    total = sum(tok_counts)
    prefix = 0
    want = []
    for i, c in enumerate(tok_counts):
        s = min(n_shards - 1, prefix * n_shards // total) if total else 0
        want.append((i, c, s))
        prefix += c
    assert got == want
    # balance: every shard within one doc of ideal (ignoring empty corpus)
    if total:
        per = {}
        for _, c, s in got:
            per[s] = per.get(s, 0) + c
        for tok in per.values():
            assert tok <= total / n_shards + max(tok_counts)


from fdf_spark.llm.classifier import score_logreg, train_logreg  # noqa: E402

LOGREG_ROWS = st.lists(
    st.tuples(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=16),
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=16),
        st.booleans(),
    ),
    min_size=3,
    max_size=25,
)


def _py_round6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@settings(**{**_SETTINGS, "max_examples": 8})
@given(rows=LOGREG_ROWS, iters=st.integers(1, 3))
def test_train_logreg_matches_python(spark, rows, iters):
    """Distributed batch-GD == a literal python transcription of the
    rounding-pinned update rule on random feature matrices — weight for
    weight, at any partition count (the 6-dp pre-sum rounding + decimal
    accumulation is what makes the distributed sum order-independent)."""
    import math

    df = spark.createDataFrame(
        [(float(a), float(b), float(yv)) for a, b, yv in rows], "x0 double, x1 double, y double"
    ).repartition(3)
    w, bias = train_logreg(df, ["x0", "x1"], "y", iters=iters, lr=0.5)

    pw, pb = [0.0, 0.0], 0.0
    for _ in range(iters):
        g = [0.0, 0.0, 0.0]
        for a, b2, yv in rows:
            z = _py_round6(pb + pw[0] * a + pw[1] * b2)
            r = _py_round6(float(yv) - 1.0 / (1.0 + math.exp(-z)))
            g[0] += _py_round6(r * a)
            g[1] += _py_round6(r * b2)
            g[2] += r
        n = len(rows)
        # decimal-sum of 6-dp values is exact; python float sum of the
        # same values may drift — re-quantize the sums first
        g = [_py_round6(x) for x in g]
        pw = [_py_round6(wj + 0.5 * gj / n) for wj, gj in zip(pw, g[:2])]
        pb = _py_round6(pb + 0.5 * g[2] / n)
    assert w == pw and bias == pb
    # scoring parity on the same relation
    got = {
        (r["x0"], r["x1"]): r["p"]
        for r in score_logreg(df, ["x0", "x1"], w, bias).collect()
    }
    for a, b2, _ in rows:
        z = _py_round6(bias + w[0] * a + w[1] * b2)
        assert got[(a, b2)] == _py_round6(1.0 / (1.0 + math.exp(-z)))


# --- codec roundtrips as laws (imagecodecs / audiocodecs, N6) ---------------
# The fixed-seed tests in test_llm.py pin known shapes; here hypothesis
# sweeps arbitrary pixel/index/sample content. No Spark involved —
# the codecs are pure functions, so examples are cheap.


@given(
    data=st.binary(min_size=1, max_size=400),
    w=st.integers(min_value=1, max_value=20),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_law(data, w, ch, ft):
    from fdf_spark.llm.imagecodecs import decode_png_pixels, encode_png

    n = len(data) // (w * ch)
    if n == 0:
        return
    arr = np.frombuffer(data[: n * w * ch], np.uint8).reshape(n, w, ch)
    img = arr[:, :, 0] if ch == 1 else arr
    dec = decode_png_pixels(encode_png(img, filter_type=ft))
    assert (dec == arr).all()


@given(
    data=st.binary(min_size=1, max_size=600),
    w=st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_law(data, w):
    from fdf_spark.llm.imagecodecs import decode_gif_pixels, encode_gif

    n = len(data) // w
    if n == 0:
        return
    idx = np.frombuffer(data[: n * w], np.uint8).reshape(n, w)
    dec = decode_gif_pixels(encode_gif(idx))
    assert (dec[:, :, 0] == idx).all()
    assert (dec[:, :, 1] == (3 * idx.astype(int)) % 256).all()
    assert (dec[:, :, 2] == (7 * idx.astype(int)) % 256).all()


@given(
    data=st.binary(min_size=1, max_size=600),
    w=st.integers(min_value=1, max_value=20),
    nf=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_gif_anim_roundtrip_law(data, w, nf):
    """Animated-GIF law on ARBITRARY content: every frame of an
    encode→scan→per-frame-decode roundtrip equals its palette-mapped
    source, and the pruned reader agrees with the single-frame reader
    on frame 0."""
    from fdf_spark.llm.imagecodecs import (
        decode_gif_frame_pixels,
        decode_gif_pixels,
        encode_gif_anim,
        scan_gif_frames,
    )

    h = len(data) // w
    if h == 0:
        return
    base = np.frombuffer(data[: h * w], np.uint8).reshape(h, w)
    frames = [(base + 13 * f).astype(np.uint8) for f in range(nf)]
    p = encode_gif_anim(frames)
    W, H, _mc, streams = scan_gif_frames(p)
    assert (W, H, len(streams)) == (w, h, nf)
    for f in range(nf):
        dec = decode_gif_frame_pixels(p, f)
        idx = frames[f].astype(int)
        assert (dec[:, :, 0] == idx % 256).all()
        assert (dec[:, :, 1] == (3 * idx) % 256).all()
        assert (dec[:, :, 2] == (7 * idx) % 256).all()
    assert (decode_gif_pixels(p) == decode_gif_frame_pixels(p, 0)).all()


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    spb=st.sampled_from([3, 9, 21, 505]),
)
@settings(max_examples=60, deadline=None)
def test_adpcm_decode_total_law(samples, spb):
    """Structural law on ARBITRARY signals: the decoder returns exactly
    the fact count of samples, every block's first sample is verbatim,
    and every decoded value is a legal int16 (clamp discipline)."""
    from fdf_spark.llm.audiocodecs import decode_adpcm_samples, encode_adpcm_wav

    sr, vals = decode_adpcm_samples(encode_adpcm_wav(8000, samples, samples_per_block=spb))
    assert sr == 8000 and len(vals) == len(samples)
    for i in range(0, len(samples), spb):
        assert vals[i] == max(-32768, min(32767, samples[i]))
    assert all(-32768 <= v <= 32767 for v in vals)


@given(
    img=st.integers(min_value=0, max_value=2**32 - 1),
    quant=st.sampled_from([1, 4, 16]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_entropy_roundtrip_law(img, quant):
    """The entropy layer is lossless on arbitrary content: decoded
    dequantized coefficients == independently recomputed quantized DCTs
    for every block of a seeded random image."""
    from fdf_spark.llm.imagecodecs import (
        _DCT_A,
        _q_round,
        _rgb_to_ycbcr,
        decode_jpeg_blocks,
        encode_jpeg,
    )

    rng = np.random.RandomState(img % (2**31))
    rgb = rng.randint(0, 256, (8, 16, 3), np.uint8)
    frame, blocks = decode_jpeg_blocks(encode_jpeg(rgb, quant=quant))
    ycc = _rgb_to_ycbcr(rgb)
    for ci in range(3):
        plane = ycc[:, :, ci]
        for bx in range(2):
            block = plane[0:8, bx * 8 : bx * 8 + 8] - 128.0
            expect = _q_round((_DCT_A @ block @ _DCT_A.T) / quant) * quant
            assert (blocks[ci][0, bx] == expect).all(), (ci, bx)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    bs=st.sampled_from([16, 128, 4096]),
)
@settings(max_examples=60, deadline=None)
def test_flac_roundtrip_law(samples, bs):
    """FLAC is LOSSLESS: encode→decode is the identity on arbitrary
    int16 signals at any block size (multi-frame included), and the
    stream MD5 the decoder verifies guarantees it end-to-end."""
    from fdf_spark.llm.flac import decode_flac_samples, encode_flac

    sr, vals = decode_flac_samples(encode_flac(8000, samples, block_size=bs))
    assert sr == 8000 and vals == samples


# --- wide SimHash vs a pure-python reference (r8) ---------------------------

@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abcd efg", min_size=0, max_size=40), min_size=1, max_size=6
    )
)
def test_simhash128_matches_python_reference(spark, texts):
    """simhash128's two 60-bit words must equal a from-scratch python
    Charikar implementation over the same md5 halves — arbitrary texts
    including empty strings, repeated tokens, and whitespace runs."""
    import hashlib
    import re

    from fdf_spark.llm.dedup import simhash128

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: list(r["simhash"]) for r in simhash128(df).collect()}

    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.lower())  # keep ''-tokens: F.split does too
        votes0, votes1 = [0] * 60, [0] * 60
        for tok in toks:
            hx = hashlib.md5(tok.encode()).hexdigest()
            h0, h1 = int(hx[0:15], 16), int(hx[16:31], 16)
            for b in range(60):
                votes0[b] += 1 if (h0 >> b) & 1 else -1
                votes1[b] += 1 if (h1 >> b) & 1 else -1
        w0 = sum(1 << b for b in range(60) if votes0[b] >= 0)
        w1 = sum(1 << b for b in range(60) if votes1[b] >= 0)
        assert got[i] == [w0, w1], (i, t)
