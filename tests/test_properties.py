"""Property-based tests (hypothesis): the unit-rule compiler agrees with
direct Python arithmetic, and the NL condition compiler matches Python
evaluation on generated data."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from iot_database_spark.functions.units import compile_rule
from iot_database_spark.query.nl import compile_condition

# -- unit rules -------------------------------------------------------------

coef = st.floats(min_value=0.1, max_value=1000, allow_nan=False).map(
    lambda x: round(x, 3)
)


@st.composite
def rules(draw):
    a = draw(coef)
    b = draw(coef)
    form = draw(st.sampled_from([
        "value * {a}",
        "value / {a}",
        "value + {a}",
        "value - {a}",
        "value * {a} + {b}",
        "(value + {a}) * {b}",
        "(value - {a}) / {b}",
        "value * {a} / {b} + {a}",
    ]))
    return form.format(a=a, b=b)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=25, deadline=None)
@given(rule=rules(), value=st.floats(min_value=-1e6, max_value=1e6,
                                     allow_nan=False).map(lambda x: round(x, 4)))
def test_rule_compiler_matches_python(rule, value, _spark):
    fn = compile_rule(rule)
    got = _spark.range(1).select(fn(F.lit(float(value))).alias("v")).collect()[0]["v"]
    expected = eval(rule.replace("value", repr(float(value))))  # noqa: S307 — same grammar, test-only
    assert got == pytest.approx(expected, rel=1e-12, abs=1e-12)


# -- full unit catalog ------------------------------------------------------


def _py_eval_rule(rule: str, x: float) -> float:
    import re

    expr = rule.replace("Math.PI", repr(math.pi)).replace("value", repr(x))
    assert re.fullmatch(r"[\d\s.+\-*/()eE]+", expr), rule
    return eval(expr)  # noqa: S307 — validated arithmetic-only, test-side oracle


def test_full_catalog_rules_match_python(_spark):
    """Every one of the 1232 generated conversion rules compiles and its
    Spark arithmetic matches direct Python evaluation — batched as wide
    selects so the whole catalog sweep is a handful of Spark jobs."""
    from iot_database_spark.functions.units import ALL_UNITS, compile_rule

    rules = [
        (t.name, src, rule)
        for t in ALL_UNITS
        for src, rule in t.conversions
    ]
    assert len(rules) >= 1200, "catalog regressed below the reference's 1232 rules"
    for x in (7.3, -2.5):
        for i in range(0, len(rules), 150):
            chunk = rules[i : i + 150]
            cols = [
                compile_rule(r)(F.lit(x)).alias(f"c{j}")
                for j, (_, _, r) in enumerate(chunk)
            ]
            row = _spark.range(1).select(*cols).collect()[0]
            for j, (tgt, src, r) in enumerate(chunk):
                assert row[j] == pytest.approx(
                    _py_eval_rule(r, x), rel=1e-12, abs=1e-12
                ), (src, tgt, r)


def test_temperature_absolute_scales_roundtrip(_spark):
    """a -> b -> a within float ulp for the four absolute temperature
    scales (the reference's Temperature rules are direction-consistent;
    some groups — Length, Power — publish inverted rules, reproduced
    as-is for parity and excluded here)."""
    from iot_database_spark.functions.units import convert

    scales = [
        "degrees_celsius",
        "degrees_fahrenheit",
        "degrees_kelvin",
        "degrees_rankine",
    ]
    cols, labels = [], []
    for a in scales:
        for b in scales:
            if a != b:
                cols.append(
                    convert(convert(F.lit(25.0), a, b), b, a).alias(
                        f"c{len(cols)}"
                    )
                )
                labels.append((a, b))
    row = _spark.range(1).select(*cols).collect()[0]
    for j, (a, b) in enumerate(labels):
        assert row[j] == pytest.approx(25.0, rel=1e-12), (a, b)


def test_unknown_unit_and_cross_group_raise():
    from iot_database_spark.functions.units import RuleError, conversion_rule

    with pytest.raises(RuleError):
        conversion_rule("degrees_celsius", "meters")  # cross-group
    with pytest.raises(RuleError):
        conversion_rule("no_such_unit", "meters")


def test_corrected_mode_inverts_length_power(_spark):
    """`corrected=True` applies the physically-correct direction for the
    two groups whose published rules are inverted (Length, Power), and
    is a no-op for direction-consistent groups (Temperature)."""
    from iot_database_spark.functions.units import convert

    row = (
        _spark.range(1)
        .select(
            convert(F.lit(1500.0), "meters", "kilometers").alias("published"),
            convert(F.lit(1500.0), "meters", "kilometers", corrected=True).alias(
                "physical"
            ),
            convert(F.lit(2000.0), "watts", "kilowatts", corrected=True).alias(
                "kw"
            ),
            convert(
                F.lit(25.0), "degrees_celsius", "degrees_fahrenheit", corrected=True
            ).alias("temp"),
        )
        .collect()[0]
    )
    assert row["published"] == pytest.approx(1500000.0)  # reference-faithful
    assert row["physical"] == pytest.approx(1.5)  # physics
    assert row["kw"] == pytest.approx(2.0)
    assert row["temp"] == pytest.approx(77.0)  # unchanged outside the two groups


def test_dual_group_names_resolve_into_matching_group():
    """Nine reference names exist in two groups (watts: Electrical AND
    Power; henrys: Electrical AND Inductance; ...). Conversion must
    resolve the ambiguous side into the counterpart's group instead of
    rejecting as cross-group."""
    from iot_database_spark.functions.units import conversion_rule

    # kilowatts is Power-only; watts must resolve as Power.watts (whose
    # rules the Power group publishes under the watts_power alias)
    assert conversion_rule("watts", "kilowatts")
    assert conversion_rule("kilowatts", "watts")
    # henrys/millihenrys exist in both Electrical and Inductance; the
    # rule-bearing definitions agree group-wise
    assert conversion_rule("millihenrys", "henrys")


# -- NL conditions ----------------------------------------------------------

names = st.sampled_from(["Widget", "gadget", "THING", "x y", ""])
ages = st.integers(min_value=0, max_value=99)


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(st.tuples(names, ages), min_size=1, max_size=8),
       cutoff=ages, needle=st.sampled_from(["DGE", "widget", "Z", "x "]))
def test_nl_condition_matches_python(rows, cutoff, needle, _spark):
    df = _spark.createDataFrame(
        [(i, n, a) for i, (n, a) in enumerate(rows)], ["id", "name", "age"]
    )
    cond = f"age >= {cutoff} AND name contains '{needle}'"
    got = {r["id"] for r in df.filter(compile_condition(cond, df)).collect()}
    expected = {
        i for i, (n, a) in enumerate(rows)
        if a >= cutoff and needle.lower() in n.lower()
    }
    assert got == expected


# -- chunking reconstruction ------------------------------------------------


@given(
    n_words=st.integers(min_value=1, max_value=300),
    chunk_tokens=st.sampled_from([16, 64]),
    overlap=st.sampled_from([0, 4, 8]),
)
@settings(max_examples=12, deadline=None)
def test_chunks_reconstruct_document(spark, n_words, chunk_tokens, overlap):
    """Dropping each chunk's leading `overlap` tokens (except the first
    chunk) and concatenating reproduces the document exactly — i.e. the
    chunker emits every token exactly once outside overlaps, regardless
    of word count vs chunk/overlap geometry."""
    from iot_database_spark.operators.textstats import chunk_documents

    words = [f"t{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    chunks = sorted(
        chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = chunks[0]["chunk_text"].split(" ")
    for c in chunks[1:]:
        toks = c["chunk_text"].split(" ")
        assert toks[:overlap] == rebuilt[len(rebuilt) - overlap :][: overlap]
        rebuilt.extend(toks[overlap:])
    assert rebuilt == words


def test_zorder_interleave_is_bijective(_spark):
    """layout.zorder_value on an exact 2^bits grid (where linear
    quantization is the identity) must produce a BIJECTIVE Morton key:
    de-interleaving every key recovers exactly its (x, y)."""
    from iot_database_spark.layout import zorder_value

    bits = 4
    n = 1 << bits
    grid = _spark.range(n * n).select(
        (F.col("id") % n).cast("bigint").alias("x"),
        F.floor(F.col("id") / n).cast("bigint").alias("y"),
    )
    keyed, key = zorder_value(grid, ["x", "y"], bits=bits)
    rows = keyed.collect()
    assert len({r[key] for r in rows}) == n * n  # injective
    for r in rows:
        z, qx, qy = r[key], 0, 0
        for b in range(bits):
            qx |= ((z >> (2 * b)) & 1) << b
            qy |= ((z >> (2 * b + 1)) & 1) << b
        assert (qx, qy) == (r["x"], r["y"]), (z, r["x"], r["y"])


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    window_rows=st.sampled_from([1, 3, 20]),
)
@settings(max_examples=10, deadline=None)
def test_ewma_is_convex_combination_of_window(spark, vals, window_rows):
    """EWMA is a convex combination of the window's values, so every
    output must lie within [min, max] of that row's window — for any
    data, any alpha in (0,1), any truncation length. Also: the fold is
    exactly reproducible in plain Python (left fold, same literals)."""
    import datetime as dt

    from iot_database_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), v, i) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "guid long, ts timestamp, value double, event_id long"
    )
    got = [
        r.ewma
        for r in ewma(df, alpha="0.3", window_rows=window_rows)
        .orderBy("event_id")
        .collect()
    ]
    for i, g in enumerate(got):
        window = vals[max(0, i - window_rows + 1) : i + 1]
        assert min(window) <= g <= max(window)
        acc = window[0]
        for x in window[1:]:
            acc = 0.3 * x + 0.7 * acc
        assert g == acc  # bit-identical to the reference left fold


# --- codec properties (round-5): PNG lossless, JPEG progressive==baseline --


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    color=st.sampled_from([0, 2, 3, 4, 6]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_lossless(w, h, color, interlace, seed):
    """png_decode_pixels inverts the spec-side fixture encoder exactly
    for every color type, random per-line filters, and both layouts."""
    import numpy as np

    from iot_database_spark.operators import multimodal as mm
    from tests.test_llm_pipeline import _make_png

    rng = np.random.default_rng(seed)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    hi = 16 if color == 3 else 256
    pix = rng.integers(0, hi, (h, w, nch), dtype=np.uint8)
    plte = (
        rng.integers(0, 256, (16, 3), dtype=np.uint8) if color == 3 else None
    )
    filters = [int(f) for f in rng.integers(0, 5, h)]
    png = _make_png(w, h, color, pix, plte=plte,
                    filters=None if interlace else filters,
                    interlace=interlace)
    d = mm.png_decode_pixels(png)
    got = np.frombuffer(d["rgb"], dtype=np.uint8).reshape(h, w, 3)
    if color == 0:
        expect = np.repeat(pix, 3, axis=2)
    elif color == 2:
        expect = pix
    elif color == 3:
        expect = plte[pix[:, :, 0]]
    elif color == 4:
        expect = np.repeat(pix[:, :, :1], 3, axis=2)
    else:
        expect = pix[:, :, :3]
    assert np.array_equal(got, expect)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 32),
    sub=st.sampled_from([False, "420", "422"]),
    gray=st.booleans(),
    qscale=st.sampled_from([0.02, 1.0, 3.0]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_equals_baseline(w, h, sub, gray, qscale, seed):
    """The progressive encoding of ANY image decodes bit-identically to
    its baseline encoding with the same quantization tables: exact
    coefficient recovery through DC/AC first+refinement scans, across
    subsampling modes, partial MCUs, and quant scales."""
    import numpy as np

    from iot_database_spark.operators.jpeg_codec import (
        jpeg_decode_pixels,
        jpeg_encode_baseline,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        np.round(
            np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 120 / (w + h)],
                     axis=2)
            + rng.normal(0, 8, (h, w, 3))
        ), 0, 255,
    ).astype(np.uint8)
    kw = dict(grayscale=True) if gray else dict(subsample=sub)
    data = img[:, :, 0].tobytes() if gray else img.tobytes()
    base = jpeg_decode_pixels(
        jpeg_encode_baseline(data, w, h, quant_scale=qscale, **kw)
    )
    prog = jpeg_decode_pixels(
        jpeg_encode_progressive(data, w, h, quant_scale=qscale, **kw)
    )
    assert base["rgb"] == prog["rgb"]


# -- round-6 codecs ----------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=0, max_size=120), min_size=0, max_size=30
    ),
    interval=st.integers(min_value=1, max_value=12),
)
def test_framestore_roundtrip_property(frames, interval):
    """encode->decode is the identity for ANY frame sequence (empty
    frames, size changes, duplicates, arbitrary bytes) at any full-
    frame interval, and the stream always starts with a full frame."""
    from iot_database_spark.operators import framestore as fs

    blob = fs.encode_frames(frames, full_interval=interval)
    assert list(fs.decode_frames(blob)) == [bytes(f) for f in frames]
    if frames:
        assert blob[0] == 1
        assert fs.sniff(blob)
        # no delta run longer than the interval
        run = 0
        for is_full, _ in fs.iter_records(blob):
            run = 0 if is_full else run + 1
            assert run <= interval


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=10),
        min_size=1,
        max_size=30,
    ),
    fuzz=st.text(alphabet="abcdefgh", min_size=1, max_size=24),
)
def test_bpe_sequential_equals_greedy_property(words, fuzz):
    """The equivalence the DuckDB BPE oracle rests on, under arbitrary
    trained merge lists (not just the pinned one): applying merges in
    training order, each exhaustively left-to-right, equals the
    min-rank greedy encode loop."""
    from iot_database_spark.operators import bpe

    merges = bpe.train_bpe(
        [(w, 1 + i) for i, w in enumerate(words)], num_merges=30, min_freq=1
    )
    ranks = {p: i for i, p in enumerate(merges)}

    def seq_apply(word: str) -> list[str]:
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w in set(words) | {fuzz}:
        assert bpe.encode_word(w, ranks) == seq_apply(w)


def _ue_bits(v: int) -> str:
    code = bin(v + 1)[2:]
    return "0" * (len(code) - 1) + code


@settings(max_examples=60, deadline=None)
@given(values=st.lists(st.integers(min_value=0, max_value=2**24), min_size=1, max_size=20))
def test_expgolomb_reader_roundtrip_property(values):
    """The H.264 bit reader decodes ANY hand-encoded ue(v) sequence back
    to the source integers (Exp-Golomb §9.1: write side is independent
    of the reader under test), including values spanning many bytes."""
    from iot_database_spark.operators import multimodal as mm

    bits = "".join(_ue_bits(v) for v in values) + "1"
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    r = mm._BitReader(data)
    assert [r.ue() for _ in values] == values


@settings(max_examples=60, deadline=None)
@given(
    pw_mbs=st.integers(min_value=1, max_value=256),
    ph_units=st.integers(min_value=1, max_value=256),
    crop=st.tuples(*[st.integers(min_value=0, max_value=3)] * 4),
    high_profile=st.booleans(),
)
def test_sps_dims_property(pw_mbs, ph_units, crop, high_profile):
    """SPS dimension parse matches the spec formula for arbitrary
    macroblock geometry and 4:2:0 cropping, on both the baseline and
    the high-profile (chroma/bit-depth fields) header layouts."""
    from iot_database_spark.operators import multimodal as mm

    cl, cr, ct, cb = crop
    bits = (
        (f"{100:08b}" if high_profile else f"{66:08b}")
        + "00000000" + f"{30:08b}"
        + _ue_bits(0)  # sps_id
    )
    if high_profile:
        bits += _ue_bits(1) + _ue_bits(0) + _ue_bits(0) + "0" + "0"
    bits += (
        _ue_bits(0)      # log2_max_frame_num_minus4
        + _ue_bits(2)    # pic_order_cnt_type
        + _ue_bits(1)    # max_num_ref_frames
        + "0"            # gaps flag
        + _ue_bits(pw_mbs - 1) + _ue_bits(ph_units - 1)
        + "1" + "1"      # frame_mbs_only, direct_8x8
    )
    has_crop = any(crop)
    bits += "1" + "".join(_ue_bits(c) for c in crop) if has_crop else "0"
    bits += "0"  # vui
    bits += "1"
    bits += "0" * (-len(bits) % 8)
    rbsp = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    want_w = 16 * pw_mbs - 2 * (cl + cr)   # 4:2:0 -> CropUnitX=2
    want_h = 16 * ph_units - 2 * (ct + cb)  # frame_mbs_only -> CropUnitY=2
    got = mm._parse_sps_dims(rbsp)
    if want_w <= 0 or want_h <= 0:
        assert got is None
    else:
        assert got == (want_w, want_h)


@settings(max_examples=40, deadline=None)
@given(
    nals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=23),
            st.binary(min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=12,
    ),
    four=st.booleans(),
)
def test_annexb_walk_roundtrip_property(nals, four):
    """The Annex-B walk recovers every NAL's type and payload from a
    hand-assembled stream with emulation-prevention escaping and either
    start-code length — write side independent of the reader."""
    from iot_database_spark.operators import multimodal as mm

    def escape(rbsp: bytes) -> bytes:
        out, zeros = bytearray(), 0
        for byte in rbsp:
            if zeros >= 2 and byte <= 3:
                out.append(3)
                zeros = 0
            out.append(byte)
            zeros = zeros + 1 if byte == 0 else 0
        return bytes(out)

    start = b"\x00\x00\x00\x01" if four else b"\x00\x00\x01"
    blob = b"".join(
        start + bytes([(3 << 5) | t]) + escape(body) for t, body in nals
    )
    walked = list(mm.annexb_iter_nals(blob))
    assert [t for _, t, _ in walked] == [t for t, _ in nals]
    # payload survives: header byte + escaped body, trailing zeros of
    # the body may be absorbed by the next start code / stream tail
    for (_, _, payload), (t, body) in zip(walked, nals):
        esc = escape(body)
        assert payload == bytes([(3 << 5) | t]) + esc or (
            esc.endswith(b"\x00")
            and payload == (bytes([(3 << 5) | t]) + esc).rstrip(b"\x00")
        )


# --- round-8 operator invariants ------------------------------------------

_url_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_url_host = st.from_regex(r"(www\.)?[A-Za-z][A-Za-z0-9-]{0,10}(\.[A-Za-z]{2,5}){1,2}(:\d{2,4})?", fullmatch=True)
_url_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_url_query = st.from_regex(
    r"(\?([A-Za-z][A-Za-z0-9_]{0,6}=[A-Za-z0-9]{0,6}(&[A-Za-z][A-Za-z0-9_]{0,6}=[A-Za-z0-9]{0,6}){0,4})?)?",
    fullmatch=True,
)
_url_frag = st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True)


@settings(max_examples=40, deadline=None)
@given(
    scheme=_url_scheme, host=_url_host, path=_url_path,
    query=_url_query, frag=_url_frag,
)
def test_canonicalize_url_idempotent_and_cross_engine(scheme, host, path, query, frag):
    """Two invariants, engine-free via the DuckDB twin (fast — no Spark
    session per example): (1) canonicalization is IDEMPOTENT (a
    canonical URL survives a second pass unchanged — the property that
    makes re-crawled canonical keys stable), and (2) the DuckDB twin is
    the fixed point the Spark Column version is separately pinned to in
    test_curation_round8 (shared example table there)."""
    import duckdb

    from iot_database_spark.operators import curation as cu

    url = f"{scheme}://{host}{path}{query}{frag}"
    con = duckdb.connect()
    expr = cu.duck_canonicalize_url("url")
    once = con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [url]).fetchone()[0]
    twice = con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [once]).fetchone()[0]
    assert twice == once, (url, once, twice)


@settings(max_examples=20, deadline=None)
@given(
    words=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30),
    n=st.integers(min_value=1, max_value=4),
)
def test_trim_repeated_windows_duck_reference(words, n):
    """The trim semantics (fixed n-word windows, order-preserving first
    occurrence) reproduced against a direct python reference via the
    DuckDB oracle text — pins the 1-based slice arithmetic both engine
    texts share."""
    import duckdb

    text = " ".join(words)
    # python reference
    wins = [" ".join(words[i : i + n]) for i in range(0, len(words), n)]
    kept, seen = [], set()
    for w in wins:
        if w not in seen:
            seen.add(w)
            kept.append(w)
    q = f"""
    SELECT list_transform(range(0, CAST(ceil(len(ws) / {n}.0) AS BIGINT)),
             i -> array_to_string(ws[i*{n}+1 : i*{n}+{n}], ' ')) AS wins
    FROM (SELECT string_split(?, ' ') AS ws)
    """
    duck_wins = duckdb.connect().execute(q, [text]).fetchone()[0]
    assert duck_wins == wins
    duck_kept = duckdb.connect().execute(
        f"""SELECT list_filter(wins, (x, i) -> list_position(wins[1 : i-1], x) = 0)
            FROM ({q.replace('?', "'" + text + "'")})"""
    ).fetchone()[0]
    assert duck_kept == kept


@settings(max_examples=25, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=64),
        min_size=1, max_size=8,
    ),
)
def test_int8_quantization_bounds_property(vec):
    """Self-quantization invariants via the DuckDB formula text (python
    reference alongside): codes live in [-127, 127], the max-|v| element
    hits exactly +-127 (unless the dim is all-zero), and reconstruction
    error per element is bounded by half a step (scale/254) plus one
    ulp-ish epsilon."""
    import math

    import duckdb

    scale = max(abs(v) for v in vec)
    q = duckdb.connect().execute(
        """
        SELECT list_transform(range(1, len(e)+1),
          i -> CASE WHEN s = 0 THEN 0
               ELSE GREATEST(-127, LEAST(127,
                 CAST(FLOOR(CAST(e[i] AS DOUBLE) / s * 127.0 + 0.5) AS INTEGER)))
               END)
        FROM (SELECT ? AS e, CAST(? AS DOUBLE) AS s)
        """,
        [vec, scale],
    ).fetchone()[0]
    ref = [
        0 if scale == 0 else max(-127, min(127, math.floor(v / scale * 127.0 + 0.5)))
        for v in vec
    ]
    assert q == ref
    assert all(-127 <= c <= 127 for c in q)
    if scale > 0:
        # the extreme element quantizes to +-127 exactly
        i = max(range(len(vec)), key=lambda j: abs(vec[j]))
        assert abs(q[i]) == 127
        half_step = scale / 254.0
        for v, c in zip(vec, q):
            assert abs(v - c * scale / 127.0) <= half_step + 1e-9


# -- incremental chain append ≡ full rebuild --------------------------------

@settings(max_examples=8, deadline=None)
@given(
    seq=st.lists(st.sampled_from("xxyz"), min_size=1, max_size=10),
    cuts=st.sets(st.integers(min_value=1, max_value=9), max_size=3),
)
def test_chain_incremental_equals_rebuild_property(seq, cuts, _spark):
    """For ANY block sequence (duplicate-heavy alphabet on purpose) and
    ANY contiguous batch split, folding batch-by-batch from the heads
    seed must equal the full append_chain(dedup_consecutive(all))
    rebuild — the r9 O(batch) write path's correctness contract."""
    import datetime as dt

    from iot_database_spark.operators import blockchain as bc

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(minutes=i), s) for i, s in enumerate(seq)]
    bounds = [0] + sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    schema = "guid string, ts timestamp, data string"
    chain = _spark.createDataFrame(
        [], schema + ", prev_hash string, hash string"
    )
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        new = bc.append_chain_incremental(
            _spark.createDataFrame(rows[lo:hi], schema), bc.chain_heads(chain)
        )
        chain = chain.unionByName(new)
    full = bc.append_chain(
        bc.dedup_consecutive(_spark.createDataFrame(rows, schema))
    )
    got = sorted(map(tuple, chain.collect()))
    want = sorted(map(tuple, full.select(*chain.columns).collect()))
    assert got == want
