"""Property-based tests (hypothesis) for the pure kernels — no Spark
session needed, so these run in milliseconds and cover edge cases the
corpus never hits."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_pipelines_aws_glue_spark.streaming.stateful import _fold_ewma

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@given(st.lists(finite_doubles, max_size=50))
@settings(max_examples=200, deadline=None)
def test_fold_ewma_total_and_bounds(values):
    ewma, anomalies = _fold_ewma(values, None)
    assert 0 <= anomalies <= max(0, len(values) - 1)
    if values:
        # relative tolerance: a*v + (1-a)*v can exceed v by an ulp
        eps = 1e-9 * max(1.0, max(abs(v) for v in values))
        assert min(values) - eps <= ewma <= max(values) + eps
    else:
        assert ewma == 0.0


@given(finite_doubles)
@settings(max_examples=300, deadline=None)
def test_stable_round_formula_matches_duckdb(x):
    """The floor(x*100+0.5)/100 formula must agree bit-for-bit between
    Python/duckdb on arbitrary doubles (Spark evaluates the identical
    IEEE expression plan-side)."""
    py = math.floor(x * 100.0 + 0.5) / 100.0
    (dk,) = duckdb.sql(
        f"SELECT floor(({x!r}::DOUBLE) * 100.0 + 0.5) / 100.0"
    ).fetchone()
    assert py == dk


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), max_size=8))
@settings(max_examples=100, deadline=None)
def test_minhash_kernel_identical_docs_identical_sigs(texts):
    """Pure-python mirror of the minhash kernel property: equal texts
    always get equal signatures; signature length is fixed."""
    import hashlib

    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.dedup import (
        N_HASHES,
        _MERSENNE_61,
    )

    rng = np.random.RandomState(42)
    A = (rng.randint(1, _MERSENNE_61, size=N_HASHES, dtype=np.int64) | 1).astype(
        np.uint64
    )
    B = rng.randint(0, _MERSENNE_61, size=N_HASHES, dtype=np.int64).astype(
        np.uint64
    )

    def sig(text):
        toks = text.strip().split(" ")
        if len(toks) < 3:
            return ()
        grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        base = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
                )
                for g in grams
            ),
            dtype=np.uint64,
            count=len(grams),
        )
        mixed = (A[:, None] * base[None, :] + B[:, None]) % _MERSENNE_61
        return tuple(mixed.min(axis=1).tolist())

    for t in texts:
        s1, s2 = sig(t), sig(t)
        assert s1 == s2
        assert len(s1) in (0, N_HASHES)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_bounded_error_any_shape(h, w, gray, seed):
    """Baseline JPEG encode->decode on arbitrary (incl. non-multiple-
    of-8, 1-pixel) shapes: output shape is exact and per-pixel error
    is bounded. Random noise is JPEG's worst case — the Annex K
    tables quantize high frequencies hard — so the bound is loose
    (mean < 40) but shape/termination must always hold."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    mean_err = np.abs(dec.astype(int) - img.astype(int)).mean()
    # images without one full 8x8 block (either dimension < 8 — NOT
    # h*w, a 2x33 strip has 66 px and zero full blocks) can't amortize
    # edge-replication + chroma-quant error (Annex K table goes to 99)
    assert mean_err < (40 if min(h, w) >= 8 else 96), mean_err


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(50)]),
        min_size=0,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_misra_gries_guarantee_any_stream_any_split(tokens, n_parts):
    """MG invariants under arbitrary streams and arbitrary partition
    splits: merged estimates never exceed truth, undercount stays
    within n/(K+1) summed over partitions, and every strictly-heavy
    term survives the merged sketch."""
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.corpus_stats import (
        MG_K,
        _mg_partitions,
    )

    # split the stream into n_parts contiguous partitions of documents
    docs = [" ".join(tokens[i::n_parts]) for i in range(n_parts)]
    merged: dict[str, int] = {}
    for doc in docs:
        out = list(
            _mg_partitions(iter([pd.DataFrame({"text": [doc]})]))
        )[0]
        for t, e in zip(out["term"], out["est"]):
            merged[t] = merged.get(t, 0) + int(e)
    exact: dict[str, int] = {}
    for t in tokens:
        exact[t] = exact.get(t, 0) + 1
    n = len(tokens)
    for t, est in merged.items():
        assert est <= exact[t]
    for t, c in exact.items():
        assert c - merged.get(t, 0) <= n // (MG_K + 1) + n_parts
        if c * MG_K > n:
            assert t in merged and merged[t] > 0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-500.0, max_value=500.0, allow_nan=False),
        max_size=100,
    ),
    st.integers(min_value=0, max_value=100),
)
def test_cusum_split_fold_equals_whole_fold(values, cut):
    """State-carry property under any stream and any trigger split —
    the invariant that makes the streaming CUSUM correct."""
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        CUSUM_H,
        _fold_cusum,
    )

    cut = min(cut, len(values))
    whole = _fold_cusum(values)
    s_pos, s_neg, a1 = _fold_cusum(values[:cut])
    s_pos, s_neg, a2 = _fold_cusum(values[cut:], s_pos, s_neg)
    assert (s_pos, s_neg, a1 + a2) == whole
    assert 0.0 <= s_pos <= CUSUM_H and 0.0 <= s_neg <= CUSUM_H


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=600,
    )
)
@settings(max_examples=200, deadline=None)
def test_chunker_covers_text_exactly(text):
    """The UDTF chunker kernel on arbitrary ASCII text: chunks
    reassemble to the original (dropping each chunk's overlap
    prefix), every chunk is full-size except possibly the last, and
    the count matches the closed form the oracle uses."""
    import math

    from bigdata_pipelines_aws_glue_spark.operators.chunking import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        _make_chunker,
    )

    step = CHUNK_SIZE - CHUNK_OVERLAP
    # drive the underlying generator, not Spark
    cls = _make_chunker().func  # the wrapped class
    chunks = list(cls().eval(text))
    assert len(chunks) == (0 if not text else math.ceil(len(text) / step))
    rebuilt = ""
    for idx, chunk, ln in chunks:
        assert ln == len(chunk)
        assert chunk == text[idx * step : idx * step + CHUNK_SIZE]
        rebuilt += chunk if idx == 0 else chunk[CHUNK_OVERLAP:] if len(rebuilt) >= idx * step + CHUNK_OVERLAP else chunk
    if text:
        assert rebuilt.startswith(text[: len(rebuilt)])
        assert len(rebuilt) >= len(text)


@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=8, max_value=24),
    st.integers(min_value=8, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_mp4_avi_containers_agree_on_any_frames(n, w, h, seed):
    """Container independence on random frames: the MP4 and AVI paths
    must decode to BIT-IDENTICAL arrays (they carry the same JPEGs),
    for any frame count and dimensions."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        decode_avi_mjpeg,
        decode_mp4_mjpeg,
        encode_avi_mjpeg,
        encode_mp4_mjpeg,
    )

    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for _ in range(n)
    ]
    via_mp4 = decode_mp4_mjpeg(encode_mp4_mjpeg(frames))
    via_avi = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert len(via_mp4) == len(via_avi) == n
    for a, b in zip(via_mp4, via_avi):
        assert np.array_equal(a, b)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_degree_ordered_wedges_count_triangles(raw_edges):
    """The degree-ordered wedge-counting scheme (the triangle query's
    core) equals the brute-force census on arbitrary small graphs —
    pure-python replica of the Spark plan's logic."""
    edges = {(min(u, v), max(u, v)) for u, v in raw_edges if u != v}
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    # direct from (degree, id)-smaller endpoint
    directed = set()
    for u, v in edges:
        s, t = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        directed.add((s, t))
    out: dict[int, list[int]] = {}
    for s, t in directed:
        out.setdefault(s, []).append(t)
    closing = {(min(s, t), max(s, t)) for s, t in directed}
    wedges = 0
    tri = 0
    for s, ts in out.items():
        ts = sorted(ts)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                wedges += 1
                x, y = ts[i], ts[j]
                if (min(x, y), max(x, y)) in closing:
                    tri += 1
    # brute force
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = sum(len(adj[u] & adj[v]) for u, v in edges) // 3
    assert tri == brute


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_gini_tie_block_identity(values):
    """The tie-block formula gini_customer_revenue sums distributed —
    2*sum_i i*x_(i) == sum over distinct v of v*c*(2*cum_before+c+1)
    — equals the sorted definition for ANY multiset."""
    from collections import Counter

    xs = sorted(values)
    lhs = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    cnt = Counter(values)
    rhs = 0
    cb = 0
    for v in sorted(cnt):
        c = cnt[v]
        rhs += v * c * (2 * cb + c + 1)
        cb += c
    assert lhs == rhs


@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1,
             max_size=80),
    st.integers(min_value=1, max_value=80),
)
@settings(max_examples=200, deadline=None)
def test_counting_rank_quantile_identity(values, k):
    """conformal_interval_orders' sort-free order statistic —
    min{v : cum_count(<=v) >= k} — equals the k-th smallest for ANY
    multiset and any in-range rank."""
    from collections import Counter

    if k > len(values):
        k = len(values)
    cnt = Counter(values)
    cum = 0
    got = None
    for v in sorted(cnt):
        cum += cnt[v]
        if cum >= k:
            got = v
            break
    assert got == sorted(values)[k - 1]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_sweepline_peak_equals_bruteforce(iv):
    """max_concurrent_orders' boundary-delta running sum: the peak
    equals the brute-force per-day overlap count for ANY intervals
    [s, s+len]."""
    from collections import defaultdict

    spans = [(s, s + ln) for s, ln in iv]
    deltas = defaultdict(int)
    for s, e in spans:
        deltas[s] += 1
        deltas[e + 1] -= 1
    c = peak = 0
    for d in sorted(deltas):
        c += deltas[d]
        peak = max(peak, c)
    brute = max(
        sum(1 for s, e in spans if s <= d <= e)
        for d in range(0, max(e for _, e in spans) + 1)
    )
    assert peak == brute


@given(st.integers(min_value=1, max_value=10_000_000))
@settings(max_examples=300, deadline=None)
def test_pnpoly_lattice_separation(k):
    """spatial_point_in_polygon's exactness precondition: every
    synthesized lattice point is >= ~0.005 away (in latitude) from
    every polygon vertex latitude and never lies on a vertical edge
    x-coordinate — so the ray-casting comparisons are never within
    float noise of a tie."""
    from bigdata_pipelines_aws_glue_spark.operators.spatial import _POLYGONS

    lat = ((k * 37) % 17000) / 100.0 - 85.0
    lon = ((k * 73) % 36000) / 100.0 - 180.0
    for verts in _POLYGONS.values():
        for vy, vx in verts:
            assert abs(lat - vy) > 0.004
            assert abs(lon - vx) > 0.004


def _ref_spans(texts, k=8, min_df=2):
    """Brute-force reference for SPANS_ORACLE semantics."""
    toks = {i + 1: t.strip().split(" ") for i, t in enumerate(texts)}
    docs_of = {}
    for d, tk in toks.items():
        if len(tk) < k:
            continue
        for i in range(len(tk) - k + 1):
            docs_of.setdefault(" ".join(tk[i : i + k]), set()).add(d)
    out = set()
    for d, tk in toks.items():
        if len(tk) < k:
            continue
        iv = [
            (i + 1, i + k)
            for i in range(len(tk) - k + 1)
            if len(docs_of[" ".join(tk[i : i + k])]) >= min_df
        ]
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1] + 1:
                ps, pe, n = merged[-1]
                merged[-1] = (ps, max(pe, e), n + 1)
            else:
                merged.append((s, e, 1))
        for s, e, n in merged:
            out.add((d, s, e, e - s + 1, n))
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=24
        ).map(" ".join),
        min_size=0,
        max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_spans_oracle_matches_bruteforce(texts):
    """The SPANS_ORACLE DuckDB SQL (the hash-attested twin of the
    Spark operator at three SFs) must equal an independent brute-force
    reference on random tiny-alphabet corpora — covering gram overlap,
    adjacency merges, sub-k docs, and empty docs the fixed fixtures
    never enumerate."""
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.spandedup import (
        SPANS_ORACLE,
    )

    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(1, len(texts) + 1), dtype="int64"),
            "text": pd.Series(texts, dtype="string"),
        }
    )
    con.register("documents", df)
    got = {
        tuple(int(v) for v in row)
        for row in con.execute(SPANS_ORACLE).fetchall()
    }
    assert got == _ref_spans(texts)


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=120),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=60, deadline=None)
def test_cdc_chunks_tile_text_exactly(texts):
    """CDC chunks (the shared _CUTS_CTE both registry oracles build
    on) must tile every document exactly: concat in order == text, no
    gaps or overlaps, any boundary rule outcome."""
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.cdc import _CUTS_CTE

    con = duckdb.connect()
    df = pd.DataFrame(
        {"doc_id": range(1, len(texts) + 1), "text": texts}
    )
    con.register("documents", df)
    rows = con.execute(
        f"WITH {_CUTS_CTE} SELECT doc_id, "
        "string_agg(chunk, '' ORDER BY st) AS joined, "
        "CAST(sum(en - st + 1) AS BIGINT) AS covered, "
        "count(*) AS n_chunks FROM chunks GROUP BY doc_id"
    ).fetchall()
    by_doc = {r[0]: r for r in rows}
    for i, t in enumerate(texts):
        if len(t) == 0:
            assert i + 1 not in by_doc
            continue
        _, joined, covered, n_chunks = by_doc[i + 1]
        assert joined == t and covered == len(t) and n_chunks >= 1


@given(st.binary(max_size=3000))
@settings(max_examples=60, deadline=None)
def test_packbits_roundtrip_any_bytes(data):
    from bigdata_pipelines_aws_glue_spark.operators.tiff import (
        packbits_decode,
        packbits_encode,
    )

    assert packbits_decode(packbits_encode(data), len(data)) == data


@given(st.binary(max_size=4000), st.booleans())
@settings(max_examples=40, deadline=None)
def test_tiff_lzw_roundtrip_any_bytes_both_schedules(data, early):
    from bigdata_pipelines_aws_glue_spark.operators.tiff import (
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    assert (
        tiff_lzw_decode(tiff_lzw_encode(data, early), len(data), early)
        == data
    )


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.sampled_from(["none", "packbits", "lzw", "deflate"]),
    st.sampled_from(["<", ">"]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_container_roundtrip_any_shape(
    h, w, gray, comp, bo, predictor, seed
):
    """Any (shape x colorspace x compression x byteorder x predictor)
    combination must round-trip pixel-exact — TIFF is lossless in
    this profile by construction."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
        np.uint8
    )
    got = decode_tiff(
        encode_tiff(px, bo, compression=comp, predictor=predictor)
    )
    assert (got == px).all()


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=400,
    )
)
@settings(max_examples=40, deadline=None)
def test_adpcm_wav_roundtrip_any_pcm_shape(samples):
    """IMA ADPCM container round-trip: decode(encode(x)) preserves the
    sample COUNT exactly (fact-chunk trim across any block split) and
    every reconstructed sample stays in int16 range — the lossy-codec
    analogue of the lossless identities above."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
        encode_wav_ima,
    )
    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        decode_wav,
    )

    pcm = np.array(samples, dtype=np.int64)
    if len(pcm) == 0:
        return
    frames, rate = decode_wav(encode_wav_ima(pcm))
    assert frames.shape[0] == len(pcm)
    assert frames.dtype == np.int16
    # first sample of every 505-sample block is stored verbatim
    assert int(frames.reshape(-1)[0]) == int(pcm[0])


# ------------------------------------------------ WARC framing (r12)

_CRLF = "\r\n"


def _py_warc_record(doc_id: int, payload: str) -> str:
    return (
        f"WARC/1.0{_CRLF}WARC-Type: response{_CRLF}"
        f"WARC-Record-ID: <urn:doc:{doc_id}>{_CRLF}"
        f"WARC-Target-URI: https://en.example.test/doc/{doc_id}{_CRLF}"
        f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
        f"{payload}{_CRLF}{_CRLF}"
    )


def _py_warc_parse(blob: str, max_recs: int = 64):
    """Pure-python mirror of the Spark fold / DuckDB CTE step
    arithmetic in operators/warc.py (1-based offsets kept)."""
    off = 1
    recs = []
    for _ in range(max_recs):
        if not (off < len(blob) and blob[off - 1 : off + 7] == "WARC/1.0"):
            break
        rest = blob[off - 1 :]
        hdr_end = rest.find(_CRLF + _CRLF) + 1  # 1-based like instr
        import re

        clen = int(re.search(r"Content-Length: ([0-9]+)", rest).group(1))
        pay_start = off + hdr_end - 1 + 4
        recs.append(blob[pay_start - 1 : pay_start - 1 + clen])
        off = off + hdr_end - 1 + 4 + clen + 4
    return off, recs


#: payloads may contain CRLF, the record marker, fake headers —
#: Content-Length framing must not care.
warc_payloads = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abcXYZ 0123456789:<>/") + ["\r", "\n"]
        ),
        max_size=40,
    ).map(lambda s: s),
    min_size=0,
    max_size=6,
)


@given(warc_payloads)
@settings(max_examples=300, deadline=None)
def test_warc_framing_roundtrip_any_payload(payloads):
    blob = "".join(
        _py_warc_record(i, p) for i, p in enumerate(payloads)
    )
    off, recs = _py_warc_parse(blob)
    assert recs == payloads
    assert off == len(blob) + 1


@given(warc_payloads)
@settings(max_examples=100, deadline=None)
def test_warc_framing_survives_marker_injection(payloads):
    evil = [p + "WARC/1.0\r\nContent-Length: 7\r\n\r\n" for p in payloads]
    blob = "".join(_py_warc_record(i, p) for i, p in enumerate(evil))
    _, recs = _py_warc_parse(blob)
    assert recs == evil


# ------------------------------------------------ bloom packing (r12)

from bigdata_pipelines_aws_glue_spark.operators.bloomjoin import (  # noqa: E402
    _A1,
    _A2,
    _B1,
    _B2,
    _P,
)


def _py_positions(key: int, m: int, k: int) -> list[int]:
    h = key % _P
    h1 = (_A1 * h + _B1) % _P
    h2 = ((_A2 * h + _B2) % (_P - 1)) + 1
    return [(h1 + i * h2) % m for i in range(k)]


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=60),
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_bloom_bitset_equals_set_semantics(build, probe):
    """The equivalence the oracle rests on: the Spark 63-bit-word
    bitset test must equal DuckDB's all-positions-in-set test."""
    m, k = 1024, 3
    words = [0] * ((m + 62) // 63)
    posset = set()
    for key in build:
        for pos in _py_positions(key, m, k):
            posset.add(pos)
            words[pos // 63] |= 1 << (pos % 63)
    for key in build + probe:
        via_bits = all(
            words[p // 63] >> (p % 63) & 1 for p in _py_positions(key, m, k)
        )
        via_set = all(p in posset for p in _py_positions(key, m, k))
        assert via_bits == via_set
        if key in build:
            assert via_bits  # no false negatives, ever
