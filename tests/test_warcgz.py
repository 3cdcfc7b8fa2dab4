"""Gzip-member WARC framing: hypothesis round-trip under payload
injection, loud-failure guarantees of the bounded inflate, and
full-query parity with the plain-text parse."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_pipelines_aws_glue_spark.operators.warcgz import (
    compress_member,
    split_members,
    warc_gz_parse_records,
)

#: adversarial record bodies: framing markers, prefix-looking bytes,
#: empty strings, CRLF runs — nothing may confuse the member walk
#: because it never scans content.
_INJECT = st.lists(
    st.sampled_from(
        list("abcWARC/1.0\r\n\x00\x01 ") + ["\r\n\r\n", "WARC/1.0\r\n"]
    ),
    max_size=20,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(_INJECT, min_size=0, max_size=6))
def test_roundtrip_under_injection(texts):
    blob = b"".join(compress_member(t) for t in texts)
    got = split_members(blob)
    assert [t for _, t in got] == texts
    assert [u for u, _ in got] == [len(t.encode("utf-8")) for t in texts]


def test_lying_ulen_prefix_is_loud():
    m = bytearray(compress_member("hello world"))
    # inflate-bound check: declare one byte short
    struct.pack_into(">I", m, 4, 10)
    with pytest.raises(ValueError, match="inflate mismatch"):
        split_members(bytes(m))
    # declare one byte long
    struct.pack_into(">I", m, 4, 12)
    with pytest.raises(ValueError, match="inflate mismatch"):
        split_members(bytes(m))


def test_bad_clen_and_trailing_garbage_are_loud():
    m = compress_member("record")
    with pytest.raises(ValueError, match="overruns"):
        split_members(m[:-1])  # member cut short
    with pytest.raises(ValueError, match="truncated member prefix"):
        split_members(m + b"\x00\x01\x02")  # garbage after last member
    # clen pointing mid-stream: zlib never reaches eof -> loud
    short = bytearray(m)
    struct.pack_into(">I", short, 0, struct.unpack(">I", m[:4])[0] - 2)
    with pytest.raises(ValueError):
        split_members(bytes(short) + b"xx")
    # clen OVER-declared: valid zlib stream followed by junk still
    # inside the declared span — d.unused_data must trip (ADVICE r13)
    over = bytearray(m + b"JU")
    struct.pack_into(">I", over, 0, struct.unpack(">I", m[:4])[0] + 2)
    with pytest.raises(ValueError, match="inflate mismatch"):
        split_members(bytes(over))


def test_bounded_inflate_refuses_bomb():
    # a stream that really inflates to 1 MiB behind a small prefix:
    # the bounded decompress stops at the declared size and the
    # mismatch is loud — never a 1 MiB allocation honored on trust.
    raw = b"A" * (1 << 20)
    comp = zlib.compress(raw)
    blob = struct.pack(">II", len(comp), 64) + comp
    with pytest.raises(ValueError, match="inflate mismatch"):
        split_members(blob)


def test_gz_parse_matches_plain_parse(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.warc import (
        warc_parse_records,
    )

    gz = {
        (r["bucket"], r["rec_idx"]): r
        for r in warc_gz_parse_records(spark, sf_dir).collect()
    }
    plain = {
        (r["bucket"], r["rec_idx"]): r
        for r in warc_parse_records(spark, sf_dir).collect()
    }
    assert gz.keys() == plain.keys() and gz
    for k, g in gz.items():
        p = plain[k]
        assert g["doc_id"] == p["doc_id"]
        assert g["content_length"] == p["content_length"]
        assert g["payload_md5"] == p["payload_md5"]
        # the prefix equals the true framed record length
        assert g["member_ulen"] > g["content_length"]
