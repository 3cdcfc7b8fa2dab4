"""AllPairs prefix-filtered similarity join: hand-built exactness and
the cross-algorithm attestation against the inverted-index jaccard
pairs (same sets, same threshold, independent candidate generation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from bigdata_pipelines_aws_glue_spark.operators.setsim import (
    allpairs_prefix_join,
    allpairs_similarity_join,
)


def test_allpairs_handbuilt(spark):
    # A={a,b,c,d,e}, B={a,b,c,d,f} -> J=4/6=0.667 (below 0.8, out)
    # C={a,b,c,d,e,x,y,z,w,v}, D=same minus v plus u -> J=9/11=0.818 in
    c = list("abcdexyzwv")
    d = list("abcdexyzwu")
    rows = (
        [(1, e) for e in "abcde"]
        + [(2, e) for e in "abcdf"]
        + [(3, e) for e in c]
        + [(4, e) for e in d]
    )
    sets = spark.createDataFrame(rows, "doc_id long, s string")
    got = allpairs_similarity_join(sets).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["n_common"]) == (3, 4, 9)
    assert abs(r["jaccard"] - 9 / 11) < 1e-12


def test_allpairs_identical_sets(spark):
    rows = [(i, e) for i in (10, 20, 30) for e in "pqrst"]
    sets = spark.createDataFrame(rows, "doc_id long, s string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in allpairs_similarity_join(sets).collect()
    )
    assert got == [(10, 20, 1.0), (10, 30, 1.0), (20, 30, 1.0)]


def test_allpairs_matches_inverted_index(spark, sf_dir):
    """The prefix-filter pair set must equal the inverted-index pair
    set — identical sets, identical threshold, two independent
    candidate-generation algorithms."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_index = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    via_prefix = {
        (r["doc_a"], r["doc_b"])
        for r in allpairs_prefix_join(spark, sf_dir).collect()
    }
    assert via_prefix == via_index


def test_allpairs_no_pair_below_threshold_sneaks_in(spark):
    # J exactly at the boundary: inter=4, union=5 -> 0.8 qualifies;
    # inter=7, union=9 -> 0.777... must not.
    a = list("abcde")       # n=5
    b = list("abcdf")       # J(a,b)=4/6
    c = list("abcdeghij")   # n=9
    d = list("abcdeghik")   # J(c,d)=8/10=0.8 boundary -> in
    rows = (
        [(1, e) for e in a]
        + [(2, e) for e in b]
        + [(3, e) for e in c]
        + [(4, e) for e in d]
    )
    sets = spark.createDataFrame(rows, "doc_id long, s string")
    got = {(r["doc_a"], r["doc_b"]) for r in allpairs_similarity_join(sets).collect()}
    assert got == {(3, 4)}
