"""Persistent MinHash signature index (stages/minhash_index.py):
query-from-index must equal single-shot minhash_lsh_dupes, skip the
corpus signing pass, and honor the meta commit marker."""
import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray.stages.dedup import minhash_lsh_dupes
from abslog_ray.stages.minhash_index import (is_built, lsh_dupes_indexed,
                                             minhash_index_build,
                                             read_signatures)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _frame(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(["doc_a", "doc_b"], ignore_index=True)


@pytest.fixture(scope="module")
def index_root(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh") / "idx")
    meta = minhash_index_build(_docs(), root, n=3, num_perm=64)
    assert is_built(root)
    assert meta == {"n": 3, "num_perm": 64, "seed": 1337,
                    "id_col": "doc_id", "text_col": "text"}
    return root


def test_indexed_equals_single_shot(ray_session, index_root):
    want = _frame(minhash_lsh_dupes(_docs(), n=3, tau=0.5, bands=32))
    got = _frame(lsh_dupes_indexed(index_root, _docs(), tau=0.5, bands=32))
    assert len(want) > 0, "fixture should contain planted near-dups"
    pd.testing.assert_frame_equal(
        got.astype({"doc_a": np.int64, "doc_b": np.int64}),
        want.astype({"doc_a": np.int64, "doc_b": np.int64}))


def test_query_does_not_resign(ray_session, index_root, monkeypatch):
    """The indexed path must never call the corpus signing function —
    that is the whole point of persisting signatures."""
    import abslog_ray.stages.minhash_index as mod

    def boom(*a, **kw):
        raise AssertionError("indexed query re-signed the corpus")

    monkeypatch.setattr(mod, "minhash_signatures", boom)
    res = lsh_dupes_indexed(index_root, _docs(), tau=0.5, bands=32)
    assert len(_frame(res)) > 0

    sigs, meta = read_signatures(index_root)
    assert sigs.count() == _docs().count()
    t = sigs.take_batch(5, batch_format="pandas")
    assert all(len(s) == meta["num_perm"] for s in t["sig"])


def test_meta_is_commit_marker(tmp_path):
    assert not is_built(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        read_signatures(str(tmp_path))


def test_delta_dedup_against_signed_corpus(ray_session, tmp_path,
                                           monkeypatch):
    """lsh_dupes_delta: only the delta is signed (corpus signatures come
    from the index), and the pair set equals the one-shot full-corpus
    result restricted to pairs touching a delta doc."""
    import pyarrow as pa

    import abslog_ray.stages.minhash_index as mod

    def part(new: bool):
        def flt(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 10 == 0
            return t.filter(pa.array(m if new else ~m))
        return _docs().map_batches(flt, batch_format="pyarrow")

    root = str(tmp_path / "idx")
    minhash_index_build(part(False), root, n=3)

    calls = []
    real = mod.minhash_signatures

    def counting(ds, **kw):
        calls.append(ds.count())
        return real(ds, **kw)

    monkeypatch.setattr(mod, "minhash_signatures", counting)
    got = _frame(mod.lsh_dupes_delta(root, part(True), part(False),
                                     tau=0.5, bands=32))
    n_new = part(True).count()
    assert calls == [n_new]                 # signed the delta, ONCE

    full = _frame(minhash_lsh_dupes(_docs(), n=3, tau=0.5, bands=32))
    mask = (full["doc_a"] % 10 == 0) | (full["doc_b"] % 10 == 0)
    want = full[mask].reset_index(drop=True)
    assert len(want) > 0, "fixture should plant delta-touching near-dups"
    pd.testing.assert_frame_equal(
        got.astype({"doc_a": np.int64, "doc_b": np.int64}),
        want.astype({"doc_a": np.int64, "doc_b": np.int64}))
