"""Persistent IVF index (stages/ivf_index.py): build-once/query-many
must equal single-shot ivf_ann, survive a crashed build, and never
rebuild on the query path (VERDICT r04 missing #2)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray.stages.ivf_index import (is_built, ivf_ann_query,
                                         ivf_index_build)
from abslog_ray.stages.similarity import ivf_ann

SF = "/root/testdata/sf0.001"
QIDS = (0, 1, 2, 3, 4)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["query_id", "rank"], ignore_index=True)


@pytest.fixture(scope="module")
def index_root(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    meta = ivf_index_build(emb, root, centroid_stride=25, n_shards=16)
    assert is_built(root)
    assert meta["n_centroids"] == 20          # 500 vecs / stride 25
    return root


def test_indexed_equals_single_shot(ray_session, index_root):
    emb = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    want = _norm(ivf_ann(emb, QIDS, k=10, centroid_stride=25,
                         nprobe=4).to_pandas())
    got = _norm(ivf_ann_query(index_root, QIDS, k=10,
                              nprobe=4).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_query_many_without_rebuild(ray_session, index_root):
    """Two split query calls concatenate to the full-set answer, and the
    on-disk index is untouched between them (no rebuild: every file's
    mtime+inode is stable across queries)."""
    def snapshot():
        out = {}
        for dirpath, _d, files in os.walk(index_root):
            for f in files:
                st = os.stat(os.path.join(dirpath, f))
                out[os.path.join(dirpath, f)] = (st.st_mtime_ns, st.st_ino)
        return out

    before = snapshot()
    a = ivf_ann_query(index_root, QIDS[:2], k=10, nprobe=4).to_pandas()
    b = ivf_ann_query(index_root, QIDS[2:], k=10, nprobe=4).to_pandas()
    assert snapshot() == before
    full = _norm(ivf_ann_query(index_root, QIDS, k=10,
                               nprobe=4).to_pandas())
    pd.testing.assert_frame_equal(
        _norm(pd.concat([a, b], ignore_index=True)), full)


def test_meta_is_commit_marker(ray_session, index_root, tmp_path):
    """A build that crashed before meta.json is not 'built' (meta is
    written LAST via tmp+rename), and the sharded layout + list_id
    column are on disk as documented."""
    assert not is_built(str(tmp_path))         # empty dir

    meta = json.load(open(os.path.join(index_root, "meta.json")))
    lists = os.path.join(index_root, "lists")
    shards = sorted(os.listdir(lists))
    assert all(s.startswith("shard=") for s in shards)
    assert len(shards) <= meta["n_shards"]
    t = ray.data.read_parquet(lists).to_pandas()
    assert len(t) == 500
    assert set(t["list_id"]) <= set(range(0, 500, 25))
    # assignment matches the stride quantizer rule: every centroid is
    # assigned to its own list (cosine with itself is the max)
    cent = t[t["vec_id"] % 25 == 0]
    assert (cent["list_id"].to_numpy()
            == cent["vec_id"].to_numpy()).all()


def test_unprobed_shards_not_read(ray_session, index_root, monkeypatch):
    """The query path passes ONLY probed-shard files to read_parquet —
    the partition-pruning contract that makes the persisted layout an
    index rather than a scan."""
    seen_paths = []
    real = ray.data.read_parquet

    def spy(paths, **kw):
        if isinstance(paths, list):
            seen_paths.extend(paths)
        return real(paths, **kw)

    # ivf_ann_query does `import ray.data` locally -> same module object
    monkeypatch.setattr(ray.data, "read_parquet", spy)
    ivf_ann_query(index_root, QIDS[:1], k=10, nprobe=2).to_pandas()
    assert seen_paths, "list-path read not exercised"
    shards_read = {p.split("shard=")[1].split(os.sep)[0]
                   for p in seen_paths if "shard=" in p}
    # 1 query x nprobe=2 lists -> at most 2 of the 16 shards
    assert len(shards_read) <= 2
