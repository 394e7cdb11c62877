"""Persistent MinHash signature index (VERDICT r04 missing #2, second
half): a training-data pipeline near-dedups against the same corpus
repeatedly — across rounds, against incoming deltas, per retrieval eval
— and the signature pass (shingle + 64 permutations over every token of
every doc) is the expensive corpus-sized stage.  Persist it once:

    out_root/
      meta.json              # n, num_perm, seed, columns — written LAST
                             # (tmp+rename), the build commit marker
      signatures/*.parquet   # one row per doc: id, sig list<int64>

``lsh_dupes_indexed`` then runs banding + exact-Jaccard verify against
the stored signatures: the corpus text is re-read ONLY for the
LSH-candidate docs (bounded small by construction), so a repeat dedup
pays O(candidates) tokenization instead of O(corpus) signing.  Results
are identical to single-shot ``minhash_lsh_dupes`` because the signature
function is deterministic in (n, num_perm, seed) — pinned by
test_minhash_index.py and the ``minhash_dupes_indexed`` oracle query.

The signature sink doubles as the delta-dedup primitive: signing only
NEW docs and banding them against the stored signatures is the same
``lsh_candidates`` call over a union of two Datasets.
"""

from __future__ import annotations

import json
import os

from abslog_ray.stages.dedup import minhash_lsh_dupes, minhash_signatures


def minhash_index_build(ds, out_root: str, n: int = 3, num_perm: int = 64,
                        seed: int = 1337, id_col: str = "doc_id",
                        text_col: str = "text") -> dict:
    """Sign the corpus and persist signatures under ``out_root``.
    meta.json is written last via tmp+rename: ``is_built`` is true iff
    the build committed, so a crashed half-build rebuilds cleanly."""
    sigs = minhash_signatures(ds, n=n, num_perm=num_perm, seed=seed,
                              id_col=id_col, text_col=text_col)
    os.makedirs(out_root, exist_ok=True)
    sigs.write_parquet(os.path.join(out_root, "signatures"))
    meta = {"n": n, "num_perm": num_perm, "seed": seed,
            "id_col": id_col, "text_col": text_col}
    mpath = os.path.join(out_root, "meta.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, mpath)                       # commit point
    return meta


def is_built(index_root: str) -> bool:
    return os.path.exists(os.path.join(index_root, "meta.json"))


def read_signatures(index_root: str):
    """(signature Dataset, meta) for a committed index."""
    import ray.data

    with open(os.path.join(index_root, "meta.json")) as fh:
        meta = json.load(fh)
    sigs = ray.data.read_parquet(os.path.join(index_root, "signatures"))
    return sigs, meta


def lsh_dupes_indexed(index_root: str, ds, tau: float = 0.5,
                      bands: int = 16, max_shingle_df: int = 1000,
                      max_band_group: int = 2_000):
    """``minhash_lsh_dupes`` against the persisted signatures: the
    corpus-sized signing pass is skipped; ``ds`` (the raw docs) is
    tokenized only for the LSH-candidate subset during exact-Jaccard
    verification.  Shingle/permutation parameters come from the index
    meta — the one place they can't drift from what was signed."""
    sigs, meta = read_signatures(index_root)
    return minhash_lsh_dupes(
        ds, n=meta["n"], tau=tau, num_perm=meta["num_perm"],
        bands=bands, id_col=meta["id_col"], text_col=meta["text_col"],
        max_shingle_df=max_shingle_df, max_band_group=max_band_group,
        sigs_ds=sigs)


def lsh_dupes_delta(index_root: str, new_ds, corpus_ds, tau: float = 0.5,
                    bands: int = 16, max_shingle_df: int = 1000,
                    max_band_group: int = 2_000):
    """Incremental near-dedup: find pairs (jac >= tau) between a NEW
    batch of docs and an already-signed corpus (plus new-vs-new pairs)
    WITHOUT re-signing the corpus — the 100 TB ingestion pattern where
    a daily delta dedups against everything committed so far.

    - ``new_ds``: the delta (raw docs).  Only these are signed.
    - ``corpus_ds``: the committed docs (raw text) — read ONLY for the
      exact-Jaccard verify of candidate pairs (bounded by LSH).
    - candidate pairs are restricted to those touching >= 1 new doc:
      corpus-vs-corpus pairs were already findable when the corpus was
      signed, so re-emitting them would make re-runs quadratic.

    The delta id set ships once via ``ray.put`` (delta-sized by
    definition).  Union of stored + fresh signatures feeds the same
    ``lsh_candidates`` banding as the one-shot path, so recall/precision
    semantics are identical."""
    import numpy as np

    sigs_old, meta = read_signatures(index_root)
    id_col = meta["id_col"]
    sigs_new = minhash_signatures(
        new_ds, n=meta["n"], num_perm=meta["num_perm"], seed=meta["seed"],
        id_col=id_col, text_col=meta["text_col"])
    new_ids = np.unique(np.asarray(
        new_ds.select_columns([id_col]).unique(id_col), dtype=np.int64))
    return minhash_lsh_dupes(
        corpus_ds.union(new_ds), n=meta["n"], tau=tau,
        num_perm=meta["num_perm"], bands=bands, id_col=id_col,
        text_col=meta["text_col"], max_shingle_df=max_shingle_df,
        max_band_group=max_band_group,
        sigs_ds=sigs_old.union(sigs_new), pair_filter_ids=new_ids)
