"""Pin the semantic conventions (SURVEY.md §5.2: every (med)-confidence
reference behavior is pinned HERE, before any distributed code relies on it).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from abslog_ray.config import (
    DEFAULT_ARGS_RULE,
    DEFAULT_SEGMENT_RULE,
)
from abslog_ray.functions.abstract import abstract_args, abstract_path
from abslog_ray.oracle import abstract_args_one, abstract_path_one
from abslog_ray.quantiles import quantile_disc, quantiles_disc


class TestQuantileConvention:
    """Engine quantile == DuckDB quantile_disc, bit-exact, many shapes."""

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 13, 20, 40, 100, 997])
    def test_matches_duckdb(self, n):
        rng = np.random.default_rng(n)
        vals = rng.integers(0, 10**9, n).astype(np.int64)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": vals}))
        for q in (0.25, 0.5, 0.75, 0.95):
            d = con.execute(
                f"select quantile_disc(x, {q}) from t").fetchone()[0]
            assert quantile_disc(np.sort(vals), q) == d, (n, q)

    def test_empty(self):
        assert quantiles_disc(np.array([], dtype=np.int64),
                              (0.25, 0.5)) == [None, None]


class TestPathAbstraction:
    """Two-pass RE2 kernel == per-segment-split oracle == DuckDB SQL."""

    CASES = [
        "/api/user/48213/profile", "/a/1/2/3", "/a/1/2/3/4/5",
        "/x/deadbeef99aa/y", "/plain/path", "/v2/9/", "/", "",
        "/123", "/123/", "/abc123/45", "/ff00ff00", "/ff00ff0",
        "/0/0/0/0/0/0", "/seg/12ab34cd56/x",
    ]

    def test_kernel_equals_oracle(self):
        arr = pa.array(self.CASES)
        got = abstract_path(arr, (DEFAULT_SEGMENT_RULE,)).to_pylist()
        want = [abstract_path_one(s) for s in self.CASES]
        assert got == want

    def test_kernel_equals_duckdb(self):
        pat, repl, passes = DEFAULT_SEGMENT_RULE
        con = duckdb.connect()
        got = abstract_path(pa.array(self.CASES),
                            (DEFAULT_SEGMENT_RULE,)).to_pylist()
        for s, g in zip(self.CASES, got):
            expr = "?"
            for _ in range(passes):
                expr = f"regexp_replace({expr}, '{pat}', '/*\\2', 'g')"
            d = con.execute(f"select {expr}", [s]).fetchone()[0]
            assert d == g, s

    def test_random_paths_fixpoint(self):
        """Two passes reach the per-segment fixpoint on random paths."""
        rng = np.random.default_rng(0)
        segs = ["abc", "123", "0", "deadbeef00", "x1", "9" * 12, "items"]
        paths = ["/" + "/".join(rng.choice(segs, rng.integers(1, 7)))
                 for _ in range(500)]
        got = abstract_path(pa.array(paths), (DEFAULT_SEGMENT_RULE,)).to_pylist()
        want = [abstract_path_one(p) for p in paths]
        assert got == want


class TestArgsAbstraction:
    CASES = ["a=1&b=xy", "", "k=", "a=1&a=2", "x=%20%7b&y=1",
             "novalue", "a==b&c=d"]

    def test_kernel_equals_oracle(self):
        got = abstract_args(pa.array(self.CASES), DEFAULT_ARGS_RULE).to_pylist()
        want = [abstract_args_one(s) for s in self.CASES]
        assert got == want

    def test_null_passthrough(self):
        got = abstract_args(pa.array([None, "a=1"]), DEFAULT_ARGS_RULE)
        assert got.to_pylist() == [None, "a=?"]


class TestExactSegmentSums:
    """ADVICE r01: float64-weighted bincount loses exactness past 2^53;
    the split-word and add.at kernels must not."""

    def test_bincount_int64_beyond_2_53(self):
        import numpy as np
        from abslog_ray.stages.aggregate import _bincount_int64
        # odd total just above 2^53: not representable in float64
        vals = np.full(1025, (1 << 43) + 7, dtype=np.int64)
        codes = np.zeros(1025, dtype=np.int64)
        got = _bincount_int64(codes, vals, 1)
        want = 1025 * ((1 << 43) + 7)
        assert want > (1 << 53) and want % 2 == 1
        assert got[0] == want
        assert int(np.float64(want)) != want             # float64 can't

    def test_bincount_int64_negative_and_groups(self):
        import numpy as np
        from abslog_ray.stages.aggregate import _bincount_int64
        rng = np.random.default_rng(3)
        vals = rng.integers(-(1 << 42), 1 << 42, 10_000)
        codes = rng.integers(0, 7, 10_000)
        got = _bincount_int64(codes, vals, 7)
        for g in range(7):
            assert got[g] == vals[codes == g].sum()

    def test_seg_sum_int64_large_partials(self):
        import numpy as np
        from abslog_ray.stages.aggregate import _seg_sum_int64
        vals = np.array([(1 << 61) + 3, (1 << 61) + 5, -7], dtype=np.int64)
        codes = np.array([0, 1, 0])
        got = _seg_sum_int64(codes, vals, 2)
        assert got[0] == (1 << 61) + 3 - 7 and got[1] == (1 << 61) + 5


class TestChunkFuzz:
    """Randomized chunk_batch configs vs a naive per-doc reference
    (pure kernel, no Ray)."""

    def test_random_configs(self):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        from abslog_ray.functions.text import chunk_batch
        rng = np.random.default_rng(17)
        for _ in range(20):
            C = int(rng.integers(2, 40))
            O = int(rng.integers(0, C))   # inclusive of C-1: stride 1 covered
            S = C - O
            n_docs = int(rng.integers(1, 30))
            texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 90)))
                     for _ in range(n_docs)]
            t = pa.table({
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": pa.array(texts, pa.string())})
            out = chunk_batch(t, chunk_tokens=C, overlap=O).to_pandas()
            for did, text in enumerate(texts):
                toks = [x for x in text.split() if x]
                n = len(toks)
                want = []
                if n:
                    m = max(1, -(-(n - O) // S))
                    want = [" ".join(toks[i * S:min(i * S + C, n)])
                            for i in range(m)]
                got = out[out.doc_id == did].sort_values("chunk_idx")
                assert got["chunk_text"].tolist() == want, (C, O, n)


def test_disc_quantile_from_counts_matches_duckdb():
    import duckdb
    import numpy as np
    from abslog_ray.quantiles import disc_quantile_from_counts
    rng = np.random.default_rng(1)
    for _ in range(40):
        vals = rng.integers(0, 40, rng.integers(1, 300))
        u, c = np.unique(vals, return_counts=True)
        for q in (0.0, 0.1, 0.5, 0.9, 1.0):
            got = disc_quantile_from_counts(u, c, q)
            exp = duckdb.sql(
                f"select quantile_disc(x, {q}) from (select unnest($v) x)",
                params={"v": vals.tolist()}).fetchone()[0]
            assert got == exp


def test_cont_quantile_from_counts_matches_numpy_linear():
    import numpy as np
    from abslog_ray.quantiles import cont_quantile_from_counts
    rng = np.random.default_rng(2)
    for _ in range(40):
        vals = np.round(rng.normal(0, 50, rng.integers(1, 300)), 2)
        u, c = np.unique(vals, return_counts=True)
        for q in (0.0, 0.1, 0.5, 0.9, 1.0):
            got = cont_quantile_from_counts(u, c, q)
            exp = float(np.percentile(vals, q * 100, method="linear"))
            assert abs(got - exp) < 1e-9, (q, got, exp)


def test_bpe_token_count_closed_form():
    """bpe_token_count_batch: hand-counted pretokens, contraction
    suffixes split, unicode letters one run, whitespace runs one token
    (the documented RE2 no-lookahead variant)."""
    import pyarrow as pa

    from abslog_ray.functions.text import bpe_token_count_batch
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            # "It"," is"(')... hand count: It|'s| a| test|,| isn|'t| it|?|
            # "  "(ws run)|42(" 42")| times|.  -> 13
            "It's a test, isn't it?  42 times.",
            "",
            "καλημέρα world 123",        # " ?L+"x2 sep by space-prefix + N
        ])})
    got = bpe_token_count_batch(t)
    assert got["n_bpe_tokens"].to_pylist() == [13, 0, 3]


def test_bm25_topk_matches_naive(ray_session):
    """bm25_topk == a transparent per-doc python reference (Lucene idf,
    k1=1.2 b=0.75), including rank tie-breaks and docs matched by only
    one of the queries."""
    import math

    import ray.data

    from abslog_ray.functions.text import bm25_topk
    texts = [
        "hash join hash join fast",        # heavy on q0 terms
        "merge sort window",               # mixes q0 and q2
        "scan scan scan slow filter",      # q1
        "nothing relevant here at all",
        "join",                            # short doc, q0
        "window window sort batch batch",  # q2
    ]
    queries = {0: "hash join", 1: "slow scan", 2: "window batch"}
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "text": texts})
    got = (bm25_topk(ray.data.from_pandas(df).repartition(3), queries,
                     k=3).to_pandas()
           .sort_values(["query_id", "rank"], ignore_index=True))

    toks = [t.split() for t in texts]
    N = len(texts)
    avgdl = sum(len(t) for t in toks) / N
    k1, b = 1.2, 0.75

    def naive(q):
        terms = q.split()
        dfreq = {t: sum(t in tk for tk in toks) for t in terms}
        out = []
        for d, tk in enumerate(toks):
            s = 0.0
            for t in terms:
                tf = tk.count(t)
                if tf:
                    idf = math.log((N - dfreq[t] + 0.5)
                                   / (dfreq[t] + 0.5) + 1.0)
                    s += idf * (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * len(tk) / avgdl))
            if s > 0:
                out.append((round(s, 6), d))
        out.sort(key=lambda x: (-x[0], x[1]))
        return out[:3]

    for qid, q in queries.items():
        want = naive(q)
        part = got[got["query_id"] == qid]
        assert list(part["doc_id"]) == [d for _s, d in want], qid
        assert list(part["score"]) == [s for s, _d in want], qid
        assert list(part["rank"]) == list(range(1, len(want) + 1)), qid
