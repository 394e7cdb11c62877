"""X2 extension surface + ANN recall + HLL query accuracy."""

import dataclasses

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from abslog_ray.pipelines.run import build_enriched


def test_extra_stage_fn_and_class(t1_path, default_cfg):
    """Custom stages inserted after enrich: a stateless fn and a stateful
    class, both pyarrow-in/pyarrow-out."""

    def flag_long(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column("is_long", pc.greater(t["bytes"], 100))

    class AddConst:
        def __init__(self):
            self.tag = "x"   # per-actor setup

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.append_column(
                "tag", pa.array([self.tag] * t.num_rows))

    cfg = dataclasses.replace(default_cfg,
                              extra_stages=(flag_long, AddConst))
    ds = ray.data.read_parquet(t1_path)
    out = build_enriched(ds, cfg)
    schema = out.schema().names
    assert "is_long" in schema and "tag" in schema
    df = out.take(5)
    assert all(r["tag"] == "x" for r in df)


def test_lsh_ann_recall_vs_brute():
    """LSH ANN: every returned neighbor's sim must match brute-force sim,
    and recall@10 over the probed bucket should be reasonable for nearby
    vectors (approximate by construction — this pins the contract)."""
    from abslog_ray.stages.similarity import knn_brute, lsh_ann
    rng = np.random.default_rng(9)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    # plant a tight cluster around vec 0 so true neighbors share its bucket
    for i in range(1, 8):
        base[i] = base[0] + rng.standard_normal(16).astype(np.float32) * 0.05
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": list(base)})
    ds = ray.data.from_pandas(df)
    brute = knn_brute(ds, [0], k=10).to_pandas()
    ann = lsh_ann(ds, [0], k=10, n_planes=4, dim=16).to_pandas()
    assert len(ann) > 0
    brute_top = set(brute["neighbor_id"].head(10))
    ann_ids = set(ann["neighbor_id"])
    # the planted near-identical vectors land in the same hyperplane bucket
    planted = set(range(1, 8))
    assert len(planted & ann_ids) >= 5
    assert len(brute_top & ann_ids) >= 5


def test_approx_uniq_users_accuracy(tmp_path):
    """The contract query emits the exact distributed distinct plus the
    HLL-accuracy flag; both must line up with DuckDB's exact count."""
    from abslog_ray.pipelines.queries import q_approx_uniq_users
    import duckdb
    sf = "/root/testdata/sf0.01"
    got = q_approx_uniq_users(sf)
    want = duckdb.sql(
        f"select event_type, count(distinct user_id) u from "
        f"read_parquet('{sf}/events.parquet') group by 1").df()
    m = got.merge(want, on="event_type")
    assert len(m) == len(want)
    assert (m["uniq_users"] == m["u"]).all()
    assert m["hll_ok"].all()


def test_extra_stage_composes_redaction():
    """X2 extension surface composes with the new text operators: a user
    can insert redact-style scrubbing of the `text` column as an
    extra_stage and the pipeline runs it after enrich."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from abslog_ray.config import PipelineConfig
    from abslog_ray.fixtures import ROLE_SINKS, TOOL_CATS, fixture_parquet
    from abslog_ray.functions.text import REDACTION_RULES
    from abslog_ray.pipelines.run import build_enriched

    def scrub(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for pat, repl in REDACTION_RULES:
            col = pc.replace_substring_regex(col, pat, repl)
        return t.set_column(t.schema.get_field_index("text"), "text", col)

    cfg = PipelineConfig(tool_lookup=dict(TOOL_CATS),
                         role_lookup=dict(ROLE_SINKS),
                         enrich_concurrency=(1, 2),
                         extra_stages=(scrub,))
    ds = ray.data.read_parquet(fixture_parquet("t1"))
    out = build_enriched(ds, cfg).limit(500).to_pandas()
    # fixture texts contain long numeric ids -> scrubbed to <NUM>
    assert out["text"].str.contains("<NUM>").any()
