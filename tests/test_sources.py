"""Multi-format transcript sources (SURVEY.md §2 S2): JSONL / CSV / TSV
fragments must land on the canonical schema and carry row-identical data
vs the parquet source."""

import glob
import os

import pandas as pd
import pytest

from abslog_ray.fixtures import fixture_parquet, fixture_text_format
from abslog_ray.sources.transcripts import (
    TRANSCRIPT_COLUMNS,
    read_transcripts,
    read_transcripts_any,
    read_transcripts_csv,
    read_transcripts_jsonl,
)


def _frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()[TRANSCRIPT_COLUMNS]
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


@pytest.fixture(scope="module")
def parquet_df(ray_session):
    return _frame(read_transcripts(fixture_parquet("t1")))


def _paths(d, ext):
    return sorted(glob.glob(os.path.join(d, f"*.{ext}")))


def test_jsonl_source_matches_parquet(ray_session, parquet_df):
    ds = read_transcripts_jsonl(_paths(fixture_text_format("t1"), "jsonl"))
    df = _frame(ds)
    assert [str(t) for t in df.dtypes] == \
        [str(t) for t in parquet_df.dtypes]
    pd.testing.assert_frame_equal(df, parquet_df)


def test_csv_source_matches_parquet(ray_session, parquet_df):
    d = fixture_text_format("t1", format="csv")
    df = _frame(read_transcripts_csv(_paths(d, "csv")))
    pd.testing.assert_frame_equal(df, parquet_df)


def test_tsv_source_matches_parquet(ray_session, parquet_df):
    d = fixture_text_format("t1", format="tsv")
    df = _frame(read_transcripts_csv(_paths(d, "tsv"), delimiter="\t"))
    pd.testing.assert_frame_equal(df, parquet_df)


def test_read_any_dispatch(ray_session, parquet_df):
    d = fixture_text_format("t1")
    df = _frame(read_transcripts_any(_paths(d, "jsonl"), format="jsonl"))
    pd.testing.assert_frame_equal(df, parquet_df)
    with pytest.raises(ValueError, match="unknown transcript format"):
        read_transcripts_any(d, format="xml")


def test_jsonl_gzip_source_matches_parquet(ray_session, parquet_df):
    d = fixture_text_format("t1", format="jsonl.gz")
    ds = read_transcripts_jsonl(_paths(d, "jsonl.gz"), compression="gzip")
    pd.testing.assert_frame_equal(_frame(ds), parquet_df)


def test_feather_source_matches_parquet(ray_session, parquet_df,
                                        tmp_path):
    """Arrow IPC fragments decode inside read tasks and land on the
    canonical schema, row-identical to the parquet source."""
    import pyarrow as pa
    import pyarrow.feather as feather

    from abslog_ray.sources.transcripts import read_transcripts_feather

    d = str(tmp_path / "ipc")
    os.makedirs(d)
    # split the fixture into two IPC fragments
    t = pa.Table.from_pandas(parquet_df, preserve_index=False)
    half = t.num_rows // 2
    feather.write_feather(t.slice(0, half), os.path.join(d, "a.arrow"))
    feather.write_feather(t.slice(half), os.path.join(d, "b.arrow"))
    df = _frame(read_transcripts_feather(_paths(d, "arrow")))
    pd.testing.assert_frame_equal(df, parquet_df)


def test_jsonl_csv_export_roundtrip(ray_session, parquet_df, tmp_path):
    """write_transcripts_jsonl / _csv fragments read back bit-exactly
    through the matching reader (epoch-µs ts convention)."""
    from abslog_ray.sources.transcripts import (
        write_transcripts_csv,
        write_transcripts_jsonl,
    )

    src = read_transcripts(fixture_parquet("t1"))
    jd = str(tmp_path / "jsonl_out")
    cd = str(tmp_path / "csv_out")
    write_transcripts_jsonl(src, jd)
    write_transcripts_csv(src, cd, delimiter="\t")
    back_j = _frame(read_transcripts_jsonl(
        sorted(glob.glob(os.path.join(jd, "*")))))
    back_c = _frame(read_transcripts_csv(
        sorted(glob.glob(os.path.join(cd, "*"))), delimiter="\t"))
    pd.testing.assert_frame_equal(back_j, parquet_df)
    pd.testing.assert_frame_equal(back_c, parquet_df)
