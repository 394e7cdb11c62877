"""Deterministic synthetic transcript fixtures (FIXTURES.md §1/§2/§4).

Byte-identical output for a given (seed, n_turns): all randomness flows from
one ``numpy.random.default_rng(seed)`` and string assembly is vectorized via
Arrow kernels, so regeneration is stable across runs/processes (content
hashes pinned by test_fixture_content_hash_pinned).  These tables stand
in for the reference's live nginx logs (SURVEY.md §5: the public abs-log repo
ships no test suite; the oracle + these fixtures ARE the equality target).

Schema (fixed by BASELINE.json:15):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Planted skew: one hot conversation at the 1000-turn clip, and one hot PATH
template carrying ~30% of parseable requests — exercising the gap-stage
bucket shuffle and the salted aggregate respectively (SURVEY.md §4.2).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_P = np.array([0.35, 0.35, 0.25, 0.05])

TOOLS = np.array([
    "search", "browser", "python", "bash", "editor", "none",
    "fetch", "sql", "calc", "email", "files", "git",
    "api", "chat", "vision", "translate",
])

VERBS = np.array(["GET", "POST", "CALL", "EXEC"])
STATUSES = np.array(["200", "404", "500", "503"])
STATUS_P = np.array([0.90, 0.04, 0.04, 0.02])

# epoch anchor: 2026-01-01T00:00:00Z in microseconds
EPOCH0_US = int(pd.Timestamp("2026-01-01T00:00:00").value // 1_000)
WINDOW_S = 2 * 3600

ARG_KEYS = np.array(["uid", "q", "page", "lang", "ref"])

FILLERS = np.array([
    "assistant invoked ", "tool call trace ", "observed request ",
    "agent step ran ", "handled action ",
])
TAILS = np.array([" ok", " done", " completed fine", " with retries", ""])

HOT_PATH = "/api/chat/{d}/msg"
PATH_TEMPLATES = [
    "/api/user/{d}/profile",
    "/files/{h}/get",
    "/v1/items/{d}",
    "/search/results",
    "/tool/{w}/run/{d}",
]
WORDS = np.array(["alpha", "beta", "gamma", "delta", "omega"])


def _segmented_cumsum(vals: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment start (vectorized)."""
    c = np.cumsum(vals)
    offsets = np.zeros_like(c)
    offsets[seg_starts[1:]] = c[seg_starts[1:] - 1]
    np.maximum.accumulate(offsets, out=offsets)
    return c - offsets


def generate_transcripts(seed: int = 42, n_turns: int = 2000) -> pa.Table:
    """Generate ~n_turns transcript rows (exact total >= n_turns, includes the
    planted 1000-turn hot conversation); rows emitted SHUFFLED."""
    rng = np.random.default_rng(seed)

    # conversation sizes: Zipf(1.3) clipped [2, 1000]
    sizes = []
    total = 0
    hot_turns = min(1000, max(2, n_turns // 2))
    while total < max(0, n_turns - hot_turns):
        chunk = np.clip(rng.zipf(1.3, 1024), 2, 1000)
        sizes.append(chunk)
        total += int(chunk.sum())
    sizes = np.concatenate(sizes) if sizes else np.array([], dtype=np.int64)
    # trim overshoot at conversation granularity, then plant the hot conv
    keep = np.searchsorted(np.cumsum(sizes), n_turns - hot_turns) + 1
    sizes = np.concatenate([sizes[:keep], [hot_turns]]).astype(np.int64)
    n_convs = len(sizes)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs), sizes)
    conv_id = np.char.add("c", np.char.zfill(conv_ord.astype("U8"), 8))
    seg_starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(seg_starts, sizes)).astype(np.int32)

    role = rng.choice(ROLES, size=n, p=ROLE_P)
    tool = rng.choice(TOOLS, size=n)

    # timestamps: conv start uniform in window; per-turn lognormal gaps
    conv_start_us = (rng.uniform(0, WINDOW_S, n_convs) * 1e6).astype(np.int64)
    gap_us = (rng.lognormal(np.log(0.5), 1.2, n) * 1e6).astype(np.int64) + 1
    first_of_conv = np.zeros(n, dtype=bool)
    first_of_conv[seg_starts] = True
    gap_us[first_of_conv] = 0
    ts_us = (EPOCH0_US + np.repeat(conv_start_us, sizes)
             + _segmented_cumsum(gap_us, seg_starts))

    # ----- text grammar -----
    # string assembly is ARROW (binary_join_element_wise): the previous
    # np.char.add / pandas str.cat path spent 30+ min and ~35 GB on the
    # 24M-turn tier (fixed-width U64 numpy copies per concat); Arrow
    # builds the same bytes in ~1/6 the wall.  Every rng draw below is
    # kept in the ORIGINAL order and width so output stays bit-identical
    # (pinned by test_fixture_content_hash_pinned).
    import binascii

    import pyarrow.compute as pc

    parseable = rng.random(n) < 0.90
    hot = rng.random(n) < (1.0 / 3.0)  # ~30% of parseable requests

    digits_i = rng.integers(1, 99999, n)
    digits = pc.cast(pa.array(digits_i), pa.string())
    hexes = pa.array(np.frombuffer(
        binascii.hexlify(rng.integers(0, 2**32, n).astype(">u4").tobytes()),
        dtype="S8").astype("U8"))
    tmpl_choice = rng.integers(0, len(PATH_TEMPLATES), n)
    word = pa.array(rng.choice(WORDS, n))

    fills = {"{d}": digits, "{h}": hexes, "{w}": word}

    def render(template: str, m: np.ndarray):
        import re as _re
        idx = pa.array(np.flatnonzero(m))
        parts = []
        for part in _re.split(r"(\{[dhw]\})", template):
            if part in fills:
                parts.append(pc.take(fills[part], idx))
            elif part:
                parts.append(part)
        if all(isinstance(p, str) for p in parts):   # fill-free template
            return pa.array(np.full(len(idx), "".join(parts), object),
                            pa.string())
        return pc.binary_join_element_wise(*parts, "")

    path = np.full(n, "", dtype=object)
    path[hot] = render(HOT_PATH, hot).to_numpy(zero_copy_only=False)
    for i, t in enumerate(PATH_TEMPLATES):
        m = (tmpl_choice == i) & ~hot
        path[m] = render(t, m).to_numpy(zero_copy_only=False)
    path = pa.array(path, pa.string())

    # args: 0-3 k=v pairs, shuffled key order
    n_args = rng.integers(0, 4, n)
    key_perm = np.argsort(rng.random((n, len(ARG_KEYS))), axis=1)
    vals_i = rng.integers(0, 9999, (n, 3))
    args = pa.array(np.full(n, "", dtype=object), pa.string())
    for j in range(3):
        has = n_args > j
        piece = pc.binary_join_element_wise(
            pa.array(ARG_KEYS[key_perm[:, j]]), "=",
            pc.cast(pa.array(vals_i[:, j]), pa.string()), "")
        sep = "?" if j == 0 else "&"
        masked = pc.if_else(pa.array(has),
                            pc.binary_join_element_wise(sep, piece, ""),
                            "")
        args = pc.binary_join_element_wise(args, masked, "")

    verb = rng.choice(VERBS, n)
    status = rng.choice(STATUSES, n, p=STATUS_P)
    lat_i = rng.integers(1, 5000, n)

    filler = rng.choice(FILLERS, n)
    tail = rng.choice(TAILS, n)

    span = pc.binary_join_element_wise(
        pa.array(verb), " ", path, args, " status=", pa.array(status),
        " took=", pc.cast(pa.array(lat_i), pa.string()), "ms", "")
    free = pc.binary_join_element_wise("note ", digits, " free text", "")
    text = pc.binary_join_element_wise(
        pa.array(filler), pc.if_else(pa.array(parseable), span, free),
        pa.array(tail), "")

    # emit shuffled (FIXTURES.md: exercise ordering invariance)
    perm = rng.permutation(n)
    pidx = pa.array(perm)
    table = pa.table({
        "conv_id": pa.array(conv_id[perm], pa.string()),
        "turn_idx": pa.array(turn_idx[perm], pa.int32()),
        "role": pa.array(role[perm], pa.string()),
        "text": pc.take(text, pidx),
        "tool": pa.array(tool[perm], pa.string()),
        "ts": pa.array(ts_us[perm], pa.timestamp("us")),
    })
    return table


TOOL_CATS = {
    "search": "retrieval", "browser": "retrieval", "fetch": "retrieval",
    "python": "code", "bash": "code", "editor": "code", "git": "code",
    "sql": "data", "calc": "data", "files": "data", "api": "data",
    "email": "comms", "chat": "comms", "translate": "comms",
    "vision": "media", "none": "direct",
    # two unmatched extras (FIXTURES.md §2: test left-lookup nulls)
    "ghost": "unused", "phantom": "unused",
}

ROLE_SINKS = {
    "user": "sink_user", "assistant": "sink_assistant",
    "tool": "sink_tool", "system": "sink_system",
}


def tool_lookup_table() -> pa.Table:
    rng = np.random.default_rng(7)
    tools = list(TOOL_CATS)
    return pa.table({
        "tool": pa.array(tools, pa.string()),
        "tool_cat": pa.array([TOOL_CATS[t] for t in tools], pa.string()),
        "weight": pa.array(rng.random(len(tools)), pa.float64()),
    })


def role_lookup_table() -> pa.Table:
    return pa.table({
        "role": pa.array(list(ROLE_SINKS), pa.string()),
        "sink": pa.array(list(ROLE_SINKS.values()), pa.string()),
    })


FIXTURE_CACHE = "/tmp/abslog_fixtures"

TIERS = {"t1": 2_000, "t2": 60_000, "bench": 6_000_000,
         "bench24": 24_000_000, "bench48": 48_000_000}


def fixture_parquet(tier: str = "t1", seed: int = 42,
                    num_files: int = 8) -> str:
    """Write (once) and return the path of a cached fixture parquet dir."""
    n_turns = TIERS[tier]
    out = os.path.join(FIXTURE_CACHE, f"transcripts_{tier}_s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    table = generate_transcripts(seed=seed, n_turns=n_turns)
    # split into num_files fragments so Ray gets real parallelism and the
    # resume manifest has fragments to track
    n = table.num_rows
    step = -(-n // num_files)
    for i in range(num_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out, f"part-{i:05d}.parquet"))
    with open(done, "w") as f:
        f.write(str(n))
    return out


def fixture_text_format(tier: str = "t1", seed: int = 42,
                        format: str = "jsonl", num_files: int = 8) -> str:
    """Convert the cached parquet fixture into JSONL / CSV / TSV fragments
    (once) — the multi-format source tests and demos read these.  ``ts``
    rides as epoch MICROSECONDS (the sources' interchange contract)."""
    import pandas as pd

    assert format in ("jsonl", "csv", "tsv", "jsonl.gz")
    src = fixture_parquet(tier, seed, num_files)
    tag = format.replace(".", "_")
    out = os.path.join(FIXTURE_CACHE, f"transcripts_{tier}_s{seed}_{tag}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for frag in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        df = pq.read_table(frag).to_pandas()
        df["ts"] = df["ts"].astype("int64")        # datetime64[us] → µs
        dst = os.path.join(
            out, os.path.basename(frag).replace(".parquet", f".{format}"))
        if format == "jsonl":
            df.to_json(dst, orient="records", lines=True)
        elif format == "jsonl.gz":
            df.to_json(dst, orient="records", lines=True,
                       compression="gzip")
        else:
            df.to_csv(dst, index=False,
                      sep="\t" if format == "tsv" else ",")
    with open(done, "w") as f:
        f.write(tier)
    return out
