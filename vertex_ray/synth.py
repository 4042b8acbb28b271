"""Deterministic synthetic transcript table (FIXTURES.md §F1).

The BASELINE input is a Parquet table of multi-turn conversation/agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``. The driver's
testdata has no such table, so we synthesize it deterministically
(fixed seed + fixed t0, pure numpy, no external data) at a scale tied
to the testdata scale factor, and cache it under /tmp.

Properties exercised on purpose:
- Zipf-ish conversation sizes → a few hot conv_ids (salt/skew handling).
- Integer-second inter-turn gaps in [1s, 10m] → inter-turn latency values
  are exactly representable doubles, so windowed float sums are exact and
  order-independent (bit-for-bit across parallelism levels and vs the
  DuckDB oracle).
- Gaps > the 5 min staleness horizon and multi-window gaps → stale
  markers + gap-fill paths are exercised.
- ``ts`` strictly increasing within a conversation (unique per conv) →
  gauge last-write-wins is deterministic.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vertex_ray.schema import ROLES, TOOLS, TRANSCRIPT_SCHEMA

SEED = 42
T0_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch microseconds
TURNS_PER_SF = 100_000_000  # sf0.001 → 100k turns, sf0.01 → 1M, sf0.1 → 10M (bench ≥10M per FIXTURES)
MEAN_TURNS_PER_CONV = 60.0
ROWS_PER_FILE = 200_000

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu".split()
)


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.001


def transcripts_dir(sf: float, base: str = "/tmp/vertex_ray_testdata") -> str:
    n_turns = max(1000, int(TURNS_PER_SF * sf))
    return os.path.join(base, f"sf{sf:g}", f"transcripts_n{n_turns}")


def generate_transcripts(
    n_turns: int,
    seed: int = SEED,
    t0_us: int = T0_US,
) -> pa.Table:
    """Build the whole transcript table vectorized; deterministic in (n_turns, seed)."""
    rng = np.random.default_rng(seed)
    n_convs = max(4, int(n_turns / MEAN_TURNS_PER_CONV))

    # Zipf-ish sizes: ~half the mass in a handful of hot conversations.
    raw = rng.zipf(1.5, size=n_convs).astype(np.int64)
    sizes = np.minimum(4 + raw * 8, 5000)
    total = int(sizes.sum())
    if total > n_turns:
        # trim deterministically from the tail until we fit
        cum = np.cumsum(sizes)
        keep = int(np.searchsorted(cum, n_turns))
        sizes = sizes[: keep + 1]
        sizes[-1] = max(2, n_turns - (int(cum[keep - 1]) if keep else 0))
        n_convs = len(sizes)
    else:
        sizes[-1] += n_turns - total
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    turn_idx = (np.arange(n, dtype=np.int64) - np.repeat(np.cumsum(sizes) - sizes, sizes)).astype(
        np.int32
    )

    conv_names = np.array([f"conv{i:08d}" for i in range(n_convs)], dtype=object)
    conv_id = conv_names[conv_ord]

    role_arr = np.array(ROLES, dtype=object)
    role = role_arr[turn_idx % 3]

    # tool: only "tool" role turns invoke a tool; drawn seeded.
    tool_pick = np.array(TOOLS, dtype=object)[rng.integers(0, len(TOOLS), size=n)]
    tool = np.where(role == "tool", tool_pick, "")

    # Inter-turn gaps: integer seconds, mostly short, heavy tail past the
    # 300 s staleness horizon and past several 1m windows.
    gap_kind = rng.random(n)
    gaps = np.where(
        gap_kind < 0.80,
        rng.integers(1, 60, size=n),
        np.where(gap_kind < 0.95, rng.integers(60, 300, size=n), rng.integers(301, 601, size=n)),
    ).astype(np.int64)
    gaps[turn_idx == 0] = 0
    # conversation start offsets spread over ~2 days so convs overlap
    start_s = rng.integers(0, 2 * 86400, size=n_convs)
    within = np.zeros(n, dtype=np.int64)
    np.cumsum(gaps, out=within)
    conv_base = np.repeat(within[np.cumsum(sizes) - sizes], sizes)
    within -= conv_base
    ts_s = start_s[conv_ord] + within
    ts_us = t0_us + ts_s * 1_000_000

    word_idx = rng.integers(0, len(_WORDS), size=(n, 6))
    words = np.array(_WORDS, dtype=object)
    payload = words[word_idx[:, 0]]
    for j in range(1, 6):
        payload = payload + " " + words[word_idx[:, j]]
    text = conv_id + ":" + turn_idx.astype(str).astype(object) + ":" + payload

    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def ensure_transcripts(sf_dir_or_sf, base: str = "/tmp/vertex_ray_testdata") -> str:
    """Idempotently materialize the transcript table for a scale factor.

    Returns the directory of parquet part files. Atomic: writes to a temp
    dir then renames, so concurrent/killed runs never observe partial data.
    Multiple part files → Ray read parallelism at bench scale.
    """
    sf = sf_of_dir(sf_dir_or_sf) if isinstance(sf_dir_or_sf, str) else float(sf_dir_or_sf)
    out = transcripts_dir(sf, base)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    n_turns = max(1000, int(TURNS_PER_SF * sf))
    table = generate_transcripts(n_turns)
    tmp = tempfile.mkdtemp(prefix="transcripts_", dir="/tmp")
    n = table.num_rows
    nfiles = max(1, (n + ROWS_PER_FILE - 1) // ROWS_PER_FILE)
    # Split on conversation boundaries so each file holds whole convs
    # (keeps the generator's (conv_id, turn_idx) ordering per fragment).
    bounds = np.linspace(0, n, nfiles + 1).astype(int)
    conv = np.asarray(table["conv_id"])
    for i in range(1, nfiles):
        b = bounds[i]
        while b < n and conv[b] == conv[b - 1]:
            b += 1
        bounds[i] = b
    for i in range(nfiles):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi > lo:
            pq.write_table(table.slice(lo, hi - lo), os.path.join(tmp, f"part-{i:05d}.parquet"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out
