"""Benchmark harness: flagship tier-cascade throughput + scaling run.

Default: run the full pipeline (transcripts → 1m/5m/1h/1d aggregates →
gap-fill → Gorilla blocks) over $GRAFT_SF_DIR (default sf0.1 scale) with
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and print ONE JSON line.

``--scaling``: run the same job in two fresh processes at 8 and 32 CPUs
on the same input and report both throughputs + scaling efficiency
(T(32)/(4·T(8)) in throughput terms) — the sandbox evidence for the
north rule's two-cluster-size criterion.
"""

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from vertex_ray.pipelines.rollup_pipeline import (
        decode_tier_blocks,
        read_stage,
        run_pipeline,
    )
    from vertex_ray.synth import ensure_transcripts, sf_of_dir

    sf = sf_of_dir(sf_dir)
    trans = ensure_transcripts(sf_dir)

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.dataset as pads

    n_turns = pads.dataset(trans).count_rows()
    pads.dataset(trans).to_table()

    out = f"/tmp/vertex_ray_bench/sf{sf:g}_cpus{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)

    timings: dict[str, float] = {}
    t0 = time.time()
    run_pipeline(trans, out, n_buckets=4 * num_cpus)
    headline = time.time() - t0
    timings["tier_cascade_all"] = round(headline, 3)

    t0 = time.time()
    decode_tier_blocks(read_stage(out, "blocks", "1m")).count()
    timings["decode_1m_blocks"] = round(time.time() - t0, 3)

    result = {
        "metric": "rollup_all_tiers_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "sf": lo["sf"],
        "n_turns": lo["n_turns"],
    }


if __name__ == "__main__":
    res = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(res))
