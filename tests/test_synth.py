import numpy as np
import pyarrow.parquet as pq

from vertex_ray.schema import TRANSCRIPT_SCHEMA
from vertex_ray.series import bucket_of, series_key, series_key_arrays
from vertex_ray.synth import ensure_transcripts, generate_transcripts, sf_of_dir


def test_generate_deterministic_and_schema():
    t1 = generate_transcripts(5000)
    t2 = generate_transcripts(5000)
    assert t1.schema.equals(TRANSCRIPT_SCHEMA)
    assert t1.equals(t2)
    assert t1.num_rows == 5000


def test_ts_strictly_increasing_per_conv_and_gaps():
    t = generate_transcripts(20000).to_pandas()
    g = t.groupby("conv_id", sort=False)
    diffs = g["ts"].diff().dropna().dt.total_seconds()
    assert (diffs >= 1).all() and (diffs <= 600).all()
    assert (diffs == diffs.round()).all()  # integer seconds → exact doubles
    assert (diffs > 300).any()  # stale-horizon gaps exist
    # dense turn_idx per conv
    assert (g["turn_idx"].apply(lambda s: (s.values == np.arange(len(s))).all())).all()


def test_zipf_hotness():
    t = generate_transcripts(50000).to_pandas()
    sizes = t.groupby("conv_id").size().sort_values(ascending=False)
    assert sizes.iloc[0] > 10 * sizes.median()


def test_ensure_transcripts_idempotent(tmp_path):
    d1 = ensure_transcripts(0.001, base=str(tmp_path))
    d2 = ensure_transcripts("/root/testdata/sf0.001", base=str(tmp_path))
    assert d1 == d2
    n = sum(pq.ParquetFile(f"{d1}/{f}").metadata.num_rows
            for f in sorted(__import__('os').listdir(d1)) if f.endswith(".parquet"))
    assert n == 100000  # TURNS_PER_SF * 0.001
    assert sf_of_dir("/root/testdata/sf0.01") == 0.01


def test_series_key_sorted_canonical():
    assert series_key("m", {"b": "2", "a": "1"}) == "m{a=1,b=2}"
    assert series_key("m", {"b": "2", "a": ""}) == "m{b=2}"
    assert series_key("m", {}) == "m"
    arr = series_key_arrays(
        "m",
        conv_id=np.array(["c1", "c2"], dtype=object),
        tool=np.array(["", "code"], dtype=object),
    )
    assert list(arr) == ["m{conv_id=c1}", "m{conv_id=c2,tool=code}"]
    b = bucket_of(np.array(["a", "b", "a"], dtype=object), 16)
    assert b[0] == b[2] and 0 <= b.min() and b.max() < 16
