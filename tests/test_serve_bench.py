"""scripts/serve_bench.py: the production-serving load-test pipeline.

Locks the measurement path (VDSystem fast-fill -> enable_int8 ->
VDInference -> BatchingQueue under Poisson arrivals -> latency stats) on
the tiny config, so the chip runs recorded in PERF.md stay reproducible.
"""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_serve_bench_tiny(capsys):
    from vdtpu.ops import quant
    import serve_bench
    try:
        old_argv = sys.argv
        sys.argv = ["serve_bench.py", "--config", "vd_test_tiny",
                    "--size", "64", "--latent-downsample", "2",
                    "--steps", "2", "--policy", "int8",
                    "--rates", "4.0", "--seconds", "2",
                    "--buckets", "1,2", "--deadline-ms", "200"]
        serve_bench.main()
    finally:
        sys.argv = old_argv
        quant.set_policy(None)
    out = capsys.readouterr().out.strip().splitlines()
    row = json.loads(out[-1])
    assert row["requests"] >= 1
    assert row["p50_s"] > 0 and row["p95_s"] >= row["p50_s"]
    assert row["policy"] == "int8" and row["buckets"] == [1, 2]


@pytest.mark.slow
def test_serve_bench_all_flows_tiny(capsys):
    """--flows all: every one of the seven flows rides the Poisson mix,
    including the Optimus GPT-2 decode under concurrent load (t2t/i2t) and
    the tcg/mcg bucket families (VERDICT r4 task 4)."""
    from vdtpu.ops import quant
    import serve_bench
    try:
        old_argv = sys.argv
        sys.argv = ["serve_bench.py", "--config", "vd_test_tiny",
                    "--size", "64", "--latent-downsample", "2",
                    "--text-latent-dim", "96",
                    "--steps", "2", "--policy", "int8",
                    "--rates", "6.0", "--seconds", "4",
                    "--buckets", "1,2", "--deadline-ms", "200",
                    "--flows", "all"]
        serve_bench.main()
    finally:
        sys.argv = old_argv
        quant.set_policy(None)
    out = capsys.readouterr().out.strip().splitlines()
    row = json.loads(out[-1])
    assert row["requests"] >= 7
    assert row["flows"] == "all"
    # at high tiny-model rates, every flow family should have completed at
    # least its warmup-adjacent share; check the labels that did appear
    flows_seen = {k.split("_")[0] for k in row if k.endswith("_p50_s")}
    assert "t2i" in flows_seen
