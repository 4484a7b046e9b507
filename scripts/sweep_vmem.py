"""Scoped-VMEM sweep for the Pallas multi-level RoIAlign 14x14 path.

The 14x14 mask-RoI variant runs single-buffered because its Mosaic
temporaries already fill ~14 MB of the default 16 MB scoped-VMEM
budget. This script re-runs the isolated kernel bench
(``scripts/bench_roi_ml.py``) and the LVIS step bench in subprocesses
with ``--xla_tpu_scoped_vmem_limit_kib`` raised and
``IIF_ROI_ML_NBUF14=2`` (double-buffered 14x14 window DMA), to see
whether the extra overlap beats the default budget's scheduling.

Usage: python scripts/sweep_vmem.py [--step-only|--kernel-only]
"""
import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("default-16MB-nbuf1", {}),
    ("vmem32MB-nbuf2", {
        "XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768",
        "IIF_ROI_ML_NBUF14": "2",
    }),
    ("vmem32MB-nbuf1", {
        "XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768",
    }),
    # scheduling-level experiment: the latency-hiding scheduler reorders
    # async copies/DMA against compute — the step is ~52% of the HBM
    # roofline, so overlap (not kernels) is where the remaining time is
    ("latency-hiding-sched", {
        "XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true",
    }),
]


def run(cmd, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    # a raised scoped limit changes compiled code; keep this sweep's
    # cache entries out of the default cache directory
    env["IIF_TPU_CACHE"] = "/tmp/xla_cache_vmem_sweep"
    p = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                       text=True, timeout=1800)
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel-only", action="store_true")
    ap.add_argument("--step-only", action="store_true")
    args = ap.parse_args()

    for name, env in CASES:
        print(f"=== {name} ===", flush=True)
        if not args.step_only:
            p = run([sys.executable, "scripts/bench_roi_ml.py"], env)
            tail = [l for l in p.stdout.splitlines()
                    if "ms" in l or "supported" in l or "max|" in l]
            print("kernel:", *tail, sep="\n  ", flush=True)
            if p.returncode != 0:
                print(p.stderr[-800:], flush=True)
        if not args.kernel_only:
            p = run([sys.executable, "bench.py"], env)
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            print("step:", line[-1] if line else p.stderr[-400:], flush=True)


if __name__ == "__main__":
    main()
